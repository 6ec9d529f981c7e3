"""BondStiffness parity vs ATAT fitsvsl reference values."""

import os

import numpy as np
import pytest

import mdapy_tpu as mp
from conftest import REF_INPUTS
from _toy_calc import LJCalculator


def _nep():
    return mp.NEP(os.path.join(REF_INPUTS, "UNEP-v1.txt"))


@pytest.mark.slow
def test_bond_stiffness_pure_al_matches_atat():
    sys_ = mp.build_crystal("Al", "fcc", a=4.05, nx=2, ny=2, nz=2)
    bsl = mp.BondStiffness(
        sys_, calculator=_nep(), rc_bond=3.0, delta=0.01, poly_order=0,
        n_lattice=1, central_diff=True,
    ).compute()
    np.testing.assert_allclose(bsl.k_long[("Al", "Al", 0)][0], 1.24587, atol=1e-4)
    np.testing.assert_allclose(bsl.k_trans[("Al", "Al", 0)][0], -0.06445, atol=1e-4)


@pytest.mark.slow
def test_bond_stiffness_binary_alcu_matches_atat():
    sys_ = mp.build_hea(("Al", "Cu"), (0.5, 0.5), "fcc", a=3.85,
                        nx=2, ny=2, nz=2, random_seed=1)
    bsl = mp.BondStiffness(
        sys_, calculator=_nep(), rc_bond=2.95, delta=0.01, poly_order=0,
        n_lattice=1, central_diff=True,
    ).compute()
    refs = {
        ("Al", "Al"): (2.35828, -0.15451),
        ("Al", "Cu"): (0.94644, -0.01820),
        ("Cu", "Cu"): (0.92183, -0.01896),
    }
    for pair, (ref_kl, ref_kt) in refs.items():
        key = (pair[0], pair[1], 0)
        np.testing.assert_allclose(bsl.k_long[key][0], ref_kl, atol=1e-4)
        np.testing.assert_allclose(bsl.k_trans[key][0], ref_kt, atol=1e-4)


@pytest.mark.slow
def test_bcc_two_shells_and_slspring(tmp_path):
    sys_ = mp.build_crystal("W", "bcc", a=3.165, nx=2, ny=2, nz=2)
    bsl = mp.BondStiffness(
        sys_, calculator=_nep(), rc_bond=3.6, shell_tol=0.1, delta=0.01,
        poly_order=0, n_lattice=1, central_diff=True,
    ).compute()
    assert len(bsl.shells) == 2
    assert bsl.shells[0] < bsl.shells[1]
    assert ("W", "W", 0) in bsl.k_long and ("W", "W", 1) in bsl.k_long
    out = tmp_path / "slspring.out"
    bsl.write_slspring(str(out))
    assert "W W" in out.read_text()


def test_slspring_format_and_bond_table(tmp_path):
    sys_ = mp.build_crystal("Al", "fcc", a=4.05, nx=2, ny=2, nz=2)
    bsl = mp.BondStiffness(
        sys_, calculator=LJCalculator(rc=5.0), rc_bond=3.0, delta=0.01,
        poly_order=0, n_lattice=1,
    ).compute()
    out = tmp_path / "slspring.out"
    bsl.write_slspring(str(out))
    text = out.read_text().splitlines()
    assert text[0] == "Al Al"
    assert text[1] == "1"
    float(text[2])
    assert text[3] == "1"
    float(text[4])
    cols = set(bsl.bond_table.columns)
    assert {"element_a", "element_b", "shell", "r", "k_long", "k_trans",
            "strain"} <= cols
    assert (np.asarray(bsl.bond_table["r"]) > 0).all()
    assert len(bsl.shells) == 1


def test_generate_perturbed_structures(tmp_path):
    sys_ = mp.build_crystal("Al", "fcc", a=4.05, nx=2, ny=2, nz=2)
    bsl = mp.BondStiffness(
        sys_, calculator=LJCalculator(rc=5.0), rc_bond=3.0, delta=0.01,
        poly_order=0, n_lattice=1, central_diff=False,
    )
    out_dir = tmp_path / "train"
    perts = bsl.generate_perturbed_structures(output_dir=str(out_dir))
    assert len(perts) == sys_.N * 3
    subs = sorted(p for p in out_dir.glob("p*") if p.is_dir())
    assert len(subs) == sys_.N * 3
    for sub in subs[:3]:
        assert (sub / "str.out").exists()
        assert (sub / "str_ideal.out").exists()
        assert (sub / "str_unpert.out").exists()
