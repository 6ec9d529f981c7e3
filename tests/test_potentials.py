"""Potential/minimizer/elastic parity vs LAMMPS / ASE / pymatgen fixtures."""

import os

import numpy as np
import pytest

from conftest import REF_FIXTURES, REF_INPUTS

ADV = os.path.join(REF_FIXTURES, "advanced")


def _adv(name):
    path = os.path.join(ADV, name + ".npz")
    if not os.path.exists(path):
        pytest.skip("fixture unavailable")
    return np.load(path, allow_pickle=True)


def test_eam_lammps_case1():
    from mdapy_tpu.build.lattice import build_hea
    from mdapy_tpu.potentials.eam import EAM

    d = _adv("eam")
    eam = EAM(os.path.join(REF_INPUTS, "CoNiFeAlCu.eam.alloy"))
    model = build_hea(
        ["Co", "Ni", "Fe", "Al", "Cu"], [0.25, 0.25, 0.25, 0.075, 0.175],
        "fcc", 3.6, nx=3, ny=3, nz=3, random_seed=1,
    )
    model.calc = eam
    assert np.allclose(model.get_energies(), d["case1__energies"])
    assert np.allclose(model.get_force(), d["case1__forces"])
    assert np.allclose(model.get_virials(), d["case1__virials"])
    assert np.allclose(model.get_stress(), d["case1__stress"])


@pytest.mark.parametrize("case,fname", [(2, "NiCoCr.lammps.eam"), (3, "FeNiCrCoTi-heamix.setfl")])
def test_eam_lammps_displaced(case, fname):
    from mdapy_tpu.build.lattice import build_hea
    from mdapy_tpu.potentials.eam import EAM

    d = _adv("eam")
    model = build_hea(
        ["Co", "Ni", "Cr"], [0.2, 0.3, 0.5], "fcc", 3.6,
        nx=4, ny=4, nz=4, random_seed=1,
    )
    np.random.seed(1)
    model.update_pos(model.pos + (np.random.random((model.N, 3)) - 0.5) * 1.4)
    model.calc = EAM(os.path.join(REF_INPUTS, fname))
    assert np.allclose(model.get_energies(), d[f"case{case}__energies"])
    assert np.allclose(model.get_force(), d[f"case{case}__forces"])
    assert np.allclose(model.get_virials(), d[f"case{case}__virials"])
    assert np.allclose(model.get_stress(), d[f"case{case}__stress"])


def test_nep_unep():
    import mdapy_tpu as mp
    from mdapy_tpu.potentials.nep import NEP

    d = _adv("nep")
    s = mp.System(os.path.join(REF_INPUTS, "AlCrNi.xyz"))
    nep = NEP(os.path.join(REF_INPUTS, "UNEP-v1.txt"))
    s.calc = nep
    assert np.allclose(s.get_energies(), d["energies"], atol=1e-8)
    assert np.allclose(s.get_force(), d["forces"], atol=1e-8)
    assert np.allclose(s.get_stress(), d["stress"], atol=1e-8)
    assert np.allclose(nep.get_descriptors(s), d["descriptor"], atol=1e-8)
    assert np.allclose(nep.get_latent_space(s), d["latent"], atol=1e-8)


_FIRE_MODES = [
    (False, False, None, False, False, 0),
    (True, False, None, False, False, 0),
    (False, True, None, False, False, 0),
    (True, True, None, False, False, 0),
    (False, True, [1, 0, 0, 0, 0, 0], False, False, 0),
    (False, True, None, True, False, 0),
    (False, True, None, False, True, 0),
    (False, True, None, False, False, 1),
]


@pytest.mark.parametrize("idx,params", list(enumerate(_FIRE_MODES)))
def test_fire_modes(idx, params):
    import mdapy_tpu as mp
    from mdapy_tpu.potentials.minimizer import FIRE
    from mdapy_tpu.potentials.nep import NEP

    use_abc, cell, mask, hydro, cv, p = params
    d = _adv("minimize")
    s = mp.System(os.path.join(REF_INPUTS, "AlCrNi.xyz"))
    s.calc = NEP(os.path.join(REF_INPUTS, "UNEP-v1.txt"))
    fire = FIRE(
        s, use_abc=use_abc, optimize_cell=cell, mask=mask,
        hydrostatic_strain=hydro, constant_volume=cv, scalar_pressure=p,
    )
    fire.run(steps=int(d["steps"]), show_process=False)
    assert np.allclose(s.get_stress(), d[f"mode_{idx}__stress"], atol=1e-8)
    assert np.allclose(s.get_force(), d[f"mode_{idx}__forces"], atol=1e-8)
    assert np.allclose(s.get_energies(), d[f"mode_{idx}__energies"], atol=1e-8)


def test_elastic_constant_lj_selfconsistent():
    """Fast-tier variant: LJ-fcc Cij must be symmetric, cubic, and Born
    stable; the NEP golden-parity case runs in the slow tier."""
    import sys as _sys, os as _os
    _sys.path.insert(0, _os.path.dirname(__file__))
    import mdapy_tpu as mp
    import numpy as np
    from _toy_calc import LJCalculator
    from mdapy_tpu.potentials.elastic import get_elastic_constant

    s = mp.build_crystal("Cu", "fcc", 3.615)
    et = get_elastic_constant(s, LJCalculator(epsilon=0.4, sigma=2.3, rc=6.0))
    C = np.asarray(et.voigt)
    assert np.allclose(C, C.T, atol=1e-6)
    c11, c12, c44 = C[0, 0], C[0, 1], C[3, 3]
    assert np.isclose(C[1, 1], c11, rtol=1e-4) and np.isclose(C[2, 2], c11, rtol=1e-4)
    assert c11 - c12 > 0 and c11 + 2 * c12 > 0 and c44 > 0


@pytest.mark.slow
def test_elastic_constant():
    import mdapy_tpu as mp
    from mdapy_tpu.potentials.elastic import get_elastic_constant
    from mdapy_tpu.potentials.nep import NEP

    d = _adv("elastic_constant")
    s = mp.build_crystal(str(d["symbol"]), str(d["structure"]), float(d["a"]))
    et = get_elastic_constant(s, NEP(os.path.join(REF_INPUTS, "UNEP-v1.txt")))
    assert np.allclose(et.voigt, d["voigt"])


def test_build_crystal_fixtures():
    """All 21 atomsk-golden lattice fixtures."""
    import mdapy_tpu as mp

    FIX = os.path.join(REF_FIXTURES, "build_crystal")
    if not os.path.isdir(FIX):
        pytest.skip("fixtures unavailable")
    CASES = [
        ("Cu_fcc", "Cu", dict(structure="fcc", a=3.615)),
        ("Fe_bcc", "Fe", dict(structure="bcc", a=2.83)),
        ("C_diamond", "C", dict(structure="diamond", a=3.6)),
        ("W_sc", "W", dict(structure="sc", a=3.16)),
        ("NaCl_rocksalt", ("Na", "Cl"), dict(structure="rocksalt", a=5.64)),
        ("NiAl_cscl", ("Ni", "Al"), dict(structure="cscl", a=2.86)),
        ("GaAs_zb", ("Ga", "As"), dict(structure="zincblende", a=5.65)),
        ("CaF2_fluorite", ("Ca", "F"), dict(structure="fluorite", a=5.46)),
        ("Ni3Al_l1_2", ("Ni", "Al"), dict(structure="l1_2", a=3.57)),
        ("SrTiO3_perovskite", ("Ti", "Sr", "O"), dict(structure="perovskite", a=3.905)),
        ("Mg_hcp", "Mg", dict(structure="hcp", a=3.21, c=5.21304)),
        ("GaN_wurtzite", ("Ga", "N"), dict(structure="wurtzite", a=3.19, c=5.18)),
        ("C_graphite", "C", dict(structure="graphite", a=2.46, c=6.71)),
        ("C_lonsdaleite", "C", dict(structure="lonsdaleite", a=2.51, c=4.12)),
        ("Cu_fcc_111", "Cu", dict(structure="fcc", a=3.615, miller1=(1, -1, 0), miller2=(1, 1, -2), miller3=(1, 1, 1))),
        ("Fe_bcc_111", "Fe", dict(structure="bcc", a=2.83, miller1=(1, 2, 1), miller2=(-1, 0, 1), miller3=(1, -1, 1))),
        ("NaCl_rocksalt_111", ("Na", "Cl"), dict(structure="rocksalt", a=5.64, miller1=(1, -1, 0), miller2=(1, 1, -2), miller3=(1, 1, 1))),
        ("Mg_hcp_prismatic", "Mg", dict(structure="hcp", a=3.21, c=5.21, miller1=(1, -1, 0, 0), miller2=(1, 1, -2, 0), miller3=(0, 0, 0, 1))),
        ("GaN_wurtzite_prismatic", ("Ga", "N"), dict(structure="wurtzite", a=3.19, c=5.18, miller1=(1, -1, 0, 0), miller2=(1, 1, -2, 0), miller3=(0, 0, 0, 1))),
        ("Ni_fcc_111_lefthand", "Ni", dict(structure="fcc", a=3.52, miller1=(1, 1, -2), miller2=(1, -1, 0), miller3=(1, 1, 1))),
        ("Co_hcp_nonortho", "Co", dict(structure="hcp", a=3.52, c=1.63, miller1=(1, 0, -1, 0), miller2=(1, 1, -2, 0), miller3=(0, 0, 0, 1))),
    ]
    for name, elems, kw in CASES:
        s = mp.build_crystal(elems, **kw)
        fix = np.load(os.path.join(FIX, f"{name}.npz"))
        pos = s.pos
        ele = list(np.asarray(s.data["element"]).astype(str))
        key = np.round(pos, 6)
        order = np.lexsort((key[:, 2], key[:, 1], key[:, 0]))
        assert np.allclose(s.box.matrix, fix["box"], atol=1e-6), name
        assert np.allclose(pos[order], fix["positions"], atol=1e-6), name
        assert [ele[i] for i in order] == list(fix["elements"]), name


def test_eam_mxu_lookup_matches_gather_path():
    """The one-hot MXU spline-lookup path (TPU default) must agree with the
    row-gather path (CPU default) to fp precision — both read the same
    packed node tables."""
    import jax.numpy as jnp
    import mdapy_tpu as mp
    from mdapy_tpu.neighbor.neighbor import neighbor_search_device
    from mdapy_tpu.potentials.eam import EAM, EAMGenerator, _eam_block, _eam_force_fast

    EAMGenerator(["Cu", "Ni"], output_filename="/tmp/CuNi.eam.alloy")
    eam = EAM("/tmp/CuNi.eam.alloy")
    s = mp.build_hea(["Cu", "Ni"], [0.5, 0.5], "fcc", 3.58,
                     nx=3, ny=3, nz=3, random_seed=2)
    rng = np.random.default_rng(0)
    s.update_pos(s.pos + 0.08 * rng.standard_normal((s.N, 3)))
    from mdapy_tpu.neighbor.neighbor import replicate_for_small_box

    pos, box, n_images = replicate_for_small_box(s.pos, s.box, eam.rc)
    types = np.tile(
        np.array([{"Cu": 0, "Ni": 1}[e] for e in
                  np.asarray(s.data["element"]).astype(str)], np.int32),
        n_images,
    )
    pos_d, verlet_d, cnt_d, _ = neighbor_search_device(pos, box, eam.rc)
    tab = eam._eval_tables()
    pack8 = jnp.concatenate([
        pos_d, jnp.asarray(types, pos_d.dtype)[:, None],
        jnp.zeros((pos_d.shape[0], 4), pos_d.dtype),
    ], axis=1)
    args = (
        pack8, verlet_d,
        jnp.asarray(box.matrix, pos_d.dtype),
        jnp.asarray(box.inverse_box, pos_d.dtype),
        jnp.asarray(box.boundary.astype(np.float64), pos_d.dtype),
        tab["rho_flat"], tab["z2r_flat"], tab["F_flat"],
        tab["rho_W"], tab["z2r_W"], tab["F_W"],
        eam.drho, eam.dr, eam.rc, eam.nr, eam.nrho, eam.Nelements,
        _eam_block(pos_d.shape[0], verlet_d.shape[1]),
    )
    e_g, f_g, v_g = _eam_force_fast(*args, False)
    e_m, f_m, v_m = _eam_force_fast(*args, True)
    # the MXU path reconstructs each f32 node value from three bf16 pieces
    # (error ~2^-27 relative per value, i.e. at the f32 roundoff floor), so
    # the two paths agree to f32-accumulation precision, not bitwise
    np.testing.assert_allclose(np.asarray(e_m), np.asarray(e_g),
                               rtol=2e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(f_m), np.asarray(f_g),
                               rtol=2e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(v_m), np.asarray(v_g),
                               rtol=2e-6, atol=1e-6)


def test_eam_average_and_setfl_roundtrip(tmp_path):
    """EAMAverage appends the concentration-averaged 'A' element
    (reference eam.py:558); setfl write -> reload is lossless."""
    import mdapy_tpu as mp
    from mdapy_tpu.potentials.eam import EAM, EAMAverage

    src = os.path.join(REF_INPUTS, "CoNiFeAlCu.eam.alloy")
    base = EAM(src)
    conc = [0.2, 0.2, 0.2, 0.2, 0.2]
    avg = EAMAverage(src, conc)
    assert avg.elements_list[-1] == "A"
    assert avg.Nelements == base.Nelements + 1
    np.testing.assert_allclose(
        avg.F_rho[-1], np.tensordot(conc, base.F_rho, axes=1)
    )
    np.testing.assert_allclose(
        avg.rho_r[-1], np.tensordot(conc, base.rho_r, axes=1)
    )
    np.testing.assert_allclose(
        avg._rphi_r[-1, -1],
        np.einsum("i,j,ijr->r", conc, conc, base._rphi_r),
    )
    # an all-"A" crystal evaluates through the averaged tables
    s = mp.build_crystal("Cu", "fcc", 3.6, nx=2, ny=2, nz=2)
    s.update_data(s.data.with_columns(element=np.array(["A"] * s.N, object)))
    s.calc = avg
    e = s.get_energies()
    assert np.isfinite(e).all() and e.std() < 1e-8  # perfect crystal

    out = tmp_path / "rt.eam.alloy"
    avg.write_eam_alloy(str(out))
    back = EAM(str(out))
    assert back.elements_list == avg.elements_list
    np.testing.assert_allclose(back.F_rho, avg.F_rho, rtol=1e-12)
    np.testing.assert_allclose(back.rho_r, avg.rho_r, rtol=1e-12)
    np.testing.assert_allclose(back._rphi_r, avg._rphi_r, rtol=1e-12)
    assert np.isclose(back.rc, avg.rc) and np.isclose(back.dr, avg.dr)
