"""build_crystal parity vs the reference's atomsk-derived fixtures
(tests/fixtures/build_crystal/*.npz): canonical (box, sorted positions,
sorted elements) triples for 14 plain + 7 Miller-oriented lattices
(reference test_build_crystal.py)."""

import os

import numpy as np
import pytest

from conftest import REF_FIXTURES

import mdapy_tpu as mp

FIXTURE_DIR = os.path.join(REF_FIXTURES, "build_crystal")


def _canonicalize(system):
    d = system.data
    pos = np.column_stack([d["x"], d["y"], d["z"]])
    elements = [str(e) for e in np.asarray(d["element"])]
    key = np.round(pos, 6)
    order = np.lexsort((key[:, 2], key[:, 1], key[:, 0]))
    return np.asarray(system.box.box), pos[order], [elements[i] for i in order]


def _assert_matches(name, system, atol=1e-6):
    path = os.path.join(FIXTURE_DIR, f"{name}.npz")
    if not os.path.exists(path):
        pytest.skip(f"fixture unavailable: {path}")
    fix = np.load(path)
    box, pos, ele = _canonicalize(system)
    np.testing.assert_allclose(box, fix["box"], atol=atol,
                               err_msg=f"{name}: box mismatch")
    np.testing.assert_allclose(pos, fix["positions"], atol=atol,
                               err_msg=f"{name}: positions mismatch")
    assert ele == list(fix["elements"]), f"{name}: element ordering mismatch"


PLAIN_CASES = [
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
]


@pytest.mark.parametrize("name,elements,kwargs", PLAIN_CASES,
                         ids=[c[0] for c in PLAIN_CASES])
def test_plain_lattices(name, elements, kwargs):
    _assert_matches(name, mp.build_crystal(elements, **kwargs))


MILLER_CASES = [
    ("Cu_fcc_111", "Cu",
     dict(structure="fcc", a=3.615,
          miller1=(1, -1, 0), miller2=(1, 1, -2), miller3=(1, 1, 1))),
    ("Fe_bcc_111", "Fe",
     dict(structure="bcc", a=2.83,
          miller1=(1, 2, 1), miller2=(-1, 0, 1), miller3=(1, -1, 1))),
    ("NaCl_rocksalt_111", ("Na", "Cl"),
     dict(structure="rocksalt", a=5.64,
          miller1=(1, -1, 0), miller2=(1, 1, -2), miller3=(1, 1, 1))),
    ("Mg_hcp_prismatic", "Mg",
     dict(structure="hcp", a=3.21, c=5.21,
          miller1=(1, -1, 0, 0), miller2=(1, 1, -2, 0), miller3=(0, 0, 0, 1))),
    ("GaN_wurtzite_prismatic", ("Ga", "N"),
     dict(structure="wurtzite", a=3.19, c=5.18,
          miller1=(1, -1, 0, 0), miller2=(1, 1, -2, 0), miller3=(0, 0, 0, 1))),
    ("Ni_fcc_111_lefthand", "Ni",
     dict(structure="fcc", a=3.52,
          miller1=(1, 1, -2), miller2=(1, -1, 0), miller3=(1, 1, 1))),
    ("Co_hcp_nonortho", "Co",
     dict(structure="hcp", a=3.52, c=1.63,
          miller1=(1, 0, -1, 0), miller2=(1, 1, -2, 0), miller3=(0, 0, 0, 1))),
]


@pytest.mark.parametrize("name,elements,kwargs", MILLER_CASES,
                         ids=[c[0] for c in MILLER_CASES])
def test_miller_oriented(name, elements, kwargs):
    _assert_matches(name, mp.build_crystal(elements, **kwargs))
