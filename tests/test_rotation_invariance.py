"""General-box (rotation-invariance) checks: every analysis must give
identical per-atom results for a tilted axis-anchored cell and for the same
structure rigidly rotated so no cell vector is axis-aligned (GPUMD-style
boxes; reference test_rotation_invariance.py is the model)."""

import numpy as np
import pytest

import mdapy_tpu as mp
from mdapy_tpu.core.box import Box
from mdapy_tpu.analysis.atomic_strain import AtomicStrain
from mdapy_tpu.analysis.wigner_seitz_defect import WignerSeitzAnalysis


def _rotation_matrix(rng):
    q, r = np.linalg.qr(rng.normal(size=(3, 3)))
    q *= np.sign(np.diag(r))
    if np.linalg.det(q) < 0:
        q[:, 0] = -q[:, 0]
    return q


def _lattice(basis, n, a, tilt):
    cells = np.stack(
        np.meshgrid(*[np.arange(n)] * 3, indexing="ij"), axis=-1
    ).reshape(-1, 3)
    frac = (cells[:, None, :] + basis[None, :, :]).reshape(-1, 3) / n
    box = np.array(tilt) * n * a
    return frac @ box, box


_FCC_BASIS = np.array([[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]])
_DIA_BASIS = np.array([
    [0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5],
    [0.25, 0.25, 0.25], [0.75, 0.75, 0.25],
    [0.75, 0.25, 0.75], [0.25, 0.75, 0.75],
])

RNG = np.random.default_rng(42)
ROT = _rotation_matrix(RNG)

_POS_FCC, _BOX_FCC = _lattice(
    _FCC_BASIS, 4, 4.05, [[1, 0, 0], [0.2, 1, 0], [0.1, 0.15, 1]]
)
_POS_FCC = _POS_FCC + RNG.normal(0, 0.08, _POS_FCC.shape)
_POS_DIA, _BOX_DIA = _lattice(
    _DIA_BASIS, 3, 3.567, [[1, 0, 0], [0.25, 1, 0], [0.1, 0.2, 1]]
)
_POS_DIA = _POS_DIA + RNG.normal(0, 0.05, _POS_DIA.shape)

STRUCTURES = {"fcc": (_POS_FCC, _BOX_FCC), "diamond": (_POS_DIA, _BOX_DIA)}


def _pair(structure):
    pos, box = STRUCTURES[structure]
    s1 = mp.System(pos=pos, box=Box(box, boundary=[1, 1, 1]))
    s2 = mp.System(pos=pos @ ROT, box=Box(box @ ROT, boundary=[1, 1, 1]))
    return s1, s2


def _col_equal(s1, s2, col, atol=1e-5):
    v1 = np.asarray(s1.data[col])
    v2 = np.asarray(s2.data[col])
    if v1.dtype.kind in "fc":
        np.testing.assert_allclose(v1, v2, atol=atol, err_msg=col)
    else:
        np.testing.assert_array_equal(v1, v2, err_msg=col)


@pytest.mark.parametrize("structure", ["fcc", "diamond"])
def test_cutoff_neighbor_rotation(structure):
    s1, s2 = _pair(structure)
    s1.build_neighbor(rc=4.0, max_neigh=80)
    v1, d1, n1 = s1.verlet_list, s1.distance_list, s1.neighbor_number
    s2.build_neighbor(rc=4.0, max_neigh=80)
    np.testing.assert_array_equal(n1, s2.neighbor_number)
    np.testing.assert_allclose(
        np.sort(d1, axis=1), np.sort(s2.distance_list, axis=1), atol=1e-8
    )


@pytest.mark.parametrize("structure", ["fcc", "diamond"])
def test_nearest_neighbor_rotation(structure):
    s1, s2 = _pair(structure)
    s1.build_nearest_neighbor(12)
    v1, d1 = s1.verlet_list.copy(), s1.distance_list.copy()
    s2.build_nearest_neighbor(12)
    np.testing.assert_allclose(d1, s2.distance_list, atol=1e-8)
    np.testing.assert_array_equal(v1, s2.verlet_list)


PER_ATOM_CASES = [
    ("cal_common_neighbor_analysis", "cna", {"rc": 3.4}),
    ("cal_centro_symmetry_parameter", "csp", {"N": 12}),
    ("cal_ackland_jones_analysis", "aja", {}),
    ("cal_polyhedral_template_matching", "ptm", {}),
    ("cal_steinhardt_bond_orientation", "ql6", {"llist": [6], "nnn": 12}),
    ("cal_voronoi_volume", "volume", {}),
    ("cal_cluster_analysis", "cluster_id", {"rc": 2.0}),
    ("cal_structure_entropy", "entropy", {"rc": 4.0, "sigma": 0.2}),
]


@pytest.mark.parametrize("method,col,kwargs", PER_ATOM_CASES,
                         ids=[c[0] for c in PER_ATOM_CASES])
def test_per_atom_analysis_rotation(method, col, kwargs):
    s1, s2 = _pair("fcc")
    getattr(s1, method)(**kwargs)
    getattr(s2, method)(**kwargs)
    _col_equal(s1, s2, col)


def test_identify_diamond_rotation():
    s1, s2 = _pair("diamond")
    s1.cal_identify_diamond_structure()
    s2.cal_identify_diamond_structure()
    _col_equal(s1, s2, "ids")


def test_rdf_rotation():
    s1, s2 = _pair("fcc")
    g1 = s1.cal_radial_distribution_function(rc=5.0, nbin=100)
    g2 = s2.cal_radial_distribution_function(rc=5.0, nbin=100)
    np.testing.assert_allclose(g1.g_total, g2.g_total, atol=1e-8)


def test_structure_factor_rotation():
    s1, s2 = _pair("fcc")
    f1 = s1.cal_structure_factor(k_min=1.0, k_max=8.0, nbins=60)
    f2 = s2.cal_structure_factor(k_min=1.0, k_max=8.0, nbins=60)
    np.testing.assert_allclose(f1.Sk, f2.Sk, atol=1e-6)


def test_atomic_strain_rotation():
    pos_ref, box = _lattice(
        _FCC_BASIS, 4, 4.05, [[1, 0, 0], [0.2, 1, 0], [0.1, 0.15, 1]]
    )
    disp = np.random.default_rng(3).normal(0, 0.08, pos_ref.shape)
    pos_cur = pos_ref + disp
    cur1 = mp.System(pos=pos_cur, box=Box(box, boundary=[1, 1, 1]))
    cur2 = mp.System(pos=pos_cur @ ROT, box=Box(box @ ROT, boundary=[1, 1, 1]))
    AtomicStrain(
        4.0, mp.System(pos=pos_ref, box=Box(box, boundary=[1, 1, 1]))
    ).compute(cur1)
    AtomicStrain(
        4.0, mp.System(pos=pos_ref @ ROT, box=Box(box @ ROT, boundary=[1, 1, 1]))
    ).compute(cur2)
    for col in ("shear_strain", "volumetric_strain"):
        _col_equal(cur1, cur2, col)


def test_wigner_seitz_rotation():
    pos_ref, box = _lattice(
        _FCC_BASIS, 4, 4.05, [[1, 0, 0], [0.2, 1, 0], [0.1, 0.15, 1]]
    )
    pos_cur = pos_ref + np.random.default_rng(4).normal(0, 0.08, pos_ref.shape)
    keep = np.ones(len(pos_cur), bool)
    keep[[10, 50, 100]] = False
    pos_cur = pos_cur[keep]
    ws1 = WignerSeitzAnalysis(
        mp.System(pos=pos_ref, box=Box(box, boundary=[1, 1, 1]))
    )
    out1 = ws1.compute(mp.System(pos=pos_cur, box=Box(box, boundary=[1, 1, 1])))
    ws2 = WignerSeitzAnalysis(
        mp.System(pos=pos_ref @ ROT, box=Box(box @ ROT, boundary=[1, 1, 1]))
    )
    out2 = ws2.compute(
        mp.System(pos=pos_cur @ ROT, box=Box(box @ ROT, boundary=[1, 1, 1]))
    )
    assert ws1.vacancy_number == ws2.vacancy_number == 3
    assert ws1.interstitial_number == ws2.interstitial_number
    if isinstance(out1, dict):
        for key in out1:
            np.testing.assert_array_equal(
                np.asarray(out1[key]), np.asarray(out2[key]), err_msg=str(key)
            )
