"""PTM parity vs OVITO fixtures + perfect-crystal and planar-fault invariants."""

import glob
import os

import numpy as np
import pytest

import mdapy_tpu as mp
from mdapy_tpu.core.box import Box
from conftest import REF_FIXTURES

pytestmark = pytest.mark.slow

SA = os.path.join(REF_FIXTURES, "structure_analysis")
PATHS = sorted(
    p for p in glob.glob(os.path.join(SA, "*.npz"))
    if "ptm" in np.load(p).files
)


@pytest.mark.parametrize("path", PATHS, ids=[os.path.basename(p) for p in PATHS])
def test_ptm_against_fixture(path):
    data = np.load(path)
    system = mp.System(pos=data["pos"], box=Box(data["box"], data["boundary"]))
    system.cal_polyhedral_template_matching()
    got = np.asarray(system.data["ptm"]).astype(data["ptm"].dtype)
    n_diff = int(np.sum(got != data["ptm"]))
    assert n_diff == 0, f"{os.path.basename(path)}: {n_diff}/{len(got)} differ"


def test_ptm_perfect_crystals():
    fcc = mp.build_crystal("Al", "fcc", 4.05, nx=4, ny=4, nz=4)
    fcc.cal_polyhedral_template_matching()
    assert np.all(np.asarray(fcc.data["ptm"]) == 1)

    bcc = mp.build_crystal("Fe", "bcc", 2.86, nx=4, ny=4, nz=4)
    bcc.cal_polyhedral_template_matching()
    assert np.all(np.asarray(bcc.data["ptm"]) == 3)

    hcp = mp.build_crystal("Mg", "hcp", 3.21, nx=4, ny=4, nz=3)
    hcp.cal_polyhedral_template_matching()
    assert np.all(np.asarray(hcp.data["ptm"]) == 2)

    diamond = mp.build_crystal("C", "diamond", 3.5, nx=3, ny=3, nz=3)
    diamond.cal_polyhedral_template_matching(structure="all")
    assert np.all(np.asarray(diamond.data["ptm"]) == 6)


def test_ptm_more_perfect_structures():
    sc = mp.build_crystal("W", "sc", 3.16, nx=4, ny=4, nz=4)
    sc.cal_polyhedral_template_matching(structure="all")
    assert np.all(np.asarray(sc.data["ptm"]) == 5)

    lon = mp.build_crystal("C", "lonsdaleite", 2.51, nx=3, ny=3, nz=3)
    lon.cal_polyhedral_template_matching(structure="all")
    assert np.all(np.asarray(lon.data["ptm"]) == 7)

    gra = mp.build_crystal("C", "graphene", 2.46, nx=6, ny=6, nz=1, c=20.0)
    gra.cal_polyhedral_template_matching(structure="graphene")
    assert np.all(np.asarray(gra.data["ptm"]) == 8)


def test_ptm_outputs_and_random():
    s = mp.build_crystal("Al", "fcc", 4.05, nx=3, ny=3, nz=3)
    s.cal_polyhedral_template_matching(
        return_rmsd=True, return_atomic_distance=True, return_orientation=True
    )
    assert np.asarray(s.data["rmsd"]).max() < 1e-6
    # interatomic distance = fcc NN distance a/sqrt(2)
    np.testing.assert_allclose(
        np.asarray(s.data["interatomic_distance"]), 4.05 / np.sqrt(2), rtol=1e-6
    )
    q = np.column_stack([np.asarray(s.data[c]) for c in ("qw", "qx", "qy", "qz")])
    np.testing.assert_allclose(np.linalg.norm(q, axis=1), 1.0, rtol=1e-9)

    rng = np.random.default_rng(0)
    rnd = mp.System(pos=rng.uniform(0, 15, (200, 3)), box=Box(np.eye(3) * 15.0))
    rnd.cal_polyhedral_template_matching("all")
    assert (np.asarray(rnd.data["ptm"]) == 0).mean() > 0.95


def _stack(seq, a=1.0, nxy=6):
    dz = a * np.sqrt(2.0 / 3.0)
    offs = {"A": (0.0, 0.0), "B": (0.5, np.sqrt(3) / 6), "C": (1.0, np.sqrt(3) / 3)}
    pos = []
    for k, ch in enumerate(seq):
        ox, oy = offs[ch]
        for i in range(nxy):
            for j in range(nxy):
                pos.append(((i + j * 0.5 + ox) * a, (j * np.sqrt(3) / 2 + oy) * a,
                            k * dz))
    box = Box(
        np.array([[nxy * a, 0, 0],
                  [nxy * a * 0.5, nxy * a * np.sqrt(3) / 2, 0],
                  [0, 0, len(seq) * dz]]),
        [1, 1, 0],
    )
    return mp.System(pos=np.array(pos), box=box)


def _layer_faults(seq):
    s = _stack(seq)
    s.cal_polyhedral_template_matching(identify_fcc_planar_faults=True)
    pft = np.asarray(s.data["pft"])
    lay = np.round(s.pos[:, 2] / np.sqrt(2.0 / 3.0)).astype(int)
    return [sorted(set(pft[lay == L].tolist())) for L in range(len(seq))]


def test_planar_faults_isf():
    f = _layer_faults("ABCABCABABCABCA")
    assert f[7] == [2] and f[8] == [2]  # two adjacent hcp layers -> ISF
    assert all(x == [0] for x in f[1:7])


def test_planar_faults_twin():
    f = _layer_faults("ABCABCABACBACBA")
    assert f[7] == [3]  # single mirror layer -> coherent twin boundary
    assert all(x == [0] for x in f[1:7] + f[8:-1])


def test_planar_faults_esf():
    f = _layer_faults("ABCABCABACABCABC")
    assert f[7] == [5] and f[9] == [5]  # two hcp layers split by fcc -> ESF
    # with identify_esf=False they stay twin boundaries
    s = _stack("ABCABCABACABCABC")
    s.cal_polyhedral_template_matching(identify_fcc_planar_faults=True,
                                       identify_esf=False)
    pft = np.asarray(s.data["pft"])
    lay = np.round(s.pos[:, 2] / np.sqrt(2.0 / 3.0)).astype(int)
    assert sorted(set(pft[lay == 7].tolist())) == [3]


def test_planar_faults_multilayer():
    # four adjacent hcp-like layers -> multi-layer fault (4)
    f = _layer_faults("ABCABCABABABCABC")
    mid = [x for x in f[7:11]]
    assert any(x == [4] for x in mid)


def test_ptm_invalid_structure_raises():
    s = mp.build_crystal("Al", "fcc", 4.05)
    with pytest.raises(ValueError, match="Structure should be"):
        s.cal_polyhedral_template_matching(structure="fcc-xyz")
