"""CreatePolycrystal + orthogonal-box Voronoi container tests."""

import numpy as np
import pytest

import mdapy_tpu as mp
from mdapy_tpu.core.box import Box
from mdapy_tpu.build.polycrystal import voronoi_container


def test_voronoi_container_partitions_box():
    rng = np.random.default_rng(0)
    box = Box(np.eye(3) * 40.0)
    seeds = rng.random((8, 3)) * 40.0
    cells = voronoi_container(seeds, box)
    assert len(cells) == 8
    # cell volumes partition the box exactly
    np.testing.assert_allclose(sum(c.volume for c in cells), 40.0 ** 3,
                               rtol=1e-8)
    for c in cells:
        assert c.cavity_radius > 0
        assert len(c.face_vertices) >= 4
        assert len(c.face_areas) == len(c.face_vertices)


def test_polycrystal_metal_basic():
    unit = mp.build_crystal("Al", "fcc", 4.05)
    poly = mp.CreatePolycrystal(unit, box=60.0, seed_number=6,
                                metal_overlap_dis=2.0, randomseed=1)
    s = poly.compute(verbose=False)
    den = s.N / abs(np.linalg.det(s.box.matrix))
    perfect = 4 / 4.05 ** 3
    assert 0.9 * perfect < den <= perfect * 1.001
    assert set(np.unique(np.asarray(s.data["grain_id"])).tolist()) == set(range(1, 7))
    assert sorted(set(np.asarray(s.data["element"]).astype(str))) == ["Al"]
    # overlap criterion respected
    from mdapy_tpu.neighbor.neighbor import neighbor_search

    v, d, _ = neighbor_search(s.pos, s.box, 3.0)
    assert d[v >= 0].min() > 2.0 - 1e-9


def test_polycrystal_reproducible():
    unit = mp.build_crystal("Cu", "fcc", 3.615)
    a = mp.CreatePolycrystal(unit, box=40.0, seed_number=3,
                             metal_overlap_dis=2.0, randomseed=7)
    b = mp.CreatePolycrystal(unit, box=40.0, seed_number=3,
                             metal_overlap_dis=2.0, randomseed=7)
    sa = a.compute(verbose=False)
    sb = b.compute(verbose=False)
    assert sa.N == sb.N
    np.testing.assert_allclose(sa.pos, sb.pos)


def test_polycrystal_graphene_boundaries():
    unit = mp.build_crystal("Al", "fcc", 4.05)
    poly = mp.CreatePolycrystal(unit, box=50.0, seed_number=4,
                                metal_overlap_dis=2.0, add_graphene=True,
                                randomseed=3, face_threshold=5.0)
    s = poly.compute(verbose=False)
    t = np.asarray(s.data["type"])
    assert (t == 2).sum() > 100  # carbon present
    assert sorted(set(np.asarray(s.data["element"]).astype(str))) == ["Al", "C"]


def test_polycrystal_rejects_bad_input():
    unit = mp.build_crystal("Al", "fcc", 4.05)
    with pytest.raises(ValueError, match="Free boundary"):
        mp.CreatePolycrystal(unit, box=Box(np.eye(3) * 50.0, boundary=[1, 1, 0]),
                             seed_number=2)
    with pytest.raises(ValueError, match="seed_position shape"):
        mp.CreatePolycrystal(unit, box=50.0, seed_number=3,
                             seed_position=np.zeros((2, 3)))
    with pytest.raises(ValueError, match="theta_list shape"):
        mp.CreatePolycrystal(unit, box=50.0, seed_number=3,
                             theta_list=np.zeros((2, 3)))


def test_polycrystal_no_rotation_deterministic_seeds():
    unit = mp.build_crystal("Al", "fcc", 4.05)
    sp = np.array([[10.0, 10, 10], [40, 40, 40]])
    poly = mp.CreatePolycrystal(unit, box=50.0, seed_number=2,
                                seed_position=sp, need_rotation=False,
                                metal_overlap_dis=2.0, randomseed=0)
    s = poly.compute(verbose=False)
    assert s.N > 5000
    assert set(np.unique(np.asarray(s.data["grain_id"])).tolist()) == {1, 2}
