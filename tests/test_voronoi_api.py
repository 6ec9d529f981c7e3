"""Voronoi neighbor lists, face-area filtering, get_cell_info, Cell/Container
(reference: src/mdapy/voronoi.py get_neighbor/get_cell_info/Cell/Container,
src/voronoi.cpp:246-299 filter semantics)."""

import numpy as np
import pytest

import mdapy_tpu as mp
from mdapy_tpu.analysis.voronoi import Cell, Container, VoronoiAnalysis


def _fcc(n=4, a=3.615):
    frac = np.array([[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]])
    cells = np.mgrid[0:n, 0:n, 0:n].reshape(3, -1).T
    pos = (frac[None] + cells[:, None]).reshape(-1, 3) * a
    box = np.array([[n * a, 0, 0], [0, n * a, 0], [0, 0, n * a]], float)
    return pos, box


def test_voronoi_neighbors_fcc():
    pos, box = _fcc()
    v = VoronoiAnalysis(pos, box).compute_neighbors()
    # FCC Voronoi cell is the rhombic dodecahedron: 12 faces
    assert np.all(v.neighbor_number == 12)
    a = 3.615
    nn_dist = a / np.sqrt(2)
    got = v.distance_list[v.verlet_list >= 0]
    assert np.allclose(got, nn_dist, atol=1e-8)
    # rhombic-dodecahedron face area: 12 * (1/3) * A * (d_nn/2) = a^3/4
    # -> A = a^2 * sqrt(2) / 8
    face = v.face_areas[v.verlet_list >= 0]
    assert np.allclose(face, a * a * np.sqrt(2) / 8, atol=1e-6)


def test_voronoi_face_area_thresholds():
    pos, box = _fcc()
    a = 3.615
    area = a * a * np.sqrt(2) / 8
    # absolute threshold just above every face area -> no neighbors survive
    v = VoronoiAnalysis(pos, box).compute_neighbors(a_face_area_threshold=area * 1.01)
    assert np.all(v.neighbor_number == 0)
    # relative threshold: each face is 1/12 of total; 1/12 * 1.01 kills all
    v2 = VoronoiAnalysis(pos, box).compute_neighbors(r_face_area_threshold=1.01 / 12)
    assert np.all(v2.neighbor_number == 0)
    v3 = VoronoiAnalysis(pos, box).compute_neighbors(r_face_area_threshold=0.99 / 12)
    assert np.all(v3.neighbor_number == 12)


def test_system_build_voronoi_neighbor():
    pos, box = _fcc(3)
    s = mp.System(pos=pos, box=box)
    s.build_voronoi_neighbor()
    assert s.voro_verlet_list.shape[0] == s.N
    assert np.all(s.voro_neighbor_number == 12)
    assert s.voro_face_area.shape == s.voro_verlet_list.shape
    # indices are valid atom ids
    ok = s.voro_verlet_list >= 0
    assert s.voro_verlet_list[ok].max() < s.N


def test_small_system_voronoi():
    # 4-atom primitive FCC cell: ghost shells must extend far enough
    pos, box = _fcc(1)
    v = VoronoiAnalysis(pos, box).compute_neighbors()
    assert np.all(v.neighbor_number == 12)
    vol = VoronoiAnalysis(pos, box).compute()
    assert np.allclose(vol.volume, 3.615**3 / 4, rtol=1e-6)


def test_get_cell_info_bcc():
    # BCC Voronoi cell: truncated octahedron, 14 faces (8 hex + 6 square)
    a = 2.86
    n = 3
    frac = np.array([[0, 0, 0], [0.5, 0.5, 0.5]])
    cells = np.mgrid[0:n, 0:n, 0:n].reshape(3, -1).T
    pos = (frac[None] + cells[:, None]).reshape(-1, 3) * a
    box = np.eye(3) * n * a
    vor = VoronoiAnalysis(pos, box)
    fvi, fvp, volume, radius, fareas = vor.get_cell_info()
    assert len(fvi) == len(pos)
    assert np.allclose(volume, a**3 / 2, rtol=1e-6)
    for i in range(len(pos)):
        assert len(fvi[i]) == 14
        assert len(fareas[i]) == 14
        sizes = sorted(len(f) for f in fvi[i])
        assert sizes == [4] * 6 + [6] * 8
        verts = np.asarray(fvp[i])
        assert verts.ndim == 2 and verts.shape[1] == 3
        # face indices reference the vertex array
        assert max(max(f) for f in fvi[i]) < len(verts)


def test_container_cells():
    pos, box = _fcc(2)
    con = Container(pos, box)
    assert len(con) == len(pos)
    c0 = con[0]
    assert isinstance(c0, Cell)
    assert np.isclose(c0.volume, 3.615**3 / 4, rtol=1e-6)
    assert len(c0.face_vertices) == 12
    assert c0.face_areas.shape == (12,)
    assert np.allclose(c0.pos, pos[0])
    total = sum(c.volume for c in con)
    assert np.isclose(total, np.linalg.det(box), rtol=1e-6)


def test_steinhardt_voronoi_weighted_q6_fcc():
    pos, box = _fcc(3)
    s = mp.System(pos=pos, box=box)
    q = s.cal_steinhardt_bond_orientation(llist=(6,), use_voronoi=True, use_weight=True)
    # Voronoi-face-weighted q6 for perfect FCC (all faces equal) = 0.5745
    assert np.allclose(q[:, 0], 0.57452416, atol=1e-4)


def test_voronoi_free_boundary_outliers():
    """Atoms protruding outside the box on a free axis must still find all
    their Voronoi neighbors (the engine's cell-interval distance bounds
    must stay sound for out-of-box coordinates)."""
    import numpy as np
    from mdapy_tpu.analysis.voronoi import VoronoiAnalysis
    from mdapy_tpu.core.box import Box

    rng = np.random.default_rng(7)
    a = 3.615
    nxy, nz = 4, 2
    frac = np.array([[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]])
    cells = np.mgrid[0:nxy, 0:nxy, 0:nz].reshape(3, -1).T
    pos = (frac[None] + cells[:, None]).reshape(-1, 3) * a
    # push the slab's bottom layer below z=0 and rattle everything
    pos[:, 2] -= 0.8
    pos += rng.normal(0, 0.08, pos.shape)
    box = Box(np.diag([nxy * a, nxy * a, nz * a + 6.0]), (1, 1, 0))
    native = VoronoiAnalysis(pos, box).compute(backend="native")
    ref = VoronoiAnalysis(pos, box).compute(backend="qhull")
    # neighbor topology must be exact everywhere (this is what the unsound
    # clamped-bin distance bound used to break: pruned true neighbors)
    np.testing.assert_array_equal(native.neighbor_number, ref.neighbor_number)
    # cell volumes compared for in-box seeds; a seed outside the container
    # on a free axis has no defined cell (reference voro++ rejects such
    # atoms outright), so both backends' wall handling is unspecified there
    inside = (pos[:, 2] >= 0) & (pos[:, 2] <= box.matrix[2, 2])
    np.testing.assert_allclose(
        native.volume[inside], ref.volume[inside], rtol=1e-6
    )
