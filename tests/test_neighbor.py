import numpy as np
import pytest

from mdapy_tpu import Box, Neighbor, NearestNeighbor, System
from mdapy_tpu.neighbor.neighbor import neighbor_search
from mdapy_tpu.neighbor.knn import knn_search


def brute_force_neighbors(pos, box, rc):
    """O(N^2) reference with explicit image loops (handles small boxes)."""
    n = len(pos)
    m = box.matrix
    reps = box.check_small_box(rc)
    shifts = []
    rng = [range(-int(r), int(r) + 1) if b else [0]
           for r, b in zip(reps, box.boundary)]
    for i in rng[0]:
        for j in rng[1]:
            for k in rng[2]:
                shifts.append(i * m[0] + j * m[1] + k * m[2])
    shifts = np.array(shifts)
    out = []
    for i in range(n):
        disp = pos[None, :, :] + shifts[:, None, :] - pos[i]  # (S,N,3)
        d = np.linalg.norm(disp, axis=-1)
        pairs = []
        for s in range(len(shifts)):
            for j in range(n):
                if d[s, j] <= rc and d[s, j] > 1e-9:
                    pairs.append((d[s, j], j))
        pairs.sort()
        out.append(pairs)
    return out


def random_system(n=200, L=12.0, seed=0, triclinic=False, boundary=(1, 1, 1)):
    rng = np.random.default_rng(seed)
    if triclinic:
        m = np.array([[L, 0, 0], [0.3 * L, L, 0], [0.2 * L, -0.1 * L, L]])
    else:
        m = np.eye(3) * L
    frac = rng.uniform(0, 1, (n, 3))
    pos = frac @ m
    return pos, Box(m, boundary)


@pytest.mark.parametrize("triclinic", [False, True])
@pytest.mark.parametrize("boundary", [(1, 1, 1), (1, 1, 0), (0, 0, 0)])
def test_neighbor_matches_brute_force(triclinic, boundary):
    pos, box = random_system(150, 11.0, seed=3, triclinic=triclinic, boundary=boundary)
    rc = 3.2
    verlet, dist, nn = neighbor_search(pos, box, rc)
    ref = brute_force_neighbors(pos, box, rc)
    for i in range(len(pos)):
        got = sorted(
            [(round(dist[i, s], 9), int(verlet[i, s])) for s in range(nn[i])]
        )
        want = sorted([(round(d, 9), j) for d, j in ref[i]])
        assert nn[i] == len(ref[i]), f"atom {i}: count {nn[i]} != {len(ref[i])}"
        got_j = sorted(j for _, j in got)
        want_j = sorted(j for _, j in want)
        assert got_j == want_j, f"atom {i}"
        assert np.allclose([d for d, _ in got], [d for d, _ in want], atol=1e-6)


def test_neighbor_small_box_replication():
    # 4-atom FCC cell, rc larger than the cell: every neighbor via images
    a = 3.615
    frac = np.array([[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]])
    pos = frac * a
    box = Box(a)
    rc = 3.0
    verlet, dist, nn = neighbor_search(pos, box, rc)
    # each fcc atom has 12 nearest neighbors at a/sqrt(2)
    assert np.all(nn == 12)
    assert np.allclose(dist[verlet >= 0][: 12 * 4], a / np.sqrt(2), atol=1e-9)


def test_neighbor_overflow_contract():
    pos, box = random_system(100, 10.0, seed=4)
    with pytest.raises(ValueError, match="max_neigh"):
        neighbor_search(pos, box, 4.0, max_neigh=2)


def test_neighbor_sorted_by_distance():
    pos, box = random_system(120, 11.0, seed=5)
    verlet, dist, nn = neighbor_search(pos, box, 4.0)
    for i in range(len(pos)):
        d = dist[i, : nn[i]]
        assert np.all(np.diff(d) >= -1e-12)


def test_knn_exact():
    pos, box = random_system(150, 11.0, seed=6, triclinic=True)
    k = 12
    idx, dist = knn_search(pos, box, k)
    ref = brute_force_neighbors(pos, box, 6.0)
    for i in range(len(pos)):
        want = ref[i][:k]
        assert len(want) == k
        assert np.allclose(dist[i], [d for d, _ in want], atol=1e-6)


def test_knn_small_system():
    # fewer atoms than needed without replication
    a = 3.615
    frac = np.array([[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]])
    pos = frac * a
    box = Box(a)
    idx, dist = knn_search(pos, box, 12 + 6)
    assert np.allclose(dist[:, :12], a / np.sqrt(2), atol=1e-9)


def test_neighbor_class_api():
    pos, box = random_system(80, 10.0, seed=7)
    n = Neighbor(pos, box, rc=3.0).compute()
    assert n.verlet_list.shape[0] == 80
    assert n.neighbor_number.dtype == np.int32
    k = NearestNeighbor(pos, box, k=8).compute()
    assert k.verlet_list.shape == (80, 8)


def test_dense_matches_gather_kernel():
    """The gather-free (dense grid) kernel and the gather kernel are two
    implementations of one contract — cross-validate them on a disordered
    triclinic system (the rdf-streaming-style kernel-equivalence pattern,
    reference test_rdf_streaming.py)."""
    import jax.numpy as jnp

    import mdapy_tpu.neighbor.cell_list as cl
    from mdapy_tpu.core.box import Box

    rng = np.random.default_rng(11)
    m = np.array([[22.0, 0, 0], [3.0, 19.0, 0], [1.0, 2.0, 17.0]])
    pos = rng.uniform(0, 1, (400, 3)) @ m
    box = Box(m)
    rc = 4.5
    ncells = cl.cell_grid_shape(box.matrix, rc)
    pj = jnp.asarray(pos)
    mj = jnp.asarray(box.matrix)
    oj = jnp.asarray(box.origin)
    bj = jnp.asarray(box.boundary)
    order, scid, cstart, ccount, mo = cl.cell_occupancy(pj, mj, oj, bj, ncells)
    M = int(mo)
    assert cl.dense_eligible(ncells, (1, 1, 1), M)
    v1, d1, c1, mc1 = cl.neighbor_list_fixed(
        pj, mj, oj, bj, rc, ncells, order, cstart, ccount, M,
        max_neigh=64, chunk=512,
    )
    v2, d2, c2, mc2 = cl.neighbor_list_auto(
        pj, mj, oj, bj, rc, ncells, order, scid, cstart, ccount, M,
        max_neigh=64, chunk=512,
    )
    v1, d1, c1 = np.asarray(v1), np.asarray(d1), np.asarray(c1)
    np.testing.assert_array_equal(np.asarray(c2), c1)
    assert int(mc2) == int(mc1)
    for i in range(len(pos)):
        k = c1[i]
        np.testing.assert_allclose(np.asarray(d2)[i, :k], d1[i, :k], atol=1e-12)
        assert set(np.asarray(v2)[i, :k]) == set(v1[i, :k])


def test_create_bonds_scalar_and_pairwise_and_element():
    """create_bonds cutoff normalization (reference test_build_bond.py):
    scalar, (type,type)->rc dict, and (element,element)->rc dict."""
    import mdapy_tpu as mp
    from mdapy_tpu.core.box import Box

    data = {
        "x": np.array([0.0, 1.0, 2.3, 5.0]),
        "y": np.zeros(4),
        "z": np.zeros(4),
        "type": np.array([1, 2, 2, 1], np.int32),
    }
    s = mp.System(data=dict(data), box=Box([10.0, 10.0, 10.0], boundary=[0, 0, 0]))
    bond = s.create_bonds(1.5)
    np.testing.assert_array_equal(bond, [[0, 1], [1, 2]])
    np.testing.assert_array_equal(s.bond, [[0, 1], [1, 2]])

    s2 = mp.System(data=dict(data), box=Box([10.0, 10.0, 10.0], boundary=[0, 0, 0]))
    bond = s2.create_bonds({(1, 1): 0.5, (1, 2): 1.1, (2, 2): 1.2})
    np.testing.assert_array_equal(bond, [[0, 1]])

    edata = dict(data)
    del edata["type"]
    edata["element"] = np.array(["Cu", "Zr", "Zr", "Cu"], dtype=object)
    s3 = mp.System(data=edata, box=Box([10.0, 10.0, 10.0], boundary=[0, 0, 0]))
    bond = s3.create_bonds({("Cu", "Cu"): 0.5, ("Cu", "Zr"): 1.1, ("Zr", "Zr"): 1.2})
    np.testing.assert_array_equal(bond, [[0, 1]])


def test_knn_pathological_aspect_ratio_box():
    """Stress the density-seeded knn radius (knn.py: 1.45x margin) on an
    extreme slab: dense in-plane, one thin axis, strongly non-uniform."""
    rng = np.random.default_rng(11)
    m = np.array([[60.0, 0, 0], [0, 60.0, 0], [0, 0, 2.2]])
    n = 500
    pos = rng.uniform(0, 1, (n, 3)) @ m
    # clump half the atoms to break the uniform-density assumption
    pos[: n // 2, :2] *= 0.15
    box = Box(m, (1, 1, 1))
    k = 12
    idx, dist = knn_search(pos, box, k)
    ref = brute_force_neighbors(pos, box, 8.0)
    for i in range(n):
        want = [d for d, _ in ref[i][:k]]
        assert len(want) == k, "brute-force rc too small for this check"
        np.testing.assert_allclose(dist[i], want, atol=1e-6)


def test_knn_needle_box():
    """Needle cell (one long axis, two short periodic axes): the knn search
    must escalate its radius past many periodic images without error."""
    rng = np.random.default_rng(12)
    m = np.diag([3.1, 3.3, 90.0])
    n = 160
    pos = rng.uniform(0, 1, (n, 3)) @ m
    box = Box(m, (1, 1, 1))
    k = 10
    idx, dist = knn_search(pos, box, k)
    ref = brute_force_neighbors(pos, box, 9.0)
    for i in range(n):
        want = [d for d, _ in ref[i][:k]]
        assert len(want) == k
        np.testing.assert_allclose(dist[i], want, atol=1e-6)


def test_ptm_thin_slab_replication():
    """PTM's unconditional rc=7.5 replication (analysis/ptm.py) must stay
    correct for a 1-cell-thick periodic slab: perfect FCC everywhere."""
    import mdapy_tpu as mp

    s = mp.build_crystal("Cu", "fcc", 3.615, nx=6, ny=6, nz=1)
    s.cal_polyhedral_template_matching()
    ptm = np.asarray(s.data["ptm"])
    assert (ptm == 1).all()  # every atom classified FCC
