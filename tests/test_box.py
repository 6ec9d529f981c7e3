import numpy as np
import pytest

from mdapy_tpu import Box, init_box


def test_box_constructor_formats():
    b = Box(10.0)
    assert np.allclose(b.matrix, np.eye(3) * 10)
    assert b.volume == pytest.approx(1000.0)
    assert not b.triclinic

    b2 = Box([4, 5, 6])
    assert np.allclose(np.diag(b2.matrix), [4, 5, 6])

    m = np.array([[10, 0, 0], [2, 9, 0], [1, 1, 8]], dtype=float)
    b3 = Box(m, boundary=[1, 1, 0], origin=[1, 2, 3])
    assert b3.triclinic
    assert np.allclose(b3.origin, [1, 2, 3])
    assert np.array_equal(b3.boundary, [1, 1, 0])

    # legacy (4,3): last row is origin
    b4 = Box(np.vstack([m, [5, 5, 5]]))
    assert np.allclose(b4.origin, [5, 5, 5])
    assert np.allclose(b4.matrix, m)

    # ovito (3,4): last column is origin
    b5 = Box(np.hstack([m, np.array([[7], [8], [9]])]))
    assert np.allclose(b5.origin, [7, 8, 9])
    assert np.allclose(b5.matrix, m)

    # copy ctor
    b6 = Box(b3)
    assert b6 == b3


def test_box_pbc_min_image():
    b = Box(10.0)
    rij = np.array([6.0, -7.0, 3.0])
    wrapped = b.pbc(rij)
    assert np.allclose(wrapped, [-4.0, 3.0, 3.0])

    # free boundary leaves component alone
    b2 = Box(10.0, boundary=[1, 1, 0])
    assert np.allclose(b2.pbc(np.array([6.0, 6.0, 6.0])), [-4.0, -4.0, 6.0])

    # triclinic minimum image agrees with brute force over shifts
    rng = np.random.default_rng(0)
    m = np.array([[8, 0, 0], [3, 7, 0], [-2, 1, 9]], dtype=float)
    bt = Box(m)
    for _ in range(50):
        v = rng.uniform(-15, 15, 3)
        w = bt.pbc(v.copy())
        # contract (same as reference box.py:445): fractional components
        # wrapped into [-0.5, 0.5], and w differs from v by a lattice vector
        frac = w @ bt.inverse_box
        assert np.all(np.abs(frac) <= 0.5 + 1e-12)
        shift_frac = (v - w) @ bt.inverse_box
        assert np.allclose(shift_frac, np.round(shift_frac), atol=1e-9)


def test_box_wrap():
    b = Box(10.0, origin=[5, 5, 5])
    p = np.array([[16.0, 4.0, 25.0]])
    w = b.wrap(p)
    assert np.all(w >= 5.0 - 1e-12) and np.all(w < 15.0 + 1e-12)
    assert np.allclose(w, [[6.0, 14.0, 5.0]])


def test_thickness_and_small_box():
    b = Box(10.0)
    assert np.allclose(b.get_thickness(), [10, 10, 10])
    assert np.array_equal(b.check_small_box(3.0), [1, 1, 1])
    assert np.array_equal(b.check_small_box(6.0), [2, 2, 2])
    b2 = Box(10.0, boundary=[1, 0, 1])
    assert np.array_equal(b2.check_small_box(6.0), [2, 1, 2])


def test_align_to_lammps():
    rng = np.random.default_rng(1)
    m = rng.uniform(-3, 3, (3, 3)) + np.eye(3) * 10
    b = Box(m)
    aligned, rot = b.align_to_lammps_box()
    assert not aligned.is_general_box()
    # rotation preserves pairwise geometry
    assert np.allclose(m @ rot, aligned.matrix, atol=1e-9)
    assert np.allclose(aligned.matrix @ aligned.matrix.T, m @ m.T, atol=1e-8)


def test_init_box_idempotent():
    b = Box(5.0)
    assert init_box(b) is b
