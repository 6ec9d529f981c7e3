"""System API parity extras: set_element / set_type_by_element /
get_velocities / calc property validation / set_pka (reference
system.py:248-561)."""

import numpy as np
import pytest

import mdapy_tpu as mp


def _fcc():
    return mp.build_crystal("Cu", "fcc", 3.615, nx=2, ny=2, nz=2)


def test_set_element_scalar_and_list():
    s = _fcc()
    s.set_element("Al")
    assert set(np.asarray(s.data["element"]).astype(str)) == {"Al"}
    elems = ["Cu"] * (s.N // 2) + ["Al"] * (s.N - s.N // 2)
    s.set_element(elems)
    assert list(np.asarray(s.data["element"]).astype(str)) == elems
    with pytest.raises(AssertionError):
        s.set_element(["Cu"] * (s.N - 1))


def test_set_type_by_element():
    s = _fcc()
    elems = ["Cu"] * (s.N // 2) + ["Al"] * (s.N - s.N // 2)
    s.set_element(elems)
    s.set_type_by_element(["Cu", "Al"])
    t = np.asarray(s.data["type"])
    assert (t[: s.N // 2] == 1).all() and (t[s.N // 2 :] == 2).all()
    with pytest.raises(AssertionError):
        s.set_type_by_element(["Cu"])  # missing Al


def test_get_velocities_and_calc_property():
    s = _fcc()
    with pytest.raises(AssertionError):
        s.get_velocities()
    rng = np.random.default_rng(0)
    v = rng.normal(size=(s.N, 3))
    s.data["vx"], s.data["vy"], s.data["vz"] = v[:, 0], v[:, 1], v[:, 2]
    out = s.get_velocities()
    assert np.allclose(np.asarray(out["vx"]), v[:, 0])
    with pytest.raises(TypeError):
        s.calc = object()


def test_set_pka_method():
    s = _fcc()
    s.data["vx"] = np.zeros(s.N)
    s.data["vy"] = np.zeros(s.N)
    s.data["vz"] = np.zeros(s.N)
    s.set_element("Cu")
    s.set_pka(energy=1000.0, direction=np.array([1.0, 3.0, 5.0]), index=5)
    v = s.vel
    # total momentum removed (equal masses -> mean velocity ~ 0)
    assert np.allclose(v.mean(axis=0), 0.0, atol=1e-12)
    # PKA velocity relative to the background matches energy + direction
    rel = v[5] - v[0]
    d = rel / np.linalg.norm(rel)
    assert np.allclose(d, np.array([1, 3, 5]) / np.linalg.norm([1, 3, 5]))
    m = 63.546
    ek = 0.5 * m * np.sum(rel**2) * 0.00964853322 * 1e4 / 0.00964853322
    # |rel| in A/fs; Ek[eV] = 0.5 m v^2 / ev_amu_factor^2 with the util's
    # conversion -> just invert the util's own formula
    speed = np.sqrt(2.0 * 1000.0 / m)  # util's pre-conversion speed
    from mdapy_tpu.utils.tool_function import _EV_AMU_TO_A_FS

    assert abs(np.linalg.norm(rel) - speed / _EV_AMU_TO_A_FS) < 1e-9
