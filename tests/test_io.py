import gzip
import os

import numpy as np
import pytest

from mdapy_tpu import System, Box
from mdapy_tpu.io import load_save as ls


def test_read_dump_triclinic_small(ref_inputs):
    frame, box, info = ls.read_dump(os.path.join(ref_inputs, "tri_box_small.dump"))
    assert frame.nrows > 0
    assert box.triclinic
    assert {"x", "y", "z", "type", "id"} <= set(frame.columns)


def test_read_dump_gz(ref_inputs):
    frame, box, info = ls.read_dump(os.path.join(ref_inputs, "tri_box_big.dump.gz"))
    assert frame.nrows > 0


def test_read_xyz_extended(ref_inputs):
    frame, box, info = ls.read_xyz(os.path.join(ref_inputs, "tri_box_big.xyz"))
    assert frame.nrows > 0
    assert "element" in frame or "type" in frame


def test_read_poscar(ref_inputs):
    frame, box, info = ls.read_poscar(os.path.join(ref_inputs, "Ti.poscar"))
    assert frame.nrows > 0
    assert "element" in frame


def test_read_data(ref_inputs):
    frame, box, info = ls.read_data(os.path.join(ref_inputs, "tri_box_small.data"))
    assert frame.nrows > 0
    assert box.triclinic


def test_dump_roundtrip(tmp_path, ref_inputs):
    src = os.path.join(ref_inputs, "tri_box_small.dump")
    s = System(src)
    out = str(tmp_path / "out.dump")
    s.write_dump(out, timestep=42)
    s2 = System(out)
    assert s2.N == s.N
    assert np.allclose(s2.pos, s.pos, atol=1e-8)
    assert np.allclose(s2.box.matrix, s.box.matrix, atol=1e-8)
    assert np.array_equal(s2.data["type"], s.data["type"])
    assert s2.global_info["timestep"] == 42


def test_xyz_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    n = 50
    m = np.array([[10, 0, 0], [1, 9, 0], [0.5, -0.5, 8]], dtype=float)
    pos = rng.uniform(0, 1, (n, 3)) @ m
    s = System(
        pos=pos, box=Box(m, [1, 1, 0]),
        element_list=np.array(["Cu"] * 25 + ["Ni"] * 25, dtype=object),
    )
    out = str(tmp_path / "t.xyz")
    s.write_xyz(out)
    s2 = System(out)
    assert s2.N == n
    assert np.allclose(s2.pos, s.pos, atol=1e-10)
    assert np.allclose(s2.box.matrix, m, atol=1e-10)
    assert np.array_equal(s2.box.boundary, [1, 1, 0])
    assert list(s2.data["element"]) == list(s.data["element"])


def test_xyz_gz_roundtrip(tmp_path):
    s = System(pos=np.random.default_rng(1).uniform(0, 9, (20, 3)), box=Box(10.0))
    out = str(tmp_path / "t.xyz.gz")
    s.write_xyz(out)
    s2 = System(out)
    assert s2.N == 20
    assert np.allclose(s2.pos, s.pos, atol=1e-10)


def test_poscar_roundtrip(tmp_path):
    a = 3.615
    frac = np.array([[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]])
    s = System(
        pos=frac * a, box=Box(a),
        element_list=np.array(["Cu", "Cu", "Ni", "Ni"], dtype=object),
    )
    out = str(tmp_path / "POSCAR")
    s.write_poscar(out)
    s2 = System(out)
    assert s2.N == 4
    # poscar sorts by element blocks; compare sorted positions
    assert np.allclose(np.sort(s2.pos, axis=0), np.sort(s.pos, axis=0), atol=1e-10)


def test_data_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    n = 30
    pos = rng.uniform(0, 9, (n, 3))
    s = System(
        pos=pos, box=Box(10.0),
        type_list=rng.integers(1, 3, n),
        element_list=np.array(["Cu"] * n, dtype=object),
    )
    out = str(tmp_path / "sys.data")
    s.write_data(out)
    s2 = System(out)
    assert s2.N == n
    assert np.allclose(s2.pos, pos, atol=1e-8)
    assert np.array_equal(s2.data["type"], s.data["type"])
    assert list(s2.data["element"]) == ["Cu"] * n  # inferred from mass


def test_mp_roundtrip(tmp_path):
    rng = np.random.default_rng(3)
    n = 40
    m = np.array([[10, 0, 0], [2, 9, 0], [1, 1, 8]], dtype=float)
    pos = rng.uniform(0, 1, (n, 3)) @ m
    s = System(pos=pos, box=Box(m, [1, 0, 1], origin=[1, 2, 3]))
    s.global_info["note"] = "hello"
    out = str(tmp_path / "sys.mp")
    s.write_mp(out)
    s2 = System(out)
    assert s2.N == n
    assert np.allclose(s2.pos, s.pos, atol=0)  # lossless
    assert np.allclose(s2.box.matrix, m)
    assert np.allclose(s2.box.origin, [1, 2, 3])
    assert np.array_equal(s2.box.boundary, [1, 0, 1])
    assert s2.global_info["note"] == "hello"


def test_system_replicate_wrap():
    a = 4.05
    frac = np.array([[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]])
    s = System(pos=frac * a, box=Box(a))
    s.replicate(2, 3, 1)
    assert s.N == 4 * 6
    assert np.allclose(np.diag(s.box.matrix), [2 * a, 3 * a, a])
    p = s.pos.copy()
    p[0] += np.array([2 * a + 0.1, 0, 0])
    s.update_pos(p)
    s.wrap_pos()
    assert np.all(s.pos[:, 0] < 2 * a + 1e-9)
