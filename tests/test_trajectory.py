"""Trajectory container + unwrap_trajectory parity tests.

Mirrors reference tests/test_io_trajectory.py and test_unwrap_trajectory.py.
"""

import gzip
import io as _io
import contextlib
import shutil
import warnings

import numpy as np
import pytest

import mdapy_tpu as mp
from mdapy_tpu.core.box import Box
from pathlib import Path

from conftest import REF_INPUTS

LAMMPS_DIR = Path(REF_INPUTS) / "lammps"
XYZ_DIR = Path(REF_INPUTS) / "xyz"


def _make_frames(n_frames=3):
    frames = []
    for k in range(n_frames):
        pos = np.array([
            [0.5 + 0.1 * k, 0.5, 0.5],
            [1.5, 1.5 + 0.1 * k, 1.5],
            [2.5, 2.5, 2.5 + 0.1 * k],
        ])
        s = mp.System(pos=pos, box=Box(np.eye(3) * 4.0, boundary=[1, 1, 1]),
                      type_list=np.array([1, 2, 1]))
        s.global_info["timestep"] = 100 * k
        frames.append(s)
    return frames


def _frame(xyz, *, ids=None, types=None, elements=None, xu=None, ix=None,
           box=None, boundary=None):
    xyz = np.asarray(xyz, float)
    cols = {"x": xyz[:, 0], "y": xyz[:, 1], "z": xyz[:, 2]}
    if ids is not None:
        cols["id"] = np.asarray(ids, np.int32)
    if types is not None:
        cols["type"] = np.asarray(types, np.int32)
    if elements is not None:
        cols["element"] = np.asarray(elements, object)
    if xu is not None:
        xu = np.asarray(xu, float)
        cols["xu"], cols["yu"], cols["zu"] = xu[:, 0], xu[:, 1], xu[:, 2]
    if ix is not None:
        ix = np.asarray(ix, np.int32)
        cols["ix"], cols["iy"], cols["iz"] = ix[:, 0], ix[:, 1], ix[:, 2]
    b = box if isinstance(box, Box) else Box(np.diag(box), boundary or [1, 1, 1])
    return mp.System(data=cols, box=b)


# ------------------------------------------------------------------- reading

def test_trajectory_format_inference():
    from mdapy_tpu.io.trajectory import _infer_trajectory_format
    assert _infer_trajectory_format("foo.xyz") == "xyz"
    assert _infer_trajectory_format("foo.xyz.gz") == "xyz"
    assert _infer_trajectory_format("foo.dump") == "dump"
    assert _infer_trajectory_format("foo.dump.gz") == "dump"
    assert _infer_trajectory_format("foo.lammpstrj") == "dump"
    with pytest.raises(ValueError):
        _infer_trajectory_format("foo.unknown")


def test_trajectory_read_multiframe_dump():
    traj = mp.Trajectory(str(LAMMPS_DIR / "dump_multiframe.dump"), verbose=False)
    assert len(traj) == 2
    assert traj[0].global_info.get("timestep") == 0
    assert traj[1].global_info.get("timestep") == 1
    assert traj[0].N == 2 and traj[1].N == 2
    np.testing.assert_allclose(traj[0].data["x"], [0.0, 2.0])
    np.testing.assert_allclose(traj[1].data["x"], [0.1, 2.1])


def test_trajectory_read_singleframe_dump():
    traj = mp.Trajectory(str(LAMMPS_DIR / "dump_basic.dump"), verbose=False)
    assert len(traj) == 1
    assert traj[0].N == 4


def test_dump_rejects_fast_mode():
    with pytest.raises(ValueError, match=r"(?i)not supported.*dump"):
        mp.Trajectory(str(LAMMPS_DIR / "dump_multiframe_5x8.dump"), fast_mode=True)
    assert len(mp.Trajectory(str(LAMMPS_DIR / "dump_multiframe_5x8.dump"),
                             verbose=False)) == 5


def test_dump_serial_verbose(capsys):
    mp.Trajectory(str(LAMMPS_DIR / "dump_multiframe_5x8.dump"), verbose=True)
    assert "[dump.serial]" in capsys.readouterr().out
    mp.Trajectory(str(LAMMPS_DIR / "dump_multiframe_5x8.dump"), verbose=False)
    assert "[dump.serial]" not in capsys.readouterr().out


def test_xyz_fast_matches_serial(tmp_path):
    frames = _make_frames(4)
    out = tmp_path / "uniform.xyz"
    mp.Trajectory(systems=frames).save(str(out))
    serial = mp.Trajectory(str(out), verbose=False)
    fast = mp.Trajectory(str(out), fast_mode=True, verbose=False)
    assert len(serial) == len(fast) == 4
    for k in range(4):
        np.testing.assert_allclose(serial[k].pos, fast[k].pos, atol=1e-9)


def test_xyz_mixed_classical_and_extended():
    traj = mp.XYZTrajectory(str(XYZ_DIR / "mixed_traj.xyz"), verbose=False)
    assert len(traj) == 6
    assert [s.N for s in traj] == [1, 2, 3, 4, 2, 1]
    assert list(traj[0].data["element"]) == ["C"]
    assert list(traj[1].data["element"]) == ["C", "N"]
    assert list(traj[2].data["element"]) == ["C", "H", "H"]
    for col in ("fx", "fy", "fz"):
        assert col in traj[2].data.columns
    np.testing.assert_allclose(traj[2].data["fx"], [0.1, -0.05, -0.05], atol=1e-9)
    assert list(traj[3].box.boundary) == [0, 0, 0]
    assert list(traj[4].box.boundary) == [1, 1, 1]
    assert traj[5].N == 1 and list(traj[5].data["element"]) == ["Ne"]
    np.linalg.inv(traj[5].box.matrix)
    # fast path parses the same (mixed schemas fall back per frame)
    fast = mp.XYZTrajectory(str(XYZ_DIR / "mixed_traj.xyz"), fast_mode=True,
                            verbose=False)
    for a, b in zip(traj, fast):
        np.testing.assert_allclose(a.pos, b.pos)


def test_xyz_mixed_multispace_falls_back_per_frame():
    traj = mp.XYZTrajectory(str(XYZ_DIR / "mixed_multispace.xyz"), verbose=False)
    assert len(traj) == 2
    np.testing.assert_allclose(traj[0].pos, [[0, 0, 0], [1.2, 0, 0]], atol=1e-9)
    np.testing.assert_allclose(traj[1].pos, [[0.1, 0, 0], [1.3, 0, 0]], atol=1e-9)


def test_xyz_no_lattice_frames_keep_forces(tmp_path):
    text = (
        "1\n"
        'Properties=species:S:1:pos:R:3:forces:R:3 pbc="F F F" energy=-1.0\n'
        "H 0.0 0.0 0.0 0.1 0.2 0.3\n"
        "2\n"
        'Lattice="10 0 0 0 10 0 0 0 10" '
        'Properties=species:S:1:pos:R:3:forces:R:3 pbc="T T T"\n'
        "C 0.0 0.0 0.0 -0.1 0.0 0.0\n"
        "O 1.2 0.0 0.0 0.1 0.0 0.0\n"
        "1\n"
        "plain classical comment\n"
        "Ne 0.0 0.0 0.0\n"
    )
    p = tmp_path / "mixed_forces.xyz"
    p.write_text(text)
    traj = mp.Trajectory(str(p), verbose=False)
    assert len(traj) == 3
    assert {"fx", "fy", "fz"} <= set(traj[0].data.columns)
    np.testing.assert_allclose(
        np.column_stack([traj[0].data[c] for c in ("fx", "fy", "fz")]),
        [[0.1, 0.2, 0.3]],
    )
    assert list(traj[0].box.boundary) == [0, 0, 0]
    assert {"fx", "fy", "fz"} <= set(traj[1].data.columns)
    assert list(traj[1].box.boundary) == [1, 1, 1]
    assert "fx" not in traj[2].data.columns


# ------------------------------------------------------------------- list API

def test_trajectory_list_api():
    frames = _make_frames(4)
    traj = mp.Trajectory(systems=frames[:2])
    traj.append(frames[2])
    traj.extend([frames[3]])
    assert len(traj) == 4
    sub = traj[1:3]
    assert isinstance(sub, mp.Trajectory) and len(sub) == 2
    assert traj.pop() is frames[3]
    traj.insert(0, frames[3])
    assert traj[0] is frames[3]


def test_xyztrajectory_inherits_list_api():
    frames = _make_frames(3)
    traj = mp.XYZTrajectory(systems=frames)
    assert len(traj) == 3
    assert isinstance(traj[1:], mp.XYZTrajectory)
    traj.append(frames[0])
    assert traj.pop() is frames[0]


def test_trajectory_fancy_indexing():
    frames = _make_frames(5)
    traj = mp.Trajectory(systems=frames)
    sub = traj[[0, 2, 4]]
    assert isinstance(sub, mp.Trajectory) and len(sub) == 3
    assert sub[1] is frames[2]
    neg = traj[np.array([-1, -2])]
    assert neg[0] is frames[-1] and neg[1] is frames[-2]
    with pytest.raises(IndexError, match="out of bounds"):
        _ = traj[[0, 7]]
    mask = np.array([True, False, True, False, True])
    msub = traj[mask]
    assert len(msub) == 3 and msub[2] is frames[4]
    with pytest.raises(IndexError, match="boolean mask"):
        _ = traj[np.array([True, False])]


def test_trajectory_filter_by_atom_count():
    frames = []
    for n in (1, 5, 8, 2, 10):
        rng = np.random.default_rng(n)
        frames.append(mp.System(pos=rng.uniform(0, 5, (n, 3)),
                                box=Box(np.eye(3) * 5, boundary=[1, 1, 1])))
    traj = mp.Trajectory(systems=frames)
    counts = traj.get_atoms_count()
    assert isinstance(counts, np.ndarray) and counts.dtype == np.int64
    big = traj[counts >= 5]
    assert [s.N for s in big] == [5, 8, 10]
    assert traj[counts == counts.max()][0].N == 10


# -------------------------------------------------------------------- writing

@pytest.mark.parametrize("ext", ["dump", "xyz"])
def test_trajectory_roundtrip(tmp_path, ext):
    frames = _make_frames(3)
    out = tmp_path / f"out.{ext}"
    mp.Trajectory(systems=frames).save(str(out))
    traj2 = mp.Trajectory(str(out), verbose=False)
    assert len(traj2) == 3
    for k in range(3):
        np.testing.assert_allclose(frames[k].pos, traj2[k].pos, atol=1e-9)
    np.testing.assert_allclose(frames[0].box.matrix, traj2[0].box.matrix, atol=1e-9)


def test_trajectory_save_subset(tmp_path):
    frames = _make_frames(5)
    out = tmp_path / "subset.dump"
    mp.Trajectory(systems=frames).save(str(out), frames=[0, 2, 4])
    traj2 = mp.Trajectory(str(out), verbose=False)
    assert len(traj2) == 3
    np.testing.assert_allclose(frames[2].pos, traj2[1].pos, atol=1e-9)


def test_trajectory_append_mode(tmp_path):
    frames = _make_frames(3)
    out = tmp_path / "appended.dump"
    mp.Trajectory(systems=frames[:1]).save(str(out), mode="w")
    mp.Trajectory(systems=frames[1:]).save(str(out), mode="a")
    assert len(mp.Trajectory(str(out), verbose=False)) == 3


def test_trajectory_dump_gz_roundtrip(tmp_path):
    frames = _make_frames(2)
    plain = tmp_path / "tmp.dump"
    mp.Trajectory(systems=frames).save(str(plain))
    gz = tmp_path / "tmp.dump.gz"
    with open(plain, "rb") as fin, gzip.open(gz, "wb") as fout:
        shutil.copyfileobj(fin, fout)
    assert len(mp.Trajectory(str(gz), verbose=False)) == 2


def test_trajectory_explicit_format(tmp_path):
    frames = _make_frames(2)
    out = tmp_path / "weird.txt"
    mp.Trajectory(systems=frames).save(str(out), format="dump")
    assert len(mp.Trajectory(str(out), format="dump", verbose=False)) == 2


# --------------------------------------------------------------------- vacuum

def _classical_cluster(n=3):
    pos = np.array([[i * 1.5, 0.0, 0.0] for i in range(n)])
    s = mp.System(pos=pos, box=Box(np.eye(3) * (1.5 * (n - 1)), boundary=[0, 0, 0]),
                  element_list=np.array(["C"] * n, object))
    return s


def test_save_xyz_vacuum_pads_open_boundaries(tmp_path):
    s = _classical_cluster(3)
    out = tmp_path / "vac.xyz"
    mp.Trajectory(systems=[s]).save(str(out), vacuum=200.0)
    back = mp.Trajectory(str(out), verbose=False)
    assert list(back[0].box.boundary) == [1, 1, 1]
    np.testing.assert_allclose(np.diag(back[0].box.matrix), [203.0] * 3, atol=1e-6)
    np.testing.assert_allclose(
        back[0].pos,
        [[100.0, 100.0, 100.0], [101.5, 100.0, 100.0], [103.0, 100.0, 100.0]],
        atol=1e-6,
    )


def test_save_xyz_vacuum_only_pads_open_axes(tmp_path):
    s = mp.System(pos=np.array([[1.0, 1.0, 0.0], [3.0, 3.0, 0.0]]),
                  box=Box(np.diag([5.0, 5.0, 1.0]), boundary=[1, 1, 0]),
                  element_list=np.array(["C", "C"], object))
    out = tmp_path / "vac_z.xyz"
    mp.Trajectory(systems=[s]).save(str(out), vacuum=50.0)
    back = mp.Trajectory(str(out), verbose=False)
    np.testing.assert_allclose(np.diag(back[0].box.matrix), [5.0, 5.0, 51.0], atol=1e-6)
    assert list(back[0].box.boundary) == [1, 1, 1]
    np.testing.assert_allclose(back[0].pos, [[1, 1, 25], [3, 3, 25]], atol=1e-6)


def test_save_xyz_vacuum_zero_is_passthrough(tmp_path):
    s = _classical_cluster(3)
    out = tmp_path / "rt.xyz"
    mp.Trajectory(systems=[s]).save(str(out), vacuum=0.0)
    assert list(mp.Trajectory(str(out), verbose=False)[0].box.boundary) == [0, 0, 0]


def test_save_xyz_vacuum_does_not_mutate_input(tmp_path):
    s = _classical_cluster(3)
    original_box = s.box.matrix.copy()
    original_pos = s.pos.copy()
    mp.Trajectory(systems=[s]).save(str(tmp_path / "vac.xyz"), vacuum=200.0)
    np.testing.assert_array_equal(s.box.matrix, original_box)
    np.testing.assert_array_equal(s.pos, original_pos)


def test_save_dump_vacuum_warns(tmp_path):
    s = mp.System(pos=np.zeros((2, 3)), box=Box(np.eye(3) * 10.0))
    with pytest.warns(UserWarning, match=r"(?i)vacuum.*ignored.*dump"):
        mp.Trajectory(systems=[s]).save(str(tmp_path / "x.dump"), vacuum=50.0)


def test_save_xyz_vacuum_negative_raises(tmp_path):
    s = _classical_cluster(2)
    with pytest.raises(ValueError, match="vacuum must be >= 0"):
        mp.Trajectory(systems=[s]).save(str(tmp_path / "x.xyz"), vacuum=-1.0)


# --------------------------------------------------------------------- unwrap

def test_unwrapped_columns_take_priority():
    box = Box(np.eye(3) * 10.0)
    f0 = _frame([[5, 0, 0]], xu=[[5, 0, 0]], box=box)
    f1 = _frame([[1, 0, 0]], xu=[[11, 0, 0]], box=box)
    out = mp.unwrap_trajectory(mp.Trajectory(systems=[f0, f1]))
    assert out._unwrap_method == "unwrapped"
    np.testing.assert_array_equal(out[0].data["x"], [5.0])
    np.testing.assert_array_equal(out[1].data["x"], [11.0])


def test_image_flags_combine_with_per_frame_box():
    f0 = _frame([[2, 0, 0]], ix=[[0, 0, 0]], box=[10.0, 10.0, 10.0])
    f1 = _frame([[3, 0, 0]], ix=[[1, 0, 0]], box=[10.0, 10.0, 10.0])
    f2 = _frame([[3, 0, 0]], ix=[[2, 0, 0]], box=[9.0, 10.0, 10.0])
    out = mp.unwrap_trajectory(mp.Trajectory(systems=[f0, f1, f2]))
    assert out._unwrap_method == "image"
    np.testing.assert_array_equal(out[1].data["x"], [13.0])
    np.testing.assert_array_equal(out[2].data["x"], [21.0])


def test_min_image_scan_unwraps_simple_crossing():
    box = Box(np.eye(3) * 10.0)
    frames = [
        _frame([[8, 5, 5]], ids=[1], box=box),
        _frame([[1, 5, 5]], ids=[1], box=box),
        _frame([[3, 5, 5]], ids=[1], box=box),
    ]
    out = mp.unwrap_trajectory(mp.Trajectory(systems=frames))
    assert out._unwrap_method == "min_image"
    xs = np.concatenate([np.asarray(f.data["x"]) for f in out])
    np.testing.assert_array_equal(xs, [8.0, 11.0, 13.0])


def test_min_image_handles_negative_crossing():
    box = Box(np.eye(3) * 10.0)
    frames = [_frame([[1, 0, 0]], ids=[1], box=box),
              _frame([[9, 0, 0]], ids=[1], box=box)]
    out = mp.unwrap_trajectory(mp.Trajectory(systems=frames))
    xs = np.concatenate([np.asarray(f.data["x"]) for f in out])
    np.testing.assert_array_equal(xs, [1.0, -1.0])


def test_min_image_uses_id_for_reordering():
    box = Box(np.eye(3) * 10.0)
    f0 = _frame([[8, 0, 0], [2, 0, 0]], ids=[1, 2], box=box)
    f1 = _frame([[2.5, 0, 0], [1, 0, 0]], ids=[2, 1], box=box)
    out = mp.unwrap_trajectory(mp.Trajectory(systems=[f0, f1]))
    np.testing.assert_array_equal(out[0].data["id"], [1, 2])
    np.testing.assert_array_equal(out[1].data["x"], [11.0, 2.5])


def test_image_path_keeps_id_column():
    box = Box(np.eye(3) * 10.0)
    f0 = _frame([[2, 0, 0], [4, 0, 0]], ids=[1, 2], types=[1, 2],
                elements=["Cu", "Ni"], ix=np.zeros((2, 3), int), box=box)
    f1 = _frame([[3, 0, 0], [5, 0, 0]], ids=[1, 2], types=[1, 2],
                elements=["Cu", "Ni"], ix=[[1, 0, 0], [0, 0, 0]], box=box)
    out = mp.unwrap_trajectory(mp.Trajectory(systems=[f0, f1]))
    assert out._unwrap_method == "image"
    assert out[1].data.columns == ["id", "type", "element", "x", "y", "z"]
    np.testing.assert_array_equal(out[1].data["x"], [13.0, 5.0])
    assert list(out[1].data["element"]) == ["Cu", "Ni"]


def test_atom_count_mismatch_errors():
    box = Box(np.eye(3) * 10.0)
    f0 = _frame([[0, 0, 0], [1, 0, 0]], ids=[1, 2], box=box)
    f1 = _frame([[0, 0, 0]], ids=[1], box=box)
    with pytest.raises(ValueError, match="same number of atoms"):
        mp.unwrap_trajectory(mp.Trajectory(systems=[f0, f1]))


def test_id_set_mismatch_errors():
    box = Box(np.eye(3) * 10.0)
    f0 = _frame([[0, 0, 0]], ids=[1], box=box)
    f1 = _frame([[0, 0, 0]], ids=[2], box=box)
    with pytest.raises(ValueError, match="different id set"):
        mp.unwrap_trajectory(mp.Trajectory(systems=[f0, f1]))


def test_non_periodic_axis_is_left_alone():
    box = Box(np.eye(3) * 10.0, [1, 1, 0])
    frames = [_frame([[5, 5, 1]], ids=[1], box=box),
              _frame([[5, 5, 9]], ids=[1], box=box)]
    out = mp.unwrap_trajectory(mp.Trajectory(systems=frames))
    np.testing.assert_array_equal(out[1].data["z"], [9.0])


def test_pbc_change_warns():
    f0 = _frame([[0, 0, 0]], ids=[1], box=Box(np.eye(3) * 10.0, [1, 1, 1]))
    f1 = _frame([[0, 0, 0]], ids=[1], box=Box(np.eye(3) * 10.0, [1, 1, 0]))
    with pytest.warns(RuntimeWarning, match="PBC flags change"):
        mp.unwrap_trajectory(mp.Trajectory(systems=[f0, f1]))


def test_unwrap_method_attribute():
    box = Box(np.eye(3) * 10.0)
    f0 = _frame([[0, 0, 0]], ids=[1], xu=[[0, 0, 0]], box=box)
    f1 = _frame([[0, 0, 0]], ids=[1], xu=[[10, 0, 0]], box=box)
    out = mp.Trajectory(systems=[f0, f1]).unwrap()
    assert out._unwrap_method == "unwrapped"


def test_id_sorted_output_when_frame0_has_unsorted_ids():
    box = Box(np.eye(3) * 10.0)
    f0 = _frame([[1, 0, 0], [9, 0, 0]], ids=[5, 2], box=box)
    f1 = _frame([[1, 0, 0], [2, 0, 0]], ids=[2, 5], box=box)
    out = mp.unwrap_trajectory(mp.Trajectory(systems=[f0, f1]))
    np.testing.assert_array_equal(out[0].data["id"], [2, 5])
    np.testing.assert_array_equal(out[0].data["x"], [9.0, 1.0])
    np.testing.assert_array_equal(out[1].data["x"], [11.0, 2.0])


def test_gpumd_unwrapped_position_xyz_maps_to_xu(tmp_path):
    path = tmp_path / "gpumd.xyz"
    path.write_text(
        "2\n"
        'Lattice="10.0 0.0 0.0 0.0 10.0 0.0 0.0 0.0 10.0" '
        'Properties=species:S:1:pos:R:3:unwrapped_position:R:3 pbc="T T T"\n'
        "Cu 1.0 0.0 0.0 1.0 0.0 0.0\n"
        "Ni 9.0 0.0 0.0 9.0 0.0 0.0\n"
        "2\n"
        'Lattice="10.0 0.0 0.0 0.0 10.0 0.0 0.0 0.0 10.0" '
        'Properties=species:S:1:pos:R:3:unwrapped_position:R:3 pbc="T T T"\n'
        "Cu 2.0 0.0 0.0 2.0 0.0 0.0\n"
        "Ni 1.0 0.0 0.0 11.0 0.0 0.0\n"
    )
    traj = mp.Trajectory(str(path), verbose=False)
    assert {"x", "y", "z", "xu", "yu", "zu"}.issubset(traj[0].data.columns)
    out = mp.unwrap_trajectory(traj)
    assert out._unwrap_method == "unwrapped"
    np.testing.assert_array_equal(out[1].data["x"], [2.0, 11.0])


def test_msd_consistency_via_xu():
    rng = np.random.default_rng(0)
    L = 10.0
    xu_traj = rng.normal(size=(6, 5, 3)).cumsum(axis=0) * 0.4 + 5.0
    wrapped = xu_traj % L
    frames = [
        _frame(wrapped[t], ids=np.arange(1, 6, dtype=np.int32), xu=xu_traj[t],
               box=Box(np.eye(3) * L))
        for t in range(6)
    ]
    out = mp.unwrap_trajectory(mp.Trajectory(systems=frames))
    for t in range(6):
        got = np.column_stack([np.asarray(out[t].data[c]) for c in "xyz"])
        np.testing.assert_allclose(got, xu_traj[t])


def test_min_image_warns_on_lammps_tilt_flip():
    # LAMMPS clamps xy to +-lx/2; crossing the clamp re-folds the cell so xy
    # jumps by ~lx between frames.  The min-image scan cannot unflip that —
    # parity with the reference is to warn once (unwrap_trajectory.py:116-137).
    lx = 10.0
    m0 = np.array([[lx, 0, 0], [4.5, 10, 0], [0, 0, 10]])   # xy = +0.45*lx
    m1 = np.array([[lx, 0, 0], [-4.5, 10, 0], [0, 0, 10]])  # flipped to -0.45*lx
    f0 = _frame([[1, 1, 1]], ids=[1], box=Box(m0, [1, 1, 1]))
    f1 = _frame([[1.1, 1, 1]], ids=[1], box=Box(m1, [1, 1, 1]))
    f2 = _frame([[1.2, 1, 1]], ids=[1], box=Box(m1, [1, 1, 1]))
    with pytest.warns(RuntimeWarning, match="cell flip"):
        out = mp.unwrap_trajectory(mp.Trajectory(systems=[f0, f1, f2]))
    assert out._unwrap_method == "min_image"


def test_min_image_no_flip_warning_for_breathing_box():
    # NPT-style smooth tilt drift must NOT trigger the flip warning.
    f0 = _frame([[1, 1, 1]], ids=[1],
                box=Box(np.array([[10, 0, 0], [0.5, 10, 0], [0, 0, 10.0]])))
    f1 = _frame([[1.1, 1, 1]], ids=[1],
                box=Box(np.array([[10, 0, 0], [0.7, 10, 0], [0, 0, 10.0]])))
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        mp.unwrap_trajectory(mp.Trajectory(systems=[f0, f1]))
