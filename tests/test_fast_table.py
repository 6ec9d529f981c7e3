"""Native columnar table parser: parity vs the general line parser.

The fast path (native/table_parser.cpp via io/_fast_table.py) must be
bit-exact with the pandas-based fallback on every file it accepts, and must
cleanly decline (-> None) anything irregular so read_dump/read_xyz fall back.
Reference behavior being matched: load_save.py:42-64 (Polars fast path).
"""

import gzip
from pathlib import Path

import numpy as np
import pytest

from conftest import REF_INPUTS
from mdapy_tpu.io import _fast_table, load_save

LAMMPS_DIR = Path(REF_INPUTS) / "lammps"
XYZ_DIR = Path(REF_INPUTS) / "xyz"


def test_native_lib_builds():
    assert _fast_table._get_lib() is not None


def _cols_equal(a, b):
    assert set(a) == set(b)
    for k in a:
        va, vb = np.asarray(a[k]), np.asarray(b[k])
        if va.dtype.kind in "US" or vb.dtype.kind in "US":
            assert list(map(str, va)) == list(map(str, vb)), k
        else:
            np.testing.assert_array_equal(va, vb, err_msg=k)


@pytest.mark.parametrize(
    "name",
    [
        "dump_basic.dump",
        "dump_multiframe.dump",
        "tri_box_small.dump",
        "tri_box_big.dump.gz",
        "dump_with_element.dump",
        "dump_scaled.dump",
        "dump_triclinic.dump",
        "dump_image_flags.dump",
        "dump_mixed_pbc.dump",
        "dump_abc_origin.dump",
        "dump_unwrapped.dump",
        "dump_xyz_with_xs_xu.dump",
        "dump_multispace_2frames.dump",
    ],
)
def test_dump_fast_path_matches_line_parser(name):
    p = LAMMPS_DIR / name
    if not p.exists():
        # some inputs live at the input-files root, not lammps/
        p = Path(REF_INPUTS) / name
    if not p.exists():
        pytest.skip(f"missing input {name}")
    raw = load_save._read_bytes(str(p))
    fast = load_save.parse_dump_bytes(raw)
    slow = load_save.parse_dump_frame(raw.decode("utf-8", "replace").splitlines())
    if fast is None:
        pytest.skip("file not fast-parseable (irregular body) — fallback covers it")
    _cols_equal(dict(fast[0]._cols), dict(slow[0]._cols))
    np.testing.assert_allclose(fast[1].matrix, slow[1].matrix)
    assert fast[2] == slow[2]


def test_dump_fast_path_with_element_column(tmp_path):
    p = tmp_path / "el.dump"
    p.write_text(
        "ITEM: TIMESTEP\n5\nITEM: NUMBER OF ATOMS\n3\n"
        "ITEM: BOX BOUNDS pp pp pp\n0 10\n0 10\n0 10\n"
        "ITEM: ATOMS id element x y z\n"
        "1 Cu 1.0 2.0 3.0\n2 Ni 4e-1 5.0E+1 6.25\n3 CuNiXx 7 8 9\n"
    )
    fr, box, info = load_save.read_dump(str(p))
    assert list(fr["element"]) == ["Cu", "Ni", "CuNiXx"]
    np.testing.assert_array_equal(fr["x"], [1.0, 0.4, 7.0])
    np.testing.assert_array_equal(fr["y"], [2.0, 50.0, 8.0])
    assert fr["id"].dtype == np.int32
    assert info["timestep"] == 5


def test_parse_block_bit_exact_floats():
    # Clinger fast path must be bit-identical to strtod, including
    # exponent forms and long mantissas that take the from_chars fallback.
    toks = [
        "0.1", "-0.1", "1e300", "-1e-300", "3.141592653589793",
        "2.2250738585072014e-308", "123456789012345678901234567890.5",
        "1.7976931348623157e308", "0.000001", "42", "-0", "6.02e23",
    ]
    raw = ("\n".join(" ".join(toks) for _ in range(3)) + "\n").encode()
    cols = _fast_table.parse_block(raw, 0, [f"c{i}" for i in range(len(toks))], 3)
    assert cols is not None
    for i, t in enumerate(toks):
        expect = float(t)
        got = cols[f"c{i}"]
        assert np.all(got == expect), (t, got[0], expect)


def test_parse_block_declines_malformed():
    assert _fast_table.parse_block(b"1 2\n1 2 3\n", 0, ["a", "b", "c"], 2) is None
    assert _fast_table.parse_block(b"1 x 3\n", 0, ["a", "b", "c"], 1) is None
    assert _fast_table.parse_block(b"1 2 3 4\n", 0, ["a", "b", "c"], 1) is None
    assert _fast_table.parse_block(b"1.5x 2 3\n", 0, ["a", "b", "c"], 1) is None
    # too few rows
    assert _fast_table.parse_block(b"1 2 3\n", 0, ["a", "b", "c"], 2) is None


def test_parse_block_ignores_rows_past_max():
    raw = b"1 2\n3 4\nITEM: TIMESTEP\n"
    cols = _fast_table.parse_block(raw, 0, ["a", "b"], 2)
    assert cols is not None
    np.testing.assert_array_equal(cols["a"], [1.0, 3.0])


def test_skip_rows():
    raw = b"a 1\nb 2\n\n   \nc 3\nrest"
    # 3 non-empty rows; blank/space-only lines don't count
    end = _fast_table.skip_rows(raw, 0, 3)
    assert raw[end:] == b"rest"
    assert _fast_table.skip_rows(raw, 0, 5) == -1


def test_xyz_fast_path_matches_line_parser():
    for name in (
        "mixed_traj.xyz",
        "classical.xyz",
        "extended.xyz",
        "extended_crlf.xyz",
        "extended_multispace.xyz",
        "mixed_multispace.xyz",
        "extended_dup_force.xyz",
    ):
        p = XYZ_DIR / name
        if not p.exists():
            continue
        raw = load_save._read_bytes(str(p))
        fast = load_save.parse_xyz_bytes(raw)
        slow = load_save.parse_xyz_frame(raw.decode("utf-8", "replace").splitlines())
        if fast is None:
            continue
        _cols_equal(dict(fast[0]._cols), dict(slow[0]._cols))
        np.testing.assert_allclose(fast[1].matrix, slow[1].matrix)
        assert fast[2] == slow[2]


def test_multiframe_dump_trajectory_fast_matches():
    import mdapy_tpu as mp

    p = LAMMPS_DIR / "dump_multiframe.dump"
    if not p.exists():
        pytest.skip("missing multiframe input")
    traj = mp.Trajectory(str(p), verbose=False)
    # reference: line-parser path
    lines = load_save._read_bytes(str(p)).decode().splitlines()
    from mdapy_tpu.io.trajectory import _split_dump_frames

    chunks = _split_dump_frames(lines)
    assert len(traj) == len(chunks)
    for sys_fast, chunk in zip(traj, chunks):
        fr, box, info = load_save.parse_dump_frame(chunk)
        _cols_equal(dict(sys_fast.data._cols), dict(fr._cols))
        assert sys_fast.global_info["timestep"] == info["timestep"]


def test_xyz_duplicate_force_aliases_stay_unique():
    # reference tests/test_io_xyz.py: force:R:3 claims fx/fy/fz, the later
    # forces:R:3 falls through to forces_0..2 instead of colliding.
    import mdapy_tpu as mp

    p = XYZ_DIR / "extended_dup_force.xyz"
    if not p.exists():
        pytest.skip("missing input")
    s = mp.System(str(p))
    for col in ("fx", "fy", "fz", "forces_0", "forces_1", "forces_2"):
        assert col in s.data.columns
    np.testing.assert_allclose(
        np.column_stack([s.data["fx"], s.data["fy"], s.data["fz"]]),
        [[0.0, 6.825, 0.0], [0.0, -6.825, 0.0]],
        atol=1e-6,
    )
