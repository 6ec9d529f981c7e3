"""orthogonal_cell parity tests (mirrors reference test_orthogonal_cell.py)."""

import numpy as np
import pytest

import mdapy_tpu as mp
from mdapy_tpu.core.box import Box


def _lex(pos):
    key = np.round(pos, 6)
    return pos[np.lexsort((key[:, 2], key[:, 1], key[:, 0]))]


def _is_diagonal(box, tol=1e-9):
    return np.allclose(box - np.diag(np.diag(box)), 0.0, atol=tol)


def test_orthogonal_hcp_matches_atomsk():
    hcp = mp.build_crystal("Mg", "hcp", a=3.21, c=5.21)
    ortho = mp.orthogonal_cell(hcp)
    assert ortho.N == 4
    assert _is_diagonal(ortho.box.matrix)
    np.testing.assert_allclose(np.diag(ortho.box.matrix),
                               [3.21, 3.21 * np.sqrt(3), 5.21], atol=1e-6)
    expected = np.array([
        [0.0, 0.0, 0.0],
        [0.0, 1.853294364099, 2.605],
        [1.605, 2.779941546148, 0.0],
        [1.605, 4.633235910247, 2.605],
    ])
    np.testing.assert_allclose(_lex(ortho.pos), _lex(expected), atol=1e-6)


def test_orthogonal_passthrough_for_cubic():
    fcc = mp.build_crystal("Cu", "fcc", 3.615, nx=2, ny=2, nz=2)
    ortho = mp.orthogonal_cell(fcc)
    assert ortho.N == fcc.N
    np.testing.assert_allclose(ortho.box.matrix, fcc.box.matrix, atol=1e-9)


def test_orthogonal_wurtzite_gan_preserves_species():
    gan = mp.build_crystal(("Ga", "N"), "wurtzite", a=3.19, c=5.18)
    ortho = mp.orthogonal_cell(gan)
    assert _is_diagonal(ortho.box.matrix)
    assert ortho.N == 8
    eles = sorted(np.asarray(ortho.data["element"]).astype(str).tolist())
    assert eles == ["Ga"] * 4 + ["N"] * 4


def test_orthogonal_find_minimal_collapses_replicated_hcp():
    hcp = mp.build_crystal("Mg", "hcp", a=3.21, c=5.21, nx=2, ny=2, nz=1)
    big = mp.orthogonal_cell(hcp)
    small = mp.orthogonal_cell(hcp, find_minimal=True)
    assert small.N <= big.N
    assert small.N == 4
    np.testing.assert_allclose(np.diag(small.box.matrix),
                               [3.21, 3.21 * np.sqrt(3), 5.21], atol=1e-6)


def test_orthogonal_find_minimal_keeps_minimum_when_already_minimal():
    hcp = mp.build_crystal("Mg", "hcp", a=3.21, c=5.21)
    assert mp.orthogonal_cell(hcp, find_minimal=True).N == 4


def test_orthogonal_atom_density_preserved():
    hcp = mp.build_crystal("Mg", "hcp", a=3.21, c=5.21, nx=3, ny=3, nz=2)
    ortho = mp.orthogonal_cell(hcp)
    den_in = hcp.N / abs(np.linalg.det(hcp.box.matrix))
    den_out = ortho.N / abs(np.linalg.det(ortho.box.matrix))
    np.testing.assert_allclose(den_in, den_out, rtol=1e-9)


def test_orthogonal_rejects_open_boundary():
    sys_ = mp.System(pos=np.zeros((1, 3)),
                     box=Box(np.eye(3) * 5.0, boundary=[1, 1, 0]))
    with pytest.raises(ValueError, match="periodic"):
        mp.orthogonal_cell(sys_)


def test_orthogonal_extra_columns_round_trip():
    hcp = mp.build_crystal("Mg", "hcp", a=3.21, c=5.21)
    rng = np.random.default_rng(0)
    vel = rng.normal(size=(hcp.N, 3))
    cols = {c: np.asarray(hcp.data[c]) for c in hcp.data.columns}
    cols["vx"], cols["vy"], cols["vz"] = vel[:, 0], vel[:, 1], vel[:, 2]
    hcp.update_data(cols)
    ortho = mp.orthogonal_cell(hcp)
    for col in ("vx", "vy", "vz"):
        assert col in ortho.data.columns
    out_vel = np.column_stack(
        [np.asarray(ortho.data[c]) for c in ("vx", "vy", "vz")]
    )
    for v in out_vel:
        assert np.linalg.norm(vel - v, axis=1).min() < 1e-10
