"""Pixel-parity gates vs the REFERENCE CPU Tachyon renderer.

The golden driver (tools/golden_tachyon) compiles the reference's vendored
Tachyon engine and mdapy's tachyon_render.h wrapper unchanged, and runs it on
binary scene descriptions.  Deterministic configs (no AA / no AO) must match
pixel-exactly up to silhouette-tangency ties; Monte-Carlo configs (AA/AO) are
compared statistically at high sample counts.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

HERE = os.path.dirname(os.path.abspath(__file__))
GOLDEN_DIR = os.path.join(HERE, "..", "tools", "golden_tachyon")
sys.path.insert(0, GOLDEN_DIR)


@pytest.fixture(scope="module")
def golden():
    import golden as g

    if not g.available():
        build = os.path.join(GOLDEN_DIR, "build.sh")
        try:
            subprocess.run(["bash", build], check=True, capture_output=True, timeout=600)
        except Exception as e:  # pragma: no cover
            pytest.skip(f"golden Tachyon driver unavailable: {e}")
    if not g.available():
        pytest.skip("golden Tachyon driver unavailable")
    return g


@pytest.fixture(scope="module")
def ren_exact():
    import mdapy_tpu as mp

    return mp.TachyonRender(backend="cpu", antialiasing=False, ao=False)


def mismatches(gold, mine, tol=1):
    d = np.abs(gold[..., :3].astype(int) - mine[..., :3].astype(int))
    return int(np.sum(d.max(axis=2) > tol)), float(d.mean())


def test_sphere_exact(golden, ren_exact):
    import mdapy_tpu as mp

    pos = np.array([[0.0, 0.0, 0.0]])
    col = np.array([[1, 0.2, 0.2, 1]], np.float32)
    rad = np.array([1.0], np.float32)
    cam = mp.CameraParams()
    g = golden.render_golden(pos, col, rad, cam, width=160, height=120, aa=False, ao=False)
    m = ren_exact.render(pos, col, rad, camera=cam, width=160, height=120)
    bad, mean = mismatches(g, m)
    assert bad == 0 and mean < 0.01


def test_spheres_shadows_exact(golden, ren_exact):
    import mdapy_tpu as mp

    pos = np.array([[0, 0, 0], [0, -101.0, 0]])
    col = np.array([[1, 0.3, 0.2, 1], [0.4, 0.4, 0.9, 1]], np.float32)
    rad = np.array([1.0, 100.0], np.float32)
    cam = mp.CameraParams(position=(6, 3, 6), direction=(-2, -1.2, -2))
    g = golden.render_golden(pos, col, rad, cam, width=160, height=120, aa=False, ao=False)
    m = ren_exact.render(pos, col, rad, camera=cam, width=160, height=120)
    bad, _ = mismatches(g, m)
    assert bad == 0


def test_cylinders_rings_exact(golden, ren_exact):
    import mdapy_tpu as mp

    pos = np.array([[0, 0, 0], [1.2, 0.8, 2.0]])
    col = np.array([[1, 0.2, 0.2, 1], [0.2, 1, 0.2, 1]], np.float32)
    rad = np.array([1.0, 0.6], np.float32)
    box_e = np.array(
        [[[-1, -1, -1], [1, -1, -1]], [[-1, -1, -1], [-1, 1, -1]], [[1, 1, 1], [-1, 1, 1]]]
    )
    bond_e = np.array([[[0, 0, 0], [1.2, 0.8, 2.0]]])
    bond_c = np.array([[0.9, 0.9, 0.2, 1.0]], np.float32)
    cam = mp.CameraParams(position=(3, 4, 8), direction=(-3, -4, -8))
    g = golden.render_golden(
        pos, col, rad, cam, width=160, height=120, aa=False, ao=False,
        bond_edges=bond_e, bond_colors=bond_c, bond_radius=0.15,
        box_edges=box_e, box_radius=0.1,
    )
    m = ren_exact.render(
        pos, col, rad, camera=cam, width=160, height=120,
        bond_edges=bond_e, bond_colors=bond_c, bond_radius=0.15,
        box_edges=box_e, box_edge_radius=0.1,
    )
    bad, _ = mismatches(g, m)
    assert bad <= 2  # cylinder tangency ties


def test_orthographic_exact(golden, ren_exact):
    import mdapy_tpu as mp

    pos = np.array([[0, 0, 0], [1.2, 0.8, 2.0]])
    col = np.array([[1, 0.2, 0.2, 1], [0.2, 1, 0.2, 1]], np.float32)
    rad = np.array([1.0, 0.6], np.float32)
    cam = mp.CameraParams(is_perspective=False, field_of_view=2.5, position=(0, 0, 10))
    g = golden.render_golden(pos, col, rad, cam, width=160, height=120, aa=False, ao=False)
    m = ren_exact.render(pos, col, rad, camera=cam, width=160, height=120)
    bad, _ = mismatches(g, m)
    assert bad <= 6  # exact-tangency silhouette ties at circle extremes


def test_transparency_exact(golden):
    import mdapy_tpu as mp

    pos = np.array([[0, 0, 0], [0.3, 0.1, 2], [-0.2, -0.1, 4]])
    col = np.array(
        [[1, 0.2, 0.2, 0.5], [0.2, 1, 0.2, 0.6], [0.2, 0.2, 1, 0.7]], np.float32
    )
    rad = np.array([1.0, 0.8, 0.9], np.float32)
    cam = mp.CameraParams()
    g = golden.render_golden(
        pos, col, rad, cam, width=120, height=90, aa=False, ao=False, shadows=False
    )
    ren = mp.TachyonRender(backend="cpu", antialiasing=False, ao=False, shadows=False)
    m = ren.render(pos, col, rad, camera=cam, width=120, height=90)
    bad, _ = mismatches(g, m)
    assert bad == 0


def test_transparent_shadow_filter(golden):
    import mdapy_tpu as mp

    pos = np.array([[0, 0, 0], [0.5, 0.3, 2], [0, -101.0, 0]])
    col = np.array(
        [[1, 0.2, 0.2, 0.5], [0.2, 1, 0.2, 1.0], [0.4, 0.4, 0.9, 1.0]], np.float32
    )
    rad = np.array([1.0, 0.6, 100.0], np.float32)
    cam = mp.CameraParams(position=(5, 3, 7), direction=(-5, -3.3, -7))
    g = golden.render_golden(pos, col, rad, cam, width=120, height=90, aa=False, ao=False)
    ren = mp.TachyonRender(backend="cpu", antialiasing=False, ao=False)
    m = ren.render(pos, col, rad, camera=cam, width=120, height=90)
    bad, _ = mismatches(g, m, tol=2)
    assert bad == 0


def test_ao_statistical(golden):
    import mdapy_tpu as mp

    pos = np.array([[0, 0, 0], [0, -101.0, 0]])
    col = np.array([[1, 0.3, 0.2, 1], [0.4, 0.4, 0.9, 1]], np.float32)
    rad = np.array([1.0, 100.0], np.float32)
    cam = mp.CameraParams(position=(6, 3, 6), direction=(-2, -1.2, -2))
    g = golden.render_golden(
        pos, col, rad, cam, width=80, height=60, aa=False, ao=True, ao_samples=256
    )
    ren = mp.TachyonRender(backend="cpu", antialiasing=False, ao=True, ao_samples=256)
    m = ren.render(pos, col, rad, camera=cam, width=80, height=60)
    d = np.abs(g[..., :3].astype(float) - m[..., :3].astype(float))
    assert d.mean() < 4.0
    assert np.percentile(d, 99) < 25.0


def test_closeup_cylinder_cull_no_holes():
    """Perspective close-up of a thick bond: the tile cull must keep every
    covered tile (the paraxial r/z pad underestimated the silhouette near
    the camera — regression for the conservative sqrt(z^2-r^2) bound)."""
    import mdapy_tpu as mp
    from mdapy_tpu.render.camera import CameraParams

    pos = np.array([[0.0, 0, 0], [6.0, 0, 0]])
    colors = np.tile(np.array([[0.8, 0.3, 0.3, 1.0]], np.float32), (2, 1))
    radii = np.full(2, 0.8, np.float32)
    bond_edges = np.array([[[0.5, 0, 0], [5.5, 0, 0]]])
    cam = CameraParams(
        position=(3.0, 0.0, 2.2), direction=(0, 0, -1), up=(0, 1, 0),
        field_of_view=np.radians(60.0), is_perspective=True,
    )
    ren = mp.TachyonRender(backend="cpu", antialiasing=False, ao=False)
    img_tiled = ren.render(pos, colors, radii, camera=cam,
                           bond_edges=bond_edges, bond_radius=0.7,
                           width=160, height=120)
    ren2 = mp.TachyonRender(backend="cpu", antialiasing=False, ao=False)
    ren2.use_tiling = False
    img_brute = ren2.render(pos, colors, radii, camera=cam,
                            bond_edges=bond_edges, bond_radius=0.7,
                            width=160, height=120)
    np.testing.assert_array_equal(img_tiled[..., :3], img_brute[..., :3])
