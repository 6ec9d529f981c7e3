"""Sharded megakernel vs single-device megakernel (virtual 8-CPU mesh).

The distributed path previously sharded only the slow exact tracer
(render/distributed.py round 1); the megakernel band sharding must reproduce
the single-chip fused-kernel image exactly for deterministic configs (AA
sample 0 is unjittered)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mdapy_tpu.render.scene import build_scene
from mdapy_tpu.render.camera import camera_frame, preset_camera
from mdapy_tpu.render.accel import (
    build_light_bins,
    build_light_records,
    build_screen_bins,
)
from mdapy_tpu.render.pallas_kernels import gather_chunk_data
from mdapy_tpu.render.tracer import RenderConfig
from mdapy_tpu.render.megakernel import build_mega_params, render_image_mega
from mdapy_tpu.render.distributed import make_mesh, render_image_mega_sharded

W = 96


def _fcc_scene(n=3):
    a = 3.615
    frac = np.array([[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]])
    cells = np.mgrid[0:n, 0:n, 0:n].reshape(3, -1).T
    pos = (frac[None] + cells[:, None]).reshape(-1, 3) * a
    rng = np.random.default_rng(3)
    colors = np.c_[rng.uniform(0.2, 1.0, (len(pos), 3)), np.ones(len(pos))]
    radii = np.full(len(pos), 1.28, np.float32)
    return pos, colors.astype(np.float32), radii


def _mega_inputs(pos, colors, radii, H, shadows):
    cam = preset_camera("perspective", pos, max_radius=float(radii.max()))
    scene = jax.tree.map(
        lambda x: jnp.asarray(x, jnp.float32),
        build_scene(pos, colors, radii, dtype=np.float32),
    )
    frame = camera_frame(cam, W, H)
    cfg = RenderConfig(
        aa_samples=0, aa_enabled=False, ao_samples=0, ao_enabled=False,
        shadows_enabled=shadows,
    )
    bins = build_screen_bins(scene, frame, W, H)
    lb = build_light_bins(scene, np.asarray(frame["light_dir"], np.float32),
                          grid=48)
    cd = gather_chunk_data(
        bins.sph_chunks, scene.sph_center, scene.sph_radius, scene.sph_color
    )
    lrec = build_light_records(lb, scene) if shadows else (None, None, None)
    lo = np.asarray(jnp.min(scene.sph_center - scene.sph_radius[:, None], 0))
    hi = np.asarray(jnp.max(scene.sph_center + scene.sph_radius[:, None], 0))
    params = build_mega_params(frame, lb, lo, hi, cfg)
    persp = bool(frame["perspective"])
    return cd, bins, lrec, params, cfg, persp


@pytest.mark.parametrize("H", [128, 120])
def test_mega_sharded_matches_single(H):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    pos, colors, radii = _fcc_scene()
    cd, bins, lrec, params, cfg, persp = _mega_inputs(
        pos, colors, radii, H, shadows=True
    )
    assert bins.tiles_y % 8 == 0
    common = dict(
        S=1, width=W, height=H, tiles_x=bins.tiles_x, tiles_y=bins.tiles_y,
        grid_n=48, eps=cfg.eps, perspective=persp, shadows=True,
        interpret=True,
    )
    single = np.asarray(render_image_mega(
        cd, bins.sph_zmin, lrec[0], lrec[1], lrec[2], params, 0, **common
    ))
    mesh = make_mesh(8)
    sharded = np.asarray(render_image_mega_sharded(
        cd, bins.sph_zmin, lrec[0], lrec[1], lrec[2], params, 0,
        mesh=mesh, **common
    ))
    assert sharded.shape == single.shape
    # band-origin reassociation (lowleft + row0*ipu vs y*ipu) can flip a
    # couple of tangency-tie pixels — same tolerance as the mega-vs-tiled
    # parity tests
    d = np.abs(sharded - single)
    assert int((d.max(axis=2) > 1e-3).sum()) <= 4
    assert d.mean() < 1e-4


@pytest.mark.slow
def test_mega_sharded_compiles_on_real_device():
    """VERDICT r4 item 6: the shard_map + Mosaic composition must COMPILE
    and run on actual accelerator hardware, not only under interpret=True
    on the CPU mesh — a 1-device mesh validates compile + numerics
    cheaply."""
    if jax.devices()[0].platform == "cpu":
        pytest.skip("needs an accelerator device")
    H = 128
    pos, colors, radii = _fcc_scene()
    cd, bins, lrec, params, cfg, persp = _mega_inputs(
        pos, colors, radii, H, shadows=True
    )
    common = dict(
        S=1, width=W, height=H, tiles_x=bins.tiles_x, tiles_y=bins.tiles_y,
        grid_n=48, eps=cfg.eps, perspective=persp, shadows=True,
        interpret=False,
    )
    single = np.asarray(render_image_mega(
        cd, bins.sph_zmin, lrec[0], lrec[1], lrec[2], params, 0, **common
    ))
    mesh = make_mesh(1)
    sharded = np.asarray(render_image_mega_sharded(
        cd, bins.sph_zmin, lrec[0], lrec[1], lrec[2], params, 0,
        mesh=mesh, **common
    ))
    assert sharded.shape == single.shape
    d = np.abs(sharded - single)
    assert int((d.max(axis=2) > 1e-3).sum()) <= 4
    assert d.mean() < 1e-4
