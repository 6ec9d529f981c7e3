"""Megakernel (fused Pallas render) parity vs the XLA tiled tracer.

The megakernel is the TPU throughput path (bench.py's ≥1 Grays/s metric); on
CPU it runs in Pallas interpret mode.  With AA off both paths trace the same
deterministic rays, so images must match to fp-order tolerance; with AA on the
jitter sequences differ (in-kernel hash vs jax.random) and the comparison is
statistical.  Reference behavior: Tachyon CPU engine (tachyon_render.h:149-239).
"""

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
from mdapy_tpu.render.tracer_tiled import render_image_tiled
from mdapy_tpu.render.tracer import RenderConfig
from mdapy_tpu.render.megakernel import build_mega_params, render_image_mega

W, H = 96, 80


def _fcc_scene(n=3):
    a = 3.615
    frac = np.array([[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]])
    cells = np.mgrid[0:n, 0:n, 0:n].reshape(3, -1).T
    pos = (frac[None] + cells[:, None]).reshape(-1, 3) * a
    rng = np.random.default_rng(3)
    colors = np.c_[rng.uniform(0.2, 1.0, (len(pos), 3)), np.ones(len(pos))]
    radii = np.full(len(pos), 1.28, np.float32)
    return pos, colors.astype(np.float32), radii


def _render_both(pos, colors, radii, preset, aa_samples, shadows, seed=0,
                 tile_px=16):
    cam = preset_camera(preset, pos, max_radius=float(radii.max()))
    scene = jax.tree.map(
        lambda x: jnp.asarray(x, jnp.float32),
        build_scene(pos, colors, radii, dtype=np.float32),
    )
    frame = camera_frame(cam, W, H)
    persp = bool(frame["perspective"])
    cfg = RenderConfig(
        aa_samples=aa_samples, aa_enabled=aa_samples > 0,
        ao_samples=0, ao_enabled=False, shadows_enabled=shadows,
    )
    bins = build_screen_bins(scene, frame, W, H, tile_px=tile_px)
    bins16 = (bins if tile_px == 16
              else build_screen_bins(scene, frame, W, H, tile_px=16))
    lb = build_light_bins(scene, np.asarray(frame["light_dir"], np.float32), grid=48)
    ref = np.asarray(render_image_tiled(
        scene, bins16, lb,
        frame["origin"], frame["lowleft"], frame["iplaneright"],
        frame["iplaneup"], frame["view"], frame["light_dir"],
        cfg, W, H, persp, seed, bins16.tile_px, bins16.tiles_x,
        bins16.tiles_y,
    ))
    cd = gather_chunk_data(
        bins.sph_chunks, scene.sph_center, scene.sph_radius, scene.sph_color
    )
    lrec = build_light_records(lb, scene) if shadows else (None, None, None)
    lo = np.asarray(jnp.min(scene.sph_center - scene.sph_radius[:, None], axis=0))
    hi = np.asarray(jnp.max(scene.sph_center + scene.sph_radius[:, None], axis=0))
    params = build_mega_params(frame, lb, lo, hi, cfg)
    img = np.asarray(render_image_mega(
        cd, bins.sph_zmin, lrec[0], lrec[1], lrec[2], params, seed,
        S=aa_samples + 1, width=W, height=H,
        tiles_x=bins.tiles_x, tiles_y=bins.tiles_y,
        grid_n=48, eps=cfg.eps, perspective=persp, shadows=shadows,
        interpret=True, tile_px=tile_px,
    ))
    return ref, img


@pytest.mark.parametrize("shadows", [False, True])
def test_mega_exact_perspective(shadows):
    pos, colors, radii = _fcc_scene()
    ref, img = _render_both(pos, colors, radii, "perspective", 0, shadows)
    d = np.abs(img - ref)
    # fp-order tangency ties may flip a pixel or two
    assert int((d.max(axis=2) > 1e-3).sum()) <= 2
    assert d.mean() < 1e-4


def test_mega_exact_orthographic():
    pos, colors, radii = _fcc_scene()
    ref, img = _render_both(pos, colors, radii, "top", 0, True)
    d = np.abs(img - ref)
    assert int((d.max(axis=2) > 1e-3).sum()) <= 2


def test_mega_aa_statistical():
    pos, colors, radii = _fcc_scene()
    ref, img = _render_both(pos, colors, radii, "perspective", 8, True)
    d = np.abs(img - ref)
    # different jitter sequences: interior pixels agree, edges dither
    assert d.mean() < 0.01
    assert np.percentile(d, 99) < 0.25


def test_mega_quantized_output():
    pos, colors, radii = _fcc_scene(2)
    ref, _ = _render_both(pos, colors, radii, "perspective", 0, True)
    cam = preset_camera("perspective", pos, max_radius=float(radii.max()))
    scene = jax.tree.map(
        lambda x: jnp.asarray(x, jnp.float32),
        build_scene(pos, colors, radii, dtype=np.float32),
    )
    frame = camera_frame(cam, W, H)
    cfg = RenderConfig(aa_samples=0, aa_enabled=False, ao_enabled=False)
    bins = build_screen_bins(scene, frame, W, H)
    lb = build_light_bins(scene, np.asarray(frame["light_dir"], np.float32), grid=48)
    cd = gather_chunk_data(
        bins.sph_chunks, scene.sph_center, scene.sph_radius, scene.sph_color
    )
    lrec = build_light_records(lb, scene)
    lo = np.asarray(jnp.min(scene.sph_center - scene.sph_radius[:, None], axis=0))
    hi = np.asarray(jnp.max(scene.sph_center + scene.sph_radius[:, None], axis=0))
    params = build_mega_params(frame, lb, lo, hi, cfg)
    img = np.asarray(render_image_mega(
        cd, bins.sph_zmin, lrec[0], lrec[1], lrec[2], params, 0,
        S=1, width=W, height=H, tiles_x=bins.tiles_x, tiles_y=bins.tiles_y,
        grid_n=48, eps=cfg.eps, perspective=True, shadows=True,
        interpret=True, quantized=True,
    ))
    assert img.dtype == np.uint8 and img.shape == (H, W, 3)
    assert img.std() > 1


def test_mega_banded_matches_full():
    """The over-HBM band-streamed driver must reproduce the one-shot
    megakernel image exactly (same kernel, shifted image-plane origins)."""
    from mdapy_tpu.render.megakernel import render_image_mega_banded

    pos, colors, radii = _fcc_scene()
    cam = preset_camera("perspective", pos, max_radius=float(radii.max()))
    scene = jax.tree.map(
        lambda x: jnp.asarray(x, jnp.float32),
        build_scene(pos, colors, radii, dtype=np.float32),
    )
    frame = camera_frame(cam, W, H)
    cfg = RenderConfig(aa_samples=0, aa_enabled=False, ao_enabled=False,
                       shadows_enabled=True)
    bins = build_screen_bins(scene, frame, W, H)
    lb = build_light_bins(scene, np.asarray(frame["light_dir"], np.float32), grid=48)
    cd = gather_chunk_data(
        bins.sph_chunks, scene.sph_center, scene.sph_radius, scene.sph_color
    )
    lrec = build_light_records(lb, scene)
    lo = np.asarray(jnp.min(scene.sph_center - scene.sph_radius[:, None], 0))
    hi = np.asarray(jnp.max(scene.sph_center + scene.sph_radius[:, None], 0))
    params = build_mega_params(frame, lb, lo, hi, cfg)
    kw = dict(S=1, width=W, height=H, grid_n=48, eps=cfg.eps,
              perspective=True, shadows=True, interpret=True)
    full = np.asarray(render_image_mega(
        cd, bins.sph_zmin, lrec[0], lrec[1], lrec[2], params, 0,
        tiles_x=bins.tiles_x, tiles_y=bins.tiles_y, **kw
    ))
    # force multiple bands: budget fits exactly one tile row per band
    one_row = bins.tiles_x * cd.shape[1] * 8 * cd.shape[3] * 4
    banded = np.asarray(render_image_mega_banded(
        scene, bins, lrec[0], lrec[1], lrec[2], params, 0,
        max_band_bytes=one_row, **kw
    ))
    np.testing.assert_allclose(banded, full, atol=1e-6)


@pytest.mark.parametrize("shadows", [False, True])
def test_mega_tile32_exact(shadows):
    """tile_px=32 (the TPU throughput default for sphere scenes) must
    reproduce the 16px-tile image: tiling is an execution detail."""
    pos, colors, radii = _fcc_scene()
    ref, img = _render_both(pos, colors, radii, "perspective", 0, shadows,
                            tile_px=32)
    d = np.abs(img - ref)
    assert int((d.max(axis=2) > 1e-3).sum()) <= 2
    assert d.mean() < 1e-4


def test_gather_chunk_data_banded_matches():
    """Band-assembled records must equal the one-shot gather exactly."""
    from mdapy_tpu.render.pallas_kernels import (
        gather_chunk_data, gather_chunk_data_banded,
    )
    rng = np.random.default_rng(0)
    n = 50
    centers = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
    radii = jnp.asarray(rng.uniform(0.5, 1.5, n), jnp.float32)
    colors = jnp.asarray(rng.uniform(size=(n, 4)), jnp.float32)
    chunks = jnp.asarray(
        rng.integers(-1, n, size=(7, 3, 128)), jnp.int32
    )
    a = np.asarray(gather_chunk_data(chunks, centers, radii, colors))
    # tiny band budget forces many bands incl. a remainder band
    b = np.asarray(gather_chunk_data_banded(
        chunks, centers, radii, colors, band_bytes=3 * 3 * 8 * 128 * 4,
    ))
    assert np.array_equal(a, b)


@pytest.mark.parametrize("shadows", [False, True])
def test_mega_merged_sweep_exact(shadows):
    """The experimental group-merged shadow sweep must reproduce the
    per-tile sweep image (execution-strategy detail, not semantics)."""
    pos, colors, radii = _fcc_scene()
    cam = preset_camera("perspective", pos, max_radius=float(radii.max()))
    scene = jax.tree.map(
        lambda x: jnp.asarray(x, jnp.float32),
        build_scene(pos, colors, radii, dtype=np.float32),
    )
    frame = camera_frame(cam, W, H)
    cfg = RenderConfig(aa_samples=0, aa_enabled=False, ao_enabled=False,
                       shadows_enabled=shadows)
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
    kw = dict(
        S=1, width=W, height=H, tiles_x=bins.tiles_x, tiles_y=bins.tiles_y,
        grid_n=48, eps=cfg.eps, perspective=True, shadows=shadows,
        interpret=True,
    )
    a = np.asarray(render_image_mega(
        cd, bins.sph_zmin, lrec[0], lrec[1], lrec[2], params, 0, **kw))
    b = np.asarray(render_image_mega(
        cd, bins.sph_zmin, lrec[0], lrec[1], lrec[2], params, 0,
        merged_sweep=True, **kw))
    assert np.abs(a - b).max() < 1e-5
