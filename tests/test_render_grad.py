"""Differentiable-render gradients (BASELINE config 4): pixel loss ->
grads w.r.t. atom positions, radii, colors, finite-difference checked."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mdapy_tpu.render.camera import camera_frame, preset_camera
from mdapy_tpu.render.scene import scene_from_arrays
from mdapy_tpu.render.tracer import RenderConfig, render_image


def _setup():
    rng = np.random.default_rng(3)
    n = 20
    pos = rng.uniform(0.0, 8.0, (n, 3))
    col = np.c_[rng.uniform(0.2, 1.0, (n, 3)), np.ones(n)]
    rad = rng.uniform(0.6, 1.0, n)
    cam = preset_camera("perspective", pos, max_radius=float(rad.max()))
    frame = camera_frame(cam, 48, 40)
    cfg = RenderConfig(
        aa_samples=0, aa_enabled=False, ao_enabled=False, shadows_enabled=False
    )
    target = rng.uniform(0, 1, (40, 48, 3))

    def loss(pos, rad, col):
        scene = scene_from_arrays(pos, col, rad, dtype=jnp.float64)
        img = render_image(
            scene,
            frame["origin"], frame["lowleft"], frame["iplaneright"],
            frame["iplaneup"], frame["view"], frame["light_dir"],
            cfg, 48, 40, True, 0, chunk=1920,
        )
        return jnp.sum((img - target) ** 2)

    return pos, rad, col, loss


def test_render_grads_match_finite_differences():
    pos, rad, col, loss = _setup()
    g_pos, g_rad, g_col = jax.grad(loss, argnums=(0, 1, 2))(pos, rad, col)
    g_pos, g_rad, g_col = map(np.asarray, (g_pos, g_rad, g_col))
    assert np.isfinite(g_pos).all() and np.isfinite(g_rad).all()
    assert np.abs(g_pos).max() > 0  # image depends on positions

    eps = 1e-5
    rng = np.random.default_rng(0)
    # a handful of random components of each parameter
    for _ in range(4):
        i = rng.integers(len(pos))
        k = rng.integers(3)
        p1 = pos.copy(); p1[i, k] += eps
        p2 = pos.copy(); p2[i, k] -= eps
        fd = (loss(p1, rad, col) - loss(p2, rad, col)) / (2 * eps)
        an = g_pos[i, k]
        assert abs(fd - an) <= 1e-4 * max(1.0, abs(fd)), (i, k, fd, an)
    for _ in range(3):
        i = rng.integers(len(pos))
        r1 = rad.copy(); r1[i] += eps
        r2 = rad.copy(); r2[i] -= eps
        fd = (loss(pos, r1, col) - loss(pos, r2, col)) / (2 * eps)
        assert abs(fd - g_rad[i]) <= 1e-4 * max(1.0, abs(fd)), (i, fd, g_rad[i])
    for _ in range(3):
        i = rng.integers(len(pos))
        k = rng.integers(3)
        c1 = col.copy(); c1[i, k] += eps
        c2 = col.copy(); c2[i, k] -= eps
        fd = (loss(pos, rad, c1) - loss(pos, rad, c2)) / (2 * eps)
        assert abs(fd - g_col[i, k]) <= 1e-4 * max(1.0, abs(fd)), (i, k, fd)


def test_render_grads_shadows_transparency():
    """Gradients stay finite with shadows + transparency peeling enabled."""
    rng = np.random.default_rng(5)
    n = 12
    pos = rng.uniform(0.0, 6.0, (n, 3))
    col = np.c_[rng.uniform(0.2, 1.0, (n, 3)), np.full(n, 0.5)]
    rad = rng.uniform(0.6, 1.0, n)
    cam = preset_camera("perspective", pos, max_radius=float(rad.max()))
    frame = camera_frame(cam, 32, 24)
    cfg = RenderConfig(
        aa_samples=0, aa_enabled=False, ao_enabled=False,
        shadows_enabled=True, transparency=True,
    )

    def loss(pos):
        scene = scene_from_arrays(pos, col, rad, dtype=jnp.float64)
        img = render_image(
            scene,
            frame["origin"], frame["lowleft"], frame["iplaneright"],
            frame["iplaneup"], frame["view"], frame["light_dir"],
            cfg, 32, 24, True, 0, chunk=768,
        )
        return jnp.sum(img**2)

    g = np.asarray(jax.grad(loss)(pos))
    assert np.isfinite(g).all()
    assert np.abs(g).max() > 0
