"""Tile-sharded rendering over an 8-virtual-device mesh: band-sharded forward
parity vs the single-device tracer, and psum-reduced gradients matching the
unsharded value_and_grad (BASELINE multi-host configs 3/5 exercised at
CPU-mesh scale)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mdapy_tpu.render.camera import camera_frame, preset_camera
from mdapy_tpu.render.distributed import (
    make_mesh,
    render_image_sharded,
    render_train_step,
)
from mdapy_tpu.render.scene import build_scene
from mdapy_tpu.render.tracer import RenderConfig, render_image


def _scene(n_cells=3, dtype=np.float32):
    a = 3.615
    frac = np.array([[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]])
    cells = np.mgrid[0:n_cells, 0:n_cells, 0:n_cells].reshape(3, -1).T
    pos = (frac[None] + cells[:, None]).reshape(-1, 3) * a
    colors = np.tile(np.array([[0.7, 0.4, 0.25, 1.0]], np.float32), (len(pos), 1))
    radii = np.full(len(pos), 1.28, np.float32)
    scene = build_scene(pos, colors, radii, dtype=dtype)
    scene = jax.tree.map(lambda x: jnp.asarray(x, dtype), scene)
    cam = preset_camera("perspective", pos, max_radius=1.28)
    return scene, cam


# deterministic config: no stochastic AA/AO so bands must match bit-for-bit
CFG = RenderConfig(
    aa_samples=0, aa_enabled=False, ao_samples=0, ao_enabled=False,
    shadows_enabled=True,
)
# gradient config: shadows off — the preset view is shadow-dominated
# (ambient-only shading has zero position gradients a.e.)
CFG_GRAD = RenderConfig(
    aa_samples=0, aa_enabled=False, ao_samples=0, ao_enabled=False,
    shadows_enabled=False,
)


def test_sharded_forward_matches_single_device():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(8)
    scene, cam = _scene()
    W, H = 48, 64
    frame = camera_frame(cam, W, H)
    ref = np.asarray(
        render_image(
            scene,
            jnp.asarray(frame["origin"], jnp.float32),
            jnp.asarray(frame["lowleft"], jnp.float32),
            jnp.asarray(frame["iplaneright"], jnp.float32),
            jnp.asarray(frame["iplaneup"], jnp.float32),
            jnp.asarray(frame["view"], jnp.float32),
            jnp.asarray(frame["light_dir"], jnp.float32),
            CFG, W, H, True, 0,
        )
    )
    img = np.asarray(render_image_sharded(scene, frame, CFG, W, H, mesh))
    assert img.shape == (H, W, 3)
    np.testing.assert_allclose(img, ref, atol=1e-6)


def test_sharded_grads_match_unsharded():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(8)
    scene, cam = _scene(2)
    W, H = 32, 32
    frame = camera_frame(cam, W, H)
    camargs = tuple(
        jnp.asarray(frame[k], jnp.float32)
        for k in ("origin", "lowleft", "iplaneright", "iplaneup", "view",
                  "light_dir")
    )
    target = np.asarray(
        render_image(scene, *camargs, CFG_GRAD, W, H, True, 0)
    ) * 0.5

    def loss_unsharded(params):
        c, r, col = params
        s2 = dataclasses.replace(
            scene, sph_center=c, sph_radius=r, sph_color=col
        )
        img = render_image(s2, *camargs, CFG_GRAD, W, H, True, 0)
        return jnp.mean((img - jnp.asarray(target)) ** 2)

    ref_loss, ref_grads = jax.value_and_grad(loss_unsharded)(
        (scene.sph_center, scene.sph_radius, scene.sph_color)
    )
    assert float(jnp.linalg.norm(ref_grads[0])) > 0  # grads must not vanish
    loss, grads = render_train_step(scene, frame, target, CFG_GRAD, W, H, mesh)
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
    for g, gref in zip(grads, ref_grads):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(gref), rtol=1e-4, atol=1e-7
        )


def test_sharded_rejects_bad_height():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(8)
    scene, cam = _scene(2)
    frame = camera_frame(cam, 32, 30)
    with pytest.raises(ValueError):
        render_image_sharded(scene, frame, CFG, 32, 30, mesh)


# --------------------------------------------------- hierarchical (2,4) mesh
def test_hier_mesh_train_step_matches_flat_mesh():
    """psum over cores (ICI) then hosts (DCN) must equal the flat 1-D
    pmean, and remat chunking must not change loss or gradients."""
    from mdapy_tpu.render.multihost import make_hier_mesh, render_train_step_hier

    scene, cam = _scene(2)
    W = H = 32
    frame = camera_frame(cam, W, H)
    rng = np.random.default_rng(3)
    target = rng.uniform(0, 1, (H, W, 3)).astype(np.float32)

    mesh1 = make_mesh(8)
    loss1, grads1 = render_train_step(
        scene, frame, target, CFG, W, H, mesh1, chunk=W * H // 8
    )

    mesh2 = make_hier_mesh(2, 4)
    loss2, grads2 = render_train_step_hier(
        scene, frame, target, CFG, W, H, mesh2, chunk=W * H // 8,
        remat_chunks=1,
    )
    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-6)
    for g1, g2 in zip(grads1, grads2):
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-6)

    loss3, grads3 = render_train_step_hier(
        scene, frame, target, CFG, W, H, mesh2, chunk=W * H // 8,
        remat_chunks=2,
    )
    np.testing.assert_allclose(float(loss2), float(loss3), rtol=1e-6)
    for g2, g3 in zip(grads2, grads3):
        np.testing.assert_allclose(np.asarray(g2), np.asarray(g3), atol=1e-6)


def test_hier_mesh_requires_enough_devices():
    from mdapy_tpu.render.multihost import make_hier_mesh

    with pytest.raises(ValueError):
        make_hier_mesh(4, 8)  # 32 devices on an 8-device host


def test_init_distributed_single_process_noop():
    from mdapy_tpu.render.multihost import init_distributed

    idx, cnt = init_distributed()
    assert idx == 0 and cnt == 1
