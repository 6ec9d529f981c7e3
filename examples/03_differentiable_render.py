"""Differentiable rendering: pixel loss -> gradients on atom positions.

Run: python examples/03_differentiable_render.py
The forward tracer is written JAX-differentiable end to end, so a rendered
image is a differentiable function of positions, radii, and colors — the
basis for inverse rendering / structure fitting.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from mdapy_tpu.render.camera import camera_frame, preset_camera
from mdapy_tpu.render.scene import build_scene
from mdapy_tpu.render.tracer import RenderConfig, render_image

a = 3.615
frac = np.array([[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]])
cells = np.mgrid[0:3, 0:3, 0:3].reshape(3, -1).T
pos = ((frac[None] + cells[:, None]).reshape(-1, 3) * a).astype(np.float32)
colors = np.tile(np.array([[0.7, 0.4, 0.2, 1.0]], np.float32), (len(pos), 1))
radii = np.full(len(pos), 1.28, np.float32)

cam = preset_camera("perspective", pos, max_radius=1.28)
frame = camera_frame(cam, 96, 96)
# shadows off for the demo: this diagonal preset is shadow-dominated in
# Tachyon's lighting convention (pixel-exact parity with the reference),
# which would leave only the position-insensitive ambient term
cfg = RenderConfig(aa_samples=0, aa_enabled=False, ao_enabled=False,
                   shadows_enabled=False)
camargs = tuple(
    jnp.asarray(frame[k], jnp.float32)
    for k in ("origin", "lowleft", "iplaneright", "iplaneup", "view", "light_dir")
)

scene = build_scene(pos, colors, radii, dtype=np.float32)
scene = jax.tree.map(jnp.asarray, scene)
target = render_image(scene, *camargs, cfg, 96, 96, True, 0)


def loss(centers):
    import dataclasses

    s = dataclasses.replace(scene, sph_center=centers)
    img = render_image(s, *camargs, cfg, 96, 96, True, 0)
    return jnp.mean((img - target) ** 2)


# perturb and descend back toward the target
centers = scene.sph_center + 0.15
val_grad = jax.jit(jax.value_and_grad(loss))
for step in range(20):
    v, g = val_grad(centers)
    centers = centers - 100.0 * g
    if step % 5 == 0:
        print(f"step {step:2d}  loss {float(v):.3e}  |grad| {float(jnp.linalg.norm(g)):.3e}")
print("final loss:", float(val_grad(centers)[0]))
