"""Multi-device rendering: pixel-tile sharding over a jax Mesh.

Run (8 virtual devices on CPU for demonstration):
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
      python examples/05_distributed_render.py
On a TPU pod slice the same code shards scanline bands over real chips and
psum-reduces scene gradients over ICI.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from mdapy_tpu.render.camera import camera_frame, preset_camera
from mdapy_tpu.render.distributed import (
    make_mesh,
    render_image_sharded,
    render_train_step,
)
from mdapy_tpu.render.scene import build_scene
from mdapy_tpu.render.tracer import RenderConfig

a = 3.615
frac = np.array([[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]])
cells = np.mgrid[0:4, 0:4, 0:4].reshape(3, -1).T
pos = ((frac[None] + cells[:, None]).reshape(-1, 3) * a).astype(np.float32)
colors = np.tile(np.array([[0.7, 0.4, 0.25, 1.0]], np.float32), (len(pos), 1))
radii = np.full(len(pos), 1.28, np.float32)

scene = jax.tree.map(jnp.asarray, build_scene(pos, colors, radii, dtype=np.float32))
cam = preset_camera("perspective", pos, max_radius=1.28)
W, H = 64, 64
frame = camera_frame(cam, W, H)
cfg = RenderConfig(aa_samples=0, aa_enabled=False, ao_enabled=False,
                   shadows_enabled=False)

mesh = make_mesh()  # all visible devices
print(f"mesh: {mesh.devices.size} devices")

img = render_image_sharded(scene, frame, cfg, W, H, mesh)
print("sharded forward:", img.shape, "std:", float(jnp.std(img)))

target = img * 0.5
loss, grads = render_train_step(scene, frame, target, cfg, W, H, mesh)
print("loss:", float(loss), "|dL/dpos|:", float(jnp.linalg.norm(grads[0])))
