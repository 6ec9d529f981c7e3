"""Multi-host / hierarchical-mesh rendering and render-training.

Single process (this machine):
    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python examples/06_multihost_render.py
simulates a (2 hosts, 4 cores) topology on virtual devices.

Real multi-host (one process per host, e.g. 2 hosts x 4 chips):
    MDAPY_COORDINATOR=host0:1234 MDAPY_NUM_PROCS=2 MDAPY_PROC_ID=<0|1> \
        python examples/06_multihost_render.py
`init_distributed` wires the processes together; the same code then runs
with the `hosts` mesh axis riding DCN and `cores` riding ICI.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

from mdapy_tpu.render.multihost import (
    init_distributed, make_hier_mesh, render_train_step_hier,
)

proc, nprocs = init_distributed()
print(f"process {proc}/{nprocs}")

import jax

# single-process demo: honor JAX_PLATFORMS=cpu + virtual device count even
# when the interpreter preloaded a single-chip backend (see __graft_entry__)
if os.environ.get("JAX_PLATFORMS") == "cpu":
    import jax.extend.backend

    jax.config.update("jax_platforms", "cpu")
    if jax.extend.backend.backends() and len(jax.devices()) == 1:
        jax.extend.backend.clear_backends()
import jax.numpy as jnp

import mdapy_tpu as mp
from mdapy_tpu.render.camera import camera_frame, preset_camera
from mdapy_tpu.render.scene import build_scene
from mdapy_tpu.render.tracer import RenderConfig

n_dev = len(jax.devices())
cores = max(n_dev // 2, 1)
mesh = make_hier_mesh(2 if n_dev >= 2 else 1, cores)
print("mesh:", dict(zip(mesh.axis_names, mesh.devices.shape)))

# small FCC scene; each device owns a horizontal scanline band
s = mp.build_crystal("Cu", "fcc", 3.615, nx=3, ny=3, nz=3)
pos = s.pos
colors = np.tile(np.array([[0.78, 0.5, 0.2, 1.0]], np.float32), (s.N, 1))
radii = np.full(s.N, 1.28, np.float32)
scene = jax.tree.map(
    lambda a: jnp.asarray(a, jnp.float32),
    build_scene(pos, colors, radii, dtype=np.float32),
)
cam = preset_camera("perspective", pos, max_radius=1.28)
W = H = 16 * int(np.prod(mesh.devices.shape))
frame = camera_frame(cam, W, H)
cfg = RenderConfig(aa_samples=0, aa_enabled=False, ao_enabled=False,
                   shadows_enabled=True)

target = jnp.zeros((H, W, 3), jnp.float32)
loss, grads = render_train_step_hier(
    scene, frame, target, cfg, W, H, mesh,
    chunk=W * H // int(np.prod(mesh.devices.shape)), remat_chunks=2,
)
print(f"loss={float(loss):.6f}  |dL/dpos|={float(jnp.linalg.norm(grads[0])):.3e}")
print("gradients psum-reduced cores (ICI) -> hosts (DCN); forward remat x2")
