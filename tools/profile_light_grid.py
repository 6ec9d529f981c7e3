"""Honest light-grid sweep for the AO megakernel (scalar-fetch synced)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import mdapy_tpu as mp

n_cells = int(os.environ.get("BENCH_CELLS", "63"))
a = 3.615
frac = np.array([[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]])
cells = np.mgrid[0:n_cells, 0:n_cells, 0:n_cells].reshape(3, -1).T
pos = (frac[None] + cells[:, None]).reshape(-1, 3) * a
colors = np.tile(np.array([[0.78, 0.5, 0.2, 1.0]], np.float32), (len(pos), 1))
radii = np.full(len(pos), 1.28, np.float32)
cam = mp.preset_camera("perspective", pos, max_radius=1.28)
W, H, AA, K = 1920, 1080, 2, 12

for g in (48, 64):
    os.environ["MDAPY_TPU_LIGHT_GRID"] = str(g)
    ren = mp.TachyonRender(backend="tpu", ao=True, ao_samples=K,
                           aa_samples=AA, background=(1.0, 1.0, 1.0))
    out = ren.render(pos, colors, radii, camera=cam, width=W, height=H,
                     device_output=True)
    float(jnp.max(out.astype(jnp.float32)))
    best = 1e30
    for _ in range(3):
        t0 = time.time()
        out = ren.render(pos, colors, radii, camera=cam, width=W, height=H,
                         device_output=True)
        float(jnp.max(out.astype(jnp.float32)))
        best = min(best, time.time() - t0)
    print(f"grid={g}: {best*1000:.1f} ms/frame", flush=True)
