"""Profile the megakernel on the real TPU: split primary/shadow/AA costs.

Usage: python tools/profile_render.py [n_cells]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import mdapy_tpu as mp


def build(n_cells):
    a = 3.615
    frac = np.array([[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]])
    cells = np.mgrid[0:n_cells, 0:n_cells, 0:n_cells].reshape(3, -1).T
    pos = (frac[None] + cells[:, None]).reshape(-1, 3) * a
    colors = np.tile(np.array([[0.78, 0.5, 0.2, 1.0]], np.float32), (len(pos), 1))
    radii = np.full(len(pos), 1.28, np.float32)
    return pos, colors, radii


def timed(ren, pos, colors, radii, cam, W, H, n=8):
    out = ren.render(pos, colors, radii, camera=cam, width=W, height=H,
                     device_output=True)
    jax.block_until_ready(out)
    t0 = time.time()
    outs = [ren.render(pos, colors, radii, camera=cam, width=W, height=H,
                       device_output=True) for _ in range(n)]
    jax.block_until_ready(outs)
    return (time.time() - t0) / n


def main():
    n_cells = int(sys.argv[1]) if len(sys.argv) > 1 else 63
    W, H = 1920, 1080
    pos, colors, radii = build(n_cells)
    cam = mp.preset_camera("perspective", pos, max_radius=float(radii.max()))
    n_atoms = len(pos)
    px = W * H

    cases = [
        ("aa12_shadows", dict(ao=False)),
        ("aa12_noshadow", dict(ao=False, shadows=False)),
        ("aa0_shadows", dict(ao=False, antialiasing=False)),
    ]
    for name, kw in cases:
        ren = mp.TachyonRender(backend="tpu", **kw)
        dt = timed(ren, pos, colors, radii, cam, W, H)
        S = 13 if kw.get("antialiasing", True) else 1
        nray = px * S * (2 if kw.get("shadows", True) else 1)
        print(f"{name:16s} {dt*1e3:8.2f} ms/frame   "
              f"{nray/dt/1e9:6.3f} Grays/s  ({n_atoms} atoms)")


if __name__ == "__main__":
    main()
