"""config3 phase measurement harness (round-5 work driver, not the bench).

Builds the 1M-atom polycrystal AO scene once, then times the megakernel at
selectable debug_phases / knobs.  Timing discipline per CLAUDE.md: dispatch
N reps, reduce to ONE device scalar, fetch once.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    import jax.numpy as jnp

    import mdapy_tpu as mp

    uc = mp.build_crystal("Cu", "fcc", 3.615)
    poly = mp.CreatePolycrystal(uc, 230.0, 15, randomseed=1)
    s = poly.compute()
    pos = np.ascontiguousarray(s.pos)
    n = len(pos)
    colors = np.tile(np.array([[0.78, 0.5, 0.2, 1.0]], np.float32), (n, 1))
    radii = np.full(n, 1.28, np.float32)
    cam = mp.preset_camera("perspective", pos, max_radius=1.28)
    W, H = 1920, 1080
    AA, K = 2, 12
    ren = mp.TachyonRender(
        backend="tpu", ao=True, ao_samples=K, aa_samples=AA,
        background=(1.0, 1.0, 1.0),
    )
    out = ren.render(pos, colors, radii, camera=cam, width=W, height=H,
                     device_output=True)
    float(jnp.max(out.astype(jnp.float32)))
    # a full throwaway batch: the first ~5 frames after compile run ~40%
    # slower (device-side warmup beyond the first frame — measured)
    acc = None
    for _ in range(5):
        o = ren.render(pos, colors, radii, camera=cam, width=W, height=H,
                       device_output=True)
        m = jnp.max(o.astype(jnp.float32))
        acc = m if acc is None else acc + m
    float(acc)
    nframes = int(os.environ.get("C3_FRAMES", "5"))
    t0 = time.time()
    acc = None
    for _ in range(nframes):
        o = ren.render(pos, colors, radii, camera=cam, width=W, height=H,
                       device_output=True)
        m = jnp.max(o.astype(jnp.float32))
        acc = m if acc is None else acc + m
    float(acc)
    dt = (time.time() - t0) / nframes
    S = AA + 1
    rays = W * H * S * (2 + K)
    print(f"config3 ms/frame = {dt*1e3:.1f}   Grays/s = {rays/dt/1e9:.3f}")


if __name__ == "__main__":
    main()
