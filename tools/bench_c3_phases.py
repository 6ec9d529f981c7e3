"""config3 megakernel phase breakdown: invoke render_image_mega directly at
debug_phases 2 (raygen) / 3 (+trace) / 4 (+shade) / 5 (full sweeps), reusing
the renderer's cached accel/records so only the kernel changes."""

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
    from mdapy_tpu.render.megakernel import render_image_mega

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
    anti = os.environ.get("MDAPY_TPU_AO_ANTIPODAL", "1") != "0"
    ren = mp.TachyonRender(
        backend="tpu", ao=True, ao_samples=K, aa_samples=AA,
        background=(1.0, 1.0, 1.0),
    )
    out = ren.render(pos, colors, radii, camera=cam, width=W, height=H,
                     device_output=True)
    float(jnp.max(out.astype(jnp.float32)))

    bins, lb, cached = ren._accel_cache
    _, chunk_data, light_records, params, other_rec = cached
    ao_passes = ren._ao_cache
    extra_lights = []
    rmax_s = float(radii.max())
    for lr_k, or_k, p_k in ao_passes:
        lrow = np.concatenate([
            p_k[15:18], p_k[18:24], p_k[24:27], p_k[27:28],
            np.zeros(3, np.float32),
        ]).astype(np.float32)
        lrow[13] = rmax_s
        extra_lights.append((lrow, lr_k[0], lr_k[1], lr_k[2], None))
    S = AA + 1

    def run(dbg, nframes=5, nwarm=6):
        def frame():
            return render_image_mega(
                chunk_data, bins.sph_zmin,
                light_records[0], light_records[1], light_records[2],
                params, 0,
                S=S, width=W, height=H,
                tiles_x=bins.tiles_x, tiles_y=bins.tiles_y,
                grid_n=lb.grid, eps=4e-4,
                perspective=True, shadows=True,
                quantized=True, extra_lights=extra_lights,
                ao_shared=True, n_peel=1, tile_px=bins.tile_px,
                ao_antipodal=anti, debug_phases=dbg,
            )
        acc = None
        for _ in range(nwarm):
            o = frame()
            m = jnp.max(o.astype(jnp.float32))
            acc = m if acc is None else acc + m
        float(acc)
        t0 = time.time()
        acc = None
        for _ in range(nframes):
            o = frame()
            m = jnp.max(o.astype(jnp.float32))
            acc = m if acc is None else acc + m
        float(acc)
        return (time.time() - t0) / nframes * 1e3

    phases = [int(p) for p in os.environ.get("C3_PHASES", "3,4,5").split(",")]
    res = {}
    for dbg in phases:
        res[dbg] = run(dbg)
        print(f"debug_phases={dbg}: {res[dbg]:.1f} ms/frame", flush=True)
    print({k: round(v, 1) for k, v in res.items()})


if __name__ == "__main__":
    main()
