"""Sweep tile_px and chunk width for the full pallas band pipeline."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import mdapy_tpu as mp
from mdapy_tpu.render.scene import build_scene
from mdapy_tpu.render.camera import camera_frame
from mdapy_tpu.render.accel import (
    build_screen_bins, build_light_bins, build_light_records, ScreenBins as SB, KindBins,
)
from mdapy_tpu.render.tracer import RenderConfig
from mdapy_tpu.render.tracer_tiled import render_image_pallas
from mdapy_tpu.render.pallas_kernels import gather_chunk_data

n_cells = int(os.environ.get("BENCH_CELLS", "63"))
a = 3.615
frac = np.array([[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]])
cells = np.mgrid[0:n_cells, 0:n_cells, 0:n_cells].reshape(3, -1).T
pos = (frac[None] + cells[:, None]).reshape(-1, 3) * a
colors = np.tile(np.array([[0.78, 0.5, 0.2, 1.0]], np.float32), (len(pos), 1))
radii = np.full(len(pos), 1.28, np.float32)
cam = mp.preset_camera("perspective", pos, max_radius=float(radii.max()))
width, height = 1920, 1080
scene = build_scene(pos, colors, radii, dtype=np.float32)
scene = jax.tree.map(lambda x: jax.device_put(np.asarray(x, np.float32)), scene)
frame = camera_frame(cam, width, height)
lb = build_light_bins(scene, frame["light_dir"].astype(np.float32))
lrec = build_light_records(lb, scene)
jax.block_until_ready(lrec)
cfg = RenderConfig(aa_samples=12, aa_enabled=True, ao_enabled=False, shadows_enabled=True)
common = (frame["origin"], frame["lowleft"], frame["iplaneright"],
          frame["iplaneup"], frame["view"], frame["light_dir"])

for tile_px in (8, 16, 32):
    t0 = time.time()
    bins = build_screen_bins(scene, frame, width, height, tile_px=tile_px)
    chunk_data = gather_chunk_data(bins.sph_chunks, scene.sph_center, scene.sph_radius, scene.sph_color)
    jax.block_until_ready(chunk_data)
    tb = time.time() - t0
    nchunks, CH = chunk_data.shape[1], chunk_data.shape[3]
    band_rows = max(1, 2048 // bins.tiles_x)
    ty0 = bins.tiles_y // 2
    ty1 = min(bins.tiles_y, ty0 + band_rows)
    b0, b1 = ty0 * bins.tiles_x, ty1 * bins.tiles_x
    sub = SB(bins.sph_chunks[b0:b1], bins.sph_zmin[b0:b1], None, None,
             bins.tiles_x, ty1 - ty0, bins.tile_px)
    args = (scene, sub, chunk_data[b0:b1], lb, *common,
            cfg, width, (ty1 - ty0) * bins.tile_px, bool(frame["perspective"]), 0,
            bins.tile_px, bins.tiles_x, ty1 - ty0)
    try:
        img = render_image_pallas(*args, ty_offset=ty0, do_flip=False,
                                  light_records=lrec, light_grid_n=lb.grid)
        jax.block_until_ready(img)
        t0 = time.time()
        img = render_image_pallas(*args, ty_offset=ty0, do_flip=False,
                                  light_records=lrec, light_grid_n=lb.grid)
        jax.block_until_ready(img)
        dt = time.time() - t0
        est = dt * bins.tiles_y / (ty1 - ty0)
        print(f"tile_px={tile_px:3d} chunks={nchunks}x{CH} buildMB={chunk_data.nbytes/1e6:5.0f} "
              f"build={tb:5.1f}s band={dt:.3f}s est_frame={est:.2f}s")
    except Exception as e:
        print(f"tile_px={tile_px}: FAIL {type(e).__name__}: {str(e)[:120]}")
