"""Profile the TPU render pipeline stage by stage on the bench scene."""
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
from mdapy_tpu.render.accel import build_screen_bins, build_light_bins
from mdapy_tpu.render.tracer import RenderConfig

n_cells = int(os.environ.get("BENCH_CELLS", "63"))
a = 3.615
frac = np.array([[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]])
cells = np.mgrid[0:n_cells, 0:n_cells, 0:n_cells].reshape(3, -1).T
pos = (frac[None] + cells[:, None]).reshape(-1, 3) * a
colors = np.tile(np.array([[0.78, 0.5, 0.2, 1.0]], np.float32), (len(pos), 1))
radii = np.full(len(pos), 1.28, np.float32)
cam = mp.preset_camera("perspective", pos, max_radius=float(radii.max()))
width, height = 1920, 1080

t0 = time.time()
scene = build_scene(pos, colors, radii, dtype=np.float32)
scene = jax.tree.map(lambda x: jax.device_put(np.asarray(x, np.float32)), scene)
jax.block_until_ready(scene)
print(f"scene build+put: {time.time()-t0:.3f}s  n={len(pos)}")

frame = camera_frame(cam, width, height)
t0 = time.time()
bins = build_screen_bins(scene, frame, width, height)
jax.block_until_ready(bins.sph_chunks)
print(f"screen bins: {time.time()-t0:.3f}s  chunks={bins.sph_chunks.shape} tiles={bins.tiles_x}x{bins.tiles_y}")

t0 = time.time()
lb = build_light_bins(scene, frame["light_dir"].astype(np.float32))
jax.block_until_ready(lb.sph.cand)
print(f"light bins: {time.time()-t0:.3f}s  K={lb.sph.cand.shape}")

from mdapy_tpu.render.pallas_kernels import gather_chunk_data, closest_hit_spheres_tiles

t0 = time.time()
chunk_data = gather_chunk_data(bins.sph_chunks, scene.sph_center, scene.sph_radius, scene.sph_color)
jax.block_until_ready(chunk_data)
print(f"gather chunk data: {time.time()-t0:.3f}s  shape={chunk_data.shape}  MB={chunk_data.nbytes/1e6:.0f}")

# --- replicate render_image_pallas internals for one band -----------------
cfg = RenderConfig(aa_samples=12, aa_enabled=True, ao_enabled=False,
                   shadows_enabled=True)
from mdapy_tpu.render import tracer_tiled as tt

band_rows = max(1, 2048 // bins.tiles_x)
print(f"band_rows={band_rows} nbands={-(-bins.tiles_y//band_rows)}")

# time the full band render (warm)
from mdapy_tpu.render.tracer_tiled import render_image_pallas
from mdapy_tpu.render.accel import KindBins, ScreenBins as SB

ty0, ty1 = 0, min(bins.tiles_y, band_rows)
b0, b1 = ty0 * bins.tiles_x, ty1 * bins.tiles_x
sub = SB(bins.sph_chunks[b0:b1], bins.sph_zmin[b0:b1], None, None,
         bins.tiles_x, ty1 - ty0, bins.tile_px)

args = (scene, sub, chunk_data[b0:b1], lb,
        frame["origin"], frame["lowleft"], frame["iplaneright"],
        frame["iplaneup"], frame["view"], frame["light_dir"],
        cfg, width, (ty1 - ty0) * bins.tile_px, bool(frame["perspective"]), 0,
        bins.tile_px, bins.tiles_x, ty1 - ty0)

img = render_image_pallas(*args, interpret=False, ty_offset=0, do_flip=False)
jax.block_until_ready(img)
t0 = time.time()
img = render_image_pallas(*args, interpret=False, ty_offset=0, do_flip=False)
jax.block_until_ready(img)
dt_band = time.time() - t0
print(f"one band ({b1-b0} tiles): {dt_band:.3f}s -> est full frame {dt_band * bins.tiles_y/ (ty1-ty0):.2f}s")

# isolate the pallas closest hit for the same band
nb = b1 - b0
P = bins.tile_px * bins.tile_px
S = 13
R = P * S
rng = np.random.default_rng(0)
o = np.broadcast_to(np.asarray(frame["origin"], np.float32), (nb, R, 3)).copy()
d = rng.standard_normal((nb, R, 3), dtype=np.float32)
d /= np.linalg.norm(d, axis=-1, keepdims=True)
tcap = np.full((nb, R), 1e18, np.float32)

bt, sid = closest_hit_spheres_tiles(o, d, tcap, sub.sph_zmin, chunk_data[b0:b1], eps=4e-4)
jax.block_until_ready(bt)
t0 = time.time()
bt, sid = closest_hit_spheres_tiles(o, d, tcap, sub.sph_zmin, chunk_data[b0:b1], eps=4e-4)
jax.block_until_ready(bt)
print(f"pallas closest-hit (random dirs, worst case): {time.time()-t0:.3f}s")

# shadow filter alone for the band: use plausible hit points
hit = np.asarray(scene.sph_center)[rng.integers(0, len(pos), nb * R)].reshape(nb, R, 3).astype(np.float32)
light = np.asarray(frame["light_dir"], np.float32)

import jax.numpy as jnp
from mdapy_tpu.render.tracer_tiled import _shadow_filter_lb

@jax.jit
def shadow_band(hits):
    def one(h):
        return _shadow_filter_lb(h, scene, lb, jnp.asarray(light), 4e-4, False)
    return jax.lax.map(one, hits)

f = shadow_band(hit)
jax.block_until_ready(f)
t0 = time.time()
f = shadow_band(hit)
jax.block_until_ready(f)
print(f"shadow filter lax.map band: {time.time()-t0:.3f}s")
