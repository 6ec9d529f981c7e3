"""Split the shadows-off band time: raygen / pallas hit / gathers / shading."""
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
from mdapy_tpu.render.scene import build_scene
from mdapy_tpu.render.camera import camera_frame
from mdapy_tpu.render.accel import build_screen_bins, build_light_bins, build_light_records, ScreenBins as SB
from mdapy_tpu.render.pallas_kernels import gather_chunk_data, closest_hit_spheres_tiles, shadow_filter_tiles
from mdapy_tpu.render.tracer_tiled import _ray_box_texit

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
bins = build_screen_bins(scene, frame, width, height)
lb = build_light_bins(scene, frame["light_dir"].astype(np.float32))
chunk_data = gather_chunk_data(bins.sph_chunks, scene.sph_center, scene.sph_radius, scene.sph_color)
lrec = build_light_records(lb, scene)
jax.block_until_ready((chunk_data, lrec))

tile_px = bins.tile_px
P = tile_px * tile_px
S = 13
R = P * S
band_rows = max(1, 2048 // bins.tiles_x)
ty0, ty1 = 17, 34
b0, b1 = ty0 * bins.tiles_x, ty1 * bins.tiles_x
nb = b1 - b0
dtype = np.float32

@jax.jit
def raygen():
    lowleft = jnp.asarray(frame["lowleft"], dtype)
    ipr = jnp.asarray(frame["iplaneright"], dtype)
    ipu = jnp.asarray(frame["iplaneup"], dtype)
    origin = jnp.asarray(frame["origin"], dtype)
    ix = jnp.arange(tile_px, dtype=dtype)
    sub_x = jnp.tile(ix, tile_px); sub_y = jnp.repeat(ix, tile_px)
    tid = jnp.arange(nb, dtype=jnp.int32)
    tx = (tid % bins.tiles_x).astype(dtype)
    ty = (tid // bins.tiles_x).astype(dtype) + ty0
    px0 = tx[:, None] * tile_px + sub_x[None, :]
    py0 = ty[:, None] * tile_px + sub_y[None, :]
    key = jax.random.PRNGKey(0)
    jit2 = jax.random.uniform(key, (nb, S, P, 2), dtype, minval=-0.5, maxval=0.5)
    jit2 = jit2.at[:, 0].set(0.0)
    x = (px0[:, None, :] + jit2[..., 0]).reshape(nb, R)
    y = (py0[:, None, :] + jit2[..., 1]).reshape(nb, R)
    d = lowleft[None, None, :] + x[..., None] * ipr[None, None, :] + y[..., None] * ipu[None, None, :]
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    o = jnp.broadcast_to(origin, (nb, R, 3))
    lo = jnp.min(scene.sph_center - scene.sph_radius[:, None], axis=0)
    hi = jnp.max(scene.sph_center + scene.sph_radius[:, None], axis=0)
    tcap = _ray_box_texit(o.reshape(-1, 3), d.reshape(-1, 3), lo, hi).reshape(nb, R)
    return o, d, tcap

o, d, tcap = raygen(); jax.block_until_ready(o)
t0 = time.time(); o, d, tcap = raygen(); jax.block_until_ready(o)
print(f"raygen: {time.time()-t0:.3f}s")

sub_zmin = bins.sph_zmin[b0:b1]
cd = chunk_data[b0:b1]
bt, sid = closest_hit_spheres_tiles(o, d, tcap, sub_zmin, cd, eps=4e-4)
jax.block_until_ready(bt)
t0 = time.time()
bt, sid = closest_hit_spheres_tiles(o, d, tcap, sub_zmin, cd, eps=4e-4)
jax.block_until_ready(bt)
print(f"pallas closest-hit (real rays): {time.time()-t0:.3f}s")

sph_ids = bins.sph_chunks[b0:b1]

@jax.jit
def gather_stage(bt, sid, o, d):
    nchunks, CH = cd.shape[1], cd.shape[3]
    slot = jnp.maximum(sid, 0)
    ids = sph_ids.reshape(nb, nchunks * CH)
    s2 = jnp.take_along_axis(ids, slot, axis=1)
    s2 = jnp.where(sid >= 0, s2, -1)
    have = s2 >= 0
    si = jnp.maximum(s2, 0)
    hit0 = o + jnp.where(have, bt, 0.0)[..., None] * d
    n0 = hit0 - scene.sph_center[si]
    n0 = n0 / jnp.maximum(jnp.linalg.norm(n0, axis=-1, keepdims=True), 1e-30)
    col = jnp.where(have[..., None], scene.sph_color[si], 0.0)
    return n0, col, hit0

N, col, hit = gather_stage(bt, sid, o, d); jax.block_until_ready(N)
t0 = time.time(); N, col, hit = gather_stage(bt, sid, o, d); jax.block_until_ready(N)
print(f"gather normals/colors: {time.time()-t0:.3f}s")

light = jnp.asarray(frame["light_dir"], dtype)

@jax.jit
def shadow_stage(hit, N, bt, ldata, loffs, lcnt):
    missed = bt >= 1e18
    inten = jnp.sum(N * light[None, None, :], axis=-1)
    lit = (inten > 1/512) & ~missed
    u = hit @ lb.e1 - lb.org[0]
    v = hit @ lb.e2 - lb.org[1]
    tau = hit @ lb.L
    uvt = jnp.stack([u, v, tau], axis=-1)
    gx = jnp.clip(jnp.floor(u * lb.inv_cell), 0, 127).astype(jnp.int32)
    gy = jnp.clip(jnp.floor(v * lb.inv_cell), 0, 127).astype(jnp.int32)
    cellxy = jnp.stack([gx, gy], axis=-1)
    return shadow_filter_tiles(uvt, cellxy, lit.astype(jnp.int32), ldata, loffs, lcnt, grid_n=128, eps=4e-4)

f = shadow_stage(hit, N, bt, *lrec); jax.block_until_ready(f)
t0 = time.time(); f = shadow_stage(hit, N, bt, *lrec); jax.block_until_ready(f)
print(f"pallas shadow: {time.time()-t0:.3f}s")

@jax.jit
def shade_stage(bt, N, col, f):
    missed = bt >= 1e18
    inten = jnp.sum(N * light[None, None, :], axis=-1)
    lit = (inten > 1/512) & ~missed
    diffuse = jnp.where(lit, inten * 0.9 * f, 0.0)
    shade = 0.8 * diffuse + 0.3
    rgb = col[..., :3] * shade[..., None]
    rgb = jnp.where(missed[..., None], 0.0, rgb)
    out = jnp.mean(rgb.reshape(nb, S, P, 3), axis=1)
    return out

out = shade_stage(bt, N, col, f); jax.block_until_ready(out)
t0 = time.time(); out = shade_stage(bt, N, col, f); jax.block_until_ready(out)
print(f"shade+mean: {time.time()-t0:.3f}s")
