"""Multi-device rendering: pixel-tile sharding over a `jax.sharding.Mesh`.

The reference is single-node (its Tachyon MPI layer is compiled out —
tachyon_render.h:137 `rt_initialize_nompi`; pthread tiles only,
extern/tachyon/src/threads.c). The TPU-native scale-out replaces both: the
ray grid is the data-parallel axis. Each device owns a horizontal band of
scanlines; primitive arrays are replicated in every device's HBM (sharding
them is only worthwhile past ~50M primitives — a gather/exchange stage can
be added behind the same API then). Gradients of a pixel loss w.r.t. scene
parameters are partial sums over each device's rays, so the backward pass
ends in one `psum` over the mesh — the collective rides ICI.

Public API:
    render_image_sharded(...)   forward render, bands gathered to a full image
    render_train_step(...)      pixel loss + psum-reduced scene gradients
    make_mesh(n)                convenience 1-D ray-tile mesh
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.8: jax.shard_map (check_vma kwarg)
    from jax import shard_map as _shard_map

    def shard_map(f, **kw):
        kw.pop("check_rep", None)
        return _shard_map(f, check_vma=False, **kw)
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from .tracer import RenderConfig, render_image

__all__ = [
    "make_mesh",
    "render_image_sharded",
    "render_image_mega_sharded",
    "render_train_step",
]


def render_image_mega_sharded(
    chunk_data,
    zmin,
    ldata,
    loffs,
    lcnt,
    params,
    seed,
    *,
    S: int,
    width: int,
    height: int,
    tiles_x: int,
    tiles_y: int,
    grid_n: int,
    eps: float,
    perspective: bool,
    shadows: bool,
    mesh: Mesh,
    interpret: bool = False,
    other_data=None,
    other_count=None,
    occ_recs=None,
    n_occ: int = 0,
    extra_lights=None,
    tile_px: int = 16,
):
    """Megakernel forward with the screen-tile axis sharded over ``mesh``.

    The tile-binned inputs (chunk_data, zmin, other_count, other_data) are
    laid out tile-major (tile = ty * tiles_x + tx), so a horizontal band of
    tile rows is a contiguous slice — each device renders its own band with
    the SAME fused kernel as the single-chip path (VERDICT item 2: the
    sharded path previously ran the ~10-20x slower exact tracer).  Light CSR
    and global occluder tables replicate; only the per-band image leaves
    each device.  Deterministic configs (sample 0 is unjittered) reproduce
    the single-device image exactly; jittered AA samples use band-local
    tile hashes, which is a different (equally valid) AA sequence.
    """
    from .megakernel import render_image_mega
    TILE_PX = tile_px

    (axis,) = mesh.axis_names
    n = int(mesh.devices.size)
    if tiles_y % n != 0:
        raise ValueError(f"tiles_y {tiles_y} not divisible by mesh size {n}")
    rows_t = tiles_y // n
    nb_band = rows_t * tiles_x
    band_h = rows_t * TILE_PX
    params = jnp.asarray(params, jnp.float32)
    # device i renders tile band (n-1-i): stacking device outputs top-down
    band_ids = jnp.arange(n - 1, -1, -1, dtype=jnp.int32).reshape(n, 1)

    has_other = other_data is not None

    def shard_fn(band_id, chunk_b, zmin_b, ocnt_b, other_b, params_r):
        b = band_id[0, 0]
        row0 = (b * band_h).astype(jnp.float32)
        # shift the image-plane origin to this band's first scanline
        p = params_r.at[3:6].add(row0 * params_r[9:12])
        kw = {}
        if has_other:
            kw = dict(
                other_data=other_b, other_count=ocnt_b,
                occ_recs=occ_recs, n_occ=n_occ,
            )
        # distinct AA jitter stream per band (tile ids restart per band)
        img = render_image_mega(
            chunk_b, zmin_b, ldata, loffs, lcnt, p, seed + b * 9973,
            S=S, width=width, height=band_h,
            tiles_x=tiles_x, tiles_y=rows_t, grid_n=grid_n, eps=eps,
            perspective=perspective, shadows=shadows, interpret=interpret,
            extra_lights=extra_lights, tile_px=tile_px,
            **kw,
        )
        return img

    # reorder tile bands so device i holds band (n-1-i)
    rev = np.arange(n - 1, -1, -1)
    sel = (
        rev[:, None] * nb_band + np.arange(nb_band)[None]
    ).reshape(-1)
    chunk_r = jnp.asarray(chunk_data)[sel]
    zmin_r = jnp.asarray(zmin)[sel]
    ocnt_r = (
        jnp.asarray(other_count)[sel]
        if has_other else jnp.zeros((n * nb_band,), jnp.int32)
    )
    other_r = (
        jnp.asarray(other_data)[sel]
        if has_other else jnp.zeros((n * nb_band, 1, 1), jnp.float32)
    )

    fn = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis), P()),
        out_specs=P(axis),
        check_rep=False,
    )
    img = fn(band_ids, chunk_r, zmin_r, ocnt_r, other_r, params)
    # bands stack top-down; crop the top padding rows (tiles_y*16 - height)
    pad_top = tiles_y * TILE_PX - height
    return img[pad_top:] if pad_top else img


def make_mesh(n_devices: Optional[int] = None, axis: str = "tiles") -> Mesh:
    """1-D mesh over the first ``n_devices`` devices (default: all)."""
    devs = jax.devices()
    if n_devices is not None:
        if n_devices > len(devs):
            raise ValueError(
                f"requested {n_devices} devices, only {len(devs)} available"
            )
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def _band_lowleft(lowleft, iplaneup, row0):
    """Shift the image-plane origin to this band's first scanline."""
    return lowleft + row0.astype(lowleft.dtype) * iplaneup


def render_image_sharded(
    scene,
    frame: dict,
    cfg: RenderConfig,
    width: int,
    height: int,
    mesh: Mesh,
    seed: int = 0,
    chunk: int = 16384,
):
    """Render (H, W, 3) with scanline bands sharded across ``mesh``.

    ``height`` must divide evenly by the mesh size. For deterministic
    configs (no AA jitter / AO sampling) the result equals the
    single-device `render_image` output: each device traces rows
    [row0, row0+rows) of the bottom-up ray grid and the bands are laid out
    top-down (device 0 gets the top band), so the sharded output concatenates
    directly along axis 0.
    """
    (axis,) = mesh.axis_names
    n = mesh.devices.size
    if height % n != 0:
        raise ValueError(f"height {height} not divisible by mesh size {n}")
    rows = height // n
    perspective = bool(frame["perspective"])
    dtype = jnp.asarray(scene.sph_center).dtype
    cam = {
        k: jnp.asarray(frame[k], dtype)
        for k in ("origin", "lowleft", "iplaneright", "iplaneup", "view", "light_dir")
    }
    # device i renders band (n-1-i): top band first so out_specs P(axis)
    # concatenation yields the standard top-down image
    band_ids = jnp.arange(n - 1, -1, -1, dtype=jnp.int32)

    def shard_fn(band_id, origin, lowleft, ipr, ipu, view, light):
        row0 = band_id[0] * rows
        ll = _band_lowleft(lowleft, ipu, row0)
        # distinct RNG stream per band: render_image folds its PRNG key
        # with the band-local chunk index, which restarts at 0 per shard
        band_seed = seed + band_id[0] * jnp.int32(9973)
        return render_image(
            scene, origin, ll, ipr, ipu, view, light,
            cfg, width, rows, perspective, band_seed, chunk=chunk,
        )

    fn = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(axis), P(), P(), P(), P(), P(), P()),
        out_specs=P(axis),
        check_rep=False,
    )
    return fn(
        band_ids, cam["origin"], cam["lowleft"], cam["iplaneright"],
        cam["iplaneup"], cam["view"], cam["light_dir"],
    )


def render_train_step(
    scene,
    frame: dict,
    target,
    cfg: RenderConfig,
    width: int,
    height: int,
    mesh: Mesh,
    seed: int = 0,
    chunk: int = 16384,
):
    """One differentiable step: forward render -> MSE vs ``target`` ->
    gradients w.r.t. (sph_center, sph_radius, sph_color), mean-reduced over
    the mesh. ``target`` is (H, W, 3), sharded by scanline band like the
    forward output. Returns (loss, grads) replicated on every device."""
    (axis,) = mesh.axis_names
    n = mesh.devices.size
    if height % n != 0:
        raise ValueError(f"height {height} not divisible by mesh size {n}")
    rows = height // n
    perspective = bool(frame["perspective"])
    dtype = jnp.asarray(scene.sph_center).dtype
    cam = {
        k: jnp.asarray(frame[k], dtype)
        for k in ("origin", "lowleft", "iplaneright", "iplaneup", "view", "light_dir")
    }
    band_ids = jnp.arange(n - 1, -1, -1, dtype=jnp.int32)

    def loss_fn(params, band_id, tgt):
        import dataclasses

        c, r, col = params
        scene2 = dataclasses.replace(
            scene, sph_center=c, sph_radius=r, sph_color=col
        )
        row0 = band_id * rows
        ll = _band_lowleft(cam["lowleft"], cam["iplaneup"], row0)
        band_seed = seed + band_id * jnp.int32(9973)
        img = render_image(
            scene2, cam["origin"], ll, cam["iplaneright"], cam["iplaneup"],
            cam["view"], cam["light_dir"],
            cfg, width, rows, perspective, band_seed, chunk=chunk,
        )
        return jnp.mean((img - tgt) ** 2)

    def shard_fn(c, r, col, band_id, tgt):
        loss, grads = jax.value_and_grad(loss_fn)((c, r, col), band_id[0], tgt)
        loss = jax.lax.pmean(loss, axis)
        grads = jax.tree.map(lambda g: jax.lax.pmean(g, axis), grads)
        return loss, grads

    fn = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(axis), P(axis)),
        out_specs=(P(), (P(), P(), P())),
        check_rep=False,
    )
    return fn(
        jnp.asarray(scene.sph_center), jnp.asarray(scene.sph_radius),
        jnp.asarray(scene.sph_color), band_ids, jnp.asarray(target, dtype),
    )
