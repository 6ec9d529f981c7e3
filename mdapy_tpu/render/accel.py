"""Acceleration structures for the tracer — binning, not BVHs.

TPU rationale (SURVEY.md §7 hard-part 2): per-ray tree traversal is scalar
and divergent; TPUs want dense tile x candidate-chunk compute with shared
gathers.  Structures (one per primitive kind so the hot loop never pays for
formula dispatch), all built on one sorted-pair expansion primitive:

  * screen-tile bins  — primary rays: conservative per-primitive screen-space
    AABBs -> (tile, prim) pairs -> per-tile candidate lists.  Exact: a
    primitive visible through a pixel must project inside that pixel's
    conservative bounds.
  * light-grid bins   — shadow rays (directional light): the lateral position
    of a shadow ray is constant, so a 2D grid perpendicular to the light
    direction yields *terminal* candidate lists (no far-field traversal).

Every stage is jitted — on remote-compile TPU platforms eager dispatch costs
a compile round-trip per op.  Capacities are measured by a jitted count pass
and rounded up to power-of-two buckets so jit caches stay warm.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "KindBins", "build_screen_bins", "build_light_bins", "ScreenBins",
    "LightBins", "scene_live_counts",
]


def _round_pow2(x: int, lo: int = 256) -> int:
    return max(lo, 1 << max(0, int(x) - 1).bit_length())


def _round8(x: int) -> int:
    return max(8, -(-int(x) // 8) * 8)


# ---------------------------------------------------------------------------
# generic (bucket, item) pair expansion — fully jitted
# ---------------------------------------------------------------------------


def _seg_tile_cull(seg, item, tx, ty, tile_px):
    """True where the item's 2D segment footprint misses the tile.

    seg = (x0, y0, x1, y1, rpad, active) in pixel coords per item; inactive
    items are never culled.  A long thin cylinder's conservative AABB covers
    most of the screen, but its true footprint is a thin band — point-segment
    distance from the tile centre kills the false pairs."""
    sx0, sy0, sx1, sy1, rpad, active = seg
    cx = (tx.astype(sx0.dtype) + 0.5) * tile_px
    cy = (ty.astype(sx0.dtype) + 0.5) * tile_px
    ax, ay = sx0[item], sy0[item]
    bx, by = sx1[item] - ax, sy1[item] - ay
    wx, wy = cx - ax, cy - ay
    denom = jnp.maximum(bx * bx + by * by, 1e-12)
    t = jnp.clip((wx * bx + wy * by) / denom, 0.0, 1.0)
    dx = wx - t * bx
    dy = wy - t * by
    halfdiag = 0.70711 * tile_px
    lim = rpad[item] + halfdiag + 1.5
    miss = dx * dx + dy * dy > lim * lim
    return active[item] & miss


@functools.partial(jax.jit, static_argnames=("cap", "nbuckets", "K", "tile_px"))
def _expand_and_bucket(
    x0, y0, span_w, span_h, nx, cap: int, nbuckets: int, K: int,
    seg=None, tile_px: int = 0,
):
    """Spans -> sorted (bucket, item) pairs -> per-bucket lists, one pass."""
    sizes = (span_w * span_h).astype(jnp.int32)
    offsets = jnp.cumsum(sizes) - sizes
    total = offsets[-1] + sizes[-1]
    pair_idx = jnp.arange(cap, dtype=jnp.int32)
    # pair -> item via scatter + prefix sum: a cap-sized searchsorted is
    # ~20 gather passes on TPU (~seconds at 8M pairs / camera-motion rates)
    item = jnp.cumsum(
        jnp.zeros(cap, jnp.int32).at[
            jnp.minimum(offsets, cap - 1)
        ].add(1)
    ) - 1
    item = jnp.clip(item, 0, sizes.shape[0] - 1)
    local = pair_idx - offsets[item]
    w = jnp.maximum(span_w[item], 1)
    lx = local % w
    ly = local // w
    bucket = (y0[item] + ly) * nx + (x0[item] + lx)
    valid = pair_idx < total
    if seg is not None:
        valid = valid & ~_seg_tile_cull(
            seg, item, x0[item] + lx, y0[item] + ly, tile_px
        )
    bucket = jnp.where(valid, bucket, nbuckets).astype(jnp.int32)
    # 2-operand sort carries the payload through the sort network — the
    # argsort + two cap-sized payload gathers it replaces cost ~2x at the
    # 1M-primitive scale (camera-motion frames rebuild this every frame)
    item_tag = jnp.where(valid, item, -1)
    bucket_sorted, item_sorted = jax.lax.sort(
        (bucket, item_tag), num_keys=1
    )
    bucket_ids = jnp.arange(nbuckets, dtype=jnp.int32)
    start = jnp.searchsorted(bucket_sorted, bucket_ids).astype(jnp.int32)
    end = jnp.searchsorted(bucket_sorted, bucket_ids, side="right").astype(jnp.int32)
    count = end - start
    slot = jnp.arange(K, dtype=jnp.int32)
    idx = start[:, None] + slot[None, :]
    ok = slot[None, :] < count[:, None]
    idx = jnp.where(ok, idx, 0)
    cand = jnp.where(ok, item_sorted[idx], -1)
    return cand, count


@jax.jit
def _pair_stats(span_w, span_h):
    return jnp.sum((span_w * span_h).astype(jnp.int32))


@functools.partial(jax.jit, static_argnames=("cap", "nbuckets", "tile_px"))
def _count_only(
    x0, y0, span_w, span_h, nx, cap: int, nbuckets: int,
    seg=None, tile_px: int = 0,
):
    """Max per-bucket count for capacity sizing (shares code path shape)."""
    sizes = (span_w * span_h).astype(jnp.int32)
    offsets = jnp.cumsum(sizes) - sizes
    total = offsets[-1] + sizes[-1]
    pair_idx = jnp.arange(cap, dtype=jnp.int32)
    item = jnp.cumsum(
        jnp.zeros(cap, jnp.int32).at[
            jnp.minimum(offsets, cap - 1)
        ].add(1)
    ) - 1
    item = jnp.clip(item, 0, sizes.shape[0] - 1)
    local = pair_idx - offsets[item]
    w = jnp.maximum(span_w[item], 1)
    lx = local % w
    ly = local // w
    bucket = (y0[item] + ly) * nx + (x0[item] + lx)
    valid = pair_idx < total
    if seg is not None:
        valid = valid & ~_seg_tile_cull(
            seg, item, x0[item] + lx, y0[item] + ly, tile_px
        )
    bucket = jnp.where(valid, bucket, nbuckets).astype(jnp.int32)
    counts = jnp.zeros(nbuckets + 1, jnp.int32).at[bucket].add(1)
    return jnp.max(counts[:nbuckets])


class KindBins(NamedTuple):
    cand: jnp.ndarray   # (nbuckets, K) item ids within the kind, -1 padded
    count: jnp.ndarray  # (nbuckets,)


class ScreenBins(NamedTuple):
    sph_chunks: Optional[jnp.ndarray]  # (nb, nchunks, CH) depth-sorted ids
    sph_zmin: Optional[jnp.ndarray]    # (nb, nchunks) chunk min depths
    cyl: Optional[KindBins]
    ring: Optional[KindBins]
    tiles_x: int
    tiles_y: int
    tile_px: int


class LightKind(NamedTuple):
    cand: jnp.ndarray    # (ncells, K) ids sorted by far-depth key, -1 padded
    keys: jnp.ndarray    # (ncells, K) sort key = c.L + r (BIG-padded)
    count: jnp.ndarray   # (ncells,)


class LightBins(NamedTuple):
    sph: Optional[LightKind]
    cyl: Optional[LightKind]
    ring: Optional[LightKind]
    L: jnp.ndarray
    e1: jnp.ndarray
    e2: jnp.ndarray
    org: jnp.ndarray
    inv_cell: jnp.ndarray
    grid: int


# ---------------------------------------------------------------------------
# screen-space spans
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("width", "height", "tile_px", "perspective"))
def _screen_spans(
    centers, radii, origin, right, up2, view, left, bottom, psx, psy,
    width: int, height: int, tile_px: int, perspective: bool,
):
    rel = centers - origin
    xc = rel @ right
    yc = rel @ up2
    zc = rel @ view
    r = radii
    if perspective:
        def extent(lat, dep):
            unbounded = dep <= r
            d2 = lat * lat + dep * dep
            root = jnp.sqrt(jnp.maximum(d2 - r * r, 1e-20))
            denom = dep * dep - r * r
            safe = jnp.where(unbounded, 1.0, denom)
            u1 = (lat * dep - r * root) / safe
            u2 = (lat * dep + r * root) / safe
            return u1, u2, unbounded

        ux0, ux1, unb_x = extent(xc, zc)
        uy0, uy1, unb_y = extent(yc, zc)
        unb = unb_x | unb_y
        px0 = jnp.where(unb, 0.0, (ux0 - left) / psx)
        px1 = jnp.where(unb, float(width), (ux1 - left) / psx)
        py0 = jnp.where(unb, 0.0, (uy0 - bottom) / psy)
        py1 = jnp.where(unb, float(height), (uy1 - bottom) / psy)
        behind = zc <= -r
    else:
        px0 = (xc - r - left) / psx
        px1 = (xc + r - left) / psx
        py0 = (yc - r - bottom) / psy
        py1 = (yc + r - bottom) / psy
        behind = jnp.zeros(centers.shape[0], dtype=bool)
    pad = 1.5  # 1-based sampling + 0.5px AA jitter
    ntx = (width - 1) // tile_px
    nty = (height - 1) // tile_px
    tx0 = jnp.clip(jnp.floor((px0 - pad) / tile_px), 0, ntx).astype(jnp.int32)
    tx1 = jnp.clip(jnp.floor((px1 + pad) / tile_px), 0, ntx).astype(jnp.int32)
    ty0 = jnp.clip(jnp.floor((py0 - pad) / tile_px), 0, nty).astype(jnp.int32)
    ty1 = jnp.clip(jnp.floor((py1 + pad) / tile_px), 0, nty).astype(jnp.int32)
    live = (radii > 0) & ~behind
    offscreen = (px1 < -pad) | (px0 > width + pad) | (py1 < -pad) | (py0 > height + pad)
    live = live & ~offscreen
    span_w = jnp.where(live, tx1 - tx0 + 1, 0)
    span_h = jnp.where(live, ty1 - ty0 + 1, 0)
    return tx0, ty0, span_w, span_h


def _build_kind(x0, y0, sw, sh, nx, nbuckets, seg=None, tile_px: int = 0,
                min_cap: int = 256, min_k: int = 8, pow2_k: bool = False):
    """Synchronous build: measure capacities (2 host fetches), then expand.

    Returns (KindBins, (cap, K)) so callers can cache the capacities.
    ``pow2_k`` rounds K up to a power of two — capacity-cached animation
    flows use it so K (a static kernel shape) stabilizes after one frame
    instead of re-jitting on every small candidate-count wiggle."""
    total = int(_pair_stats(sw, sh))
    cap = max(_round_pow2(total), min_cap)
    kmax = int(_count_only(x0, y0, sw, sh, nx, cap, nbuckets, seg, tile_px))
    K = max(_round_pow2(kmax, lo=8) if pow2_k else _round8(kmax), min_k)
    cand, count = _expand_and_bucket(
        x0, y0, sw, sh, nx, cap, nbuckets, K, seg, tile_px
    )
    return KindBins(cand, count), (cap, K)


def _build_kinds_cached(jobs, cap_cache):
    """Build several kinds with cached capacities + ONE deferred validation.

    ``jobs``: list of (name, ckey, args) with args = (x0, y0, sw, sh, nx,
    nbuckets, seg, tile_px).  Kinds whose ckey hits ``cap_cache`` build
    immediately with the cached (cap, K) and queue their true
    (total_pairs, max_count) device scalars; all queued scalars sync in one
    batched fetch at the end (each separate fetch costs a full link
    round-trip) and violated kinds rebuild synchronously with grown
    capacities (high-water cached, like the neighbor engine's capacity
    contract).  Cache misses take the 2-fetch sync path and seed the cache."""
    out = {}
    pend = []
    for name, ckey, args in jobs:
        x0, y0, sw, sh, nx, nbuckets, seg, tile_px = args
        hit = cap_cache is not None and ckey in cap_cache
        if hit:
            cap, K = cap_cache[ckey]
            cand, count = _expand_and_bucket(
                x0, y0, sw, sh, nx, cap, nbuckets, K, seg, tile_px
            )
            out[name] = KindBins(cand, count)
            # validation scalars come from the build itself: count is
            # exact whenever total <= cap (checked first), so the separate
            # _count_only pass (a full expansion-sized scatter) is
            # redundant on the cached path
            pend.append((
                name, ckey, args, cap, K,
                _pair_stats(sw, sh),
                jnp.max(count),
            ))
        else:
            # seed with the TIGHT capacity (pow2 K inflates the megakernel's
            # static chunk count ~15% for steady-state frames); growth
            # violations below bump to pow2 so orbit shapes stabilize after
            # at most a couple of rebuilds
            kb, capk = _build_kind(*args)
            out[name] = kb
            if cap_cache is not None:
                cap_cache[ckey] = capk
    if pend:
        vals = np.asarray(jnp.stack(
            [jnp.stack([jnp.asarray(t, jnp.int32), jnp.asarray(k, jnp.int32)])
             for (_, _, _, _, _, t, k) in pend]
        ))
        for (name, ckey, args, cap, K, _, _), (tot, km) in zip(pend, vals):
            tot, km = int(tot), int(km)
            if tot > cap or km > K:
                kb, capk = _build_kind(
                    *args, min_cap=max(cap, _round_pow2(tot)),
                    min_k=max(K, _round_pow2(km, lo=8) if tot <= cap else 8),
                    pow2_k=True,
                )
                out[name] = kb
                cap_cache[ckey] = capk
            else:
                # remember the measured requirement's high water
                cap_cache[ckey] = (cap, K)
    return out


@functools.partial(jax.jit, static_argnames=("perspective",))
def _cyl_screen_seg(
    base, axis, radii, origin, right, up2, view, left, bottom, psx, psy,
    perspective: bool,
):
    """Projected 2D segment (pixel coords) + radius pad per cylinder.

    Endpoints behind the camera mark the segment inactive (no culling)."""
    e0 = base - origin
    e1 = base + axis - origin
    def proj(rel):
        xc = rel @ right
        yc = rel @ up2
        zc = rel @ view
        if perspective:
            zs = jnp.maximum(zc, 1e-6)
            return (xc / zs - left) / psx, (yc / zs - bottom) / psy, zc
        return (xc - left) / psx, (yc - bottom) / psy, jnp.ones_like(zc)
    x0p, y0p, z0 = proj(e0)
    x1p, y1p, z1 = proj(e1)
    ps = jnp.minimum(psx, psy)
    if perspective:
        zmin = jnp.maximum(jnp.minimum(z0, z1), 1e-6)
        # conservative silhouette half-width: r/sqrt(z^2-r^2) (finite-
        # distance silhouette; paraxial r/z underestimates close up) times
        # sec^2(theta_max) for off-axis growth, theta_max at the frame
        # corner (|left|, |bottom| are the corner tangents)
        sec2 = 1.0 + left * left + bottom * bottom
        safe = jnp.sqrt(jnp.maximum(zmin * zmin - radii * radii, 1e-12))
        rpad = radii * sec2 / (safe * ps)
        # a cylinder whose bounding tube reaches the camera plane cannot be
        # culled reliably — mark inactive (falls back to the full rect)
        active = (z0 > 1e-6) & (z1 > 1e-6) & (radii > 0) & (zmin > radii * 1.05)
    else:
        rpad = radii / ps
        active = radii > 0
    return x0p, y0p, x1p, y1p, rpad, active


def scene_live_counts(scene) -> dict:
    """{kind: live primitive count} in ONE device reduce + one host fetch.

    Per-kind ``int(np.sum(np.asarray(radius) > 0))`` calls each pull a full
    device array across the link (4 MB at 1M atoms — ~0.2 s on a tunneled
    TPU) per accel rebuild; camera-motion workloads rebuild every frame, so
    the counts are fetched once here and cached per scene by the caller."""
    ns = jnp.stack([
        jnp.sum(scene.sph_radius > 0),
        jnp.sum(scene.cyl_radius > 0),
        jnp.sum(scene.ring_rout > 0),
    ])
    ns = np.asarray(ns)
    return {"sph": int(ns[0]), "cyl": int(ns[1]), "ring": int(ns[2])}


def _prim_bounds(scene, kind: str, nlive: Optional[dict] = None):
    if kind == "sph":
        n = (nlive["sph"] if nlive is not None
             else int(np.sum(np.asarray(scene.sph_radius) > 0)))
        return scene.sph_center, scene.sph_radius, n
    if kind == "cyl":
        n = (nlive["cyl"] if nlive is not None
             else int(np.sum(np.asarray(scene.cyl_radius) > 0)))
        cmid = scene.cyl_base + 0.5 * scene.cyl_axis
        clen = jnp.linalg.norm(scene.cyl_axis, axis=-1)
        cr = jnp.where(scene.cyl_radius > 0, 0.5 * clen + scene.cyl_radius, -1.0)
        return cmid, cr, n
    n = (nlive["ring"] if nlive is not None
         else int(np.sum(np.asarray(scene.ring_rout) > 0)))
    return scene.ring_center, scene.ring_rout, n


@functools.partial(jax.jit, static_argnames=("chunk",))
def _depth_sort_bins(cand, count, centers, radii, origin, view, chunk: int):
    """Sort each tile's candidate row front-to-back by conservative min depth
    (zc - r) and compute per-chunk minimum depths for early termination."""
    nb, K = cand.shape
    idx = jnp.maximum(cand, 0)
    depth = (centers @ view) - radii - (origin @ view)
    big = jnp.array(BIG_DEPTH, centers.dtype)
    d = jnp.where(cand >= 0, depth[idx], big)
    # payload sort instead of argsort + two take_along gathers
    d_sorted, cand_sorted = jax.lax.sort((d, cand), dimension=1, num_keys=1)
    nchunks = -(-K // chunk)
    pad = nchunks * chunk - K
    d_pad = jnp.pad(d_sorted, ((0, 0), (0, pad)), constant_values=BIG_DEPTH)
    c_pad = jnp.pad(cand_sorted, ((0, 0), (0, pad)), constant_values=-1)
    zmin = d_pad.reshape(nb, nchunks, chunk)[:, :, 0]
    return c_pad.reshape(nb, nchunks, chunk), zmin


BIG_DEPTH = 1e17


def build_screen_bins(scene, frame, width: int, height: int, tile_px: int = 16,
                      nlive: Optional[dict] = None,
                      cap_cache: Optional[dict] = None) -> ScreenBins:
    dtype = scene.sph_center.dtype
    ipr = np.asarray(frame["iplaneright"], dtype)
    ipu = np.asarray(frame["iplaneup"], dtype)
    psx = float(np.linalg.norm(ipr))
    psy = float(np.linalg.norm(ipu))
    right = jnp.asarray(ipr / psx)
    up2 = jnp.asarray(ipu / psy)
    origin = jnp.asarray(np.asarray(frame["origin"], dtype))
    view = jnp.asarray(np.asarray(frame["view"], dtype))
    left = -0.5 * psx * width
    bottom = -0.5 * psy * height
    tiles_x = -(-width // tile_px)
    tiles_y = -(-height // tile_px)
    nb = tiles_x * tiles_y
    jobs = []
    out = {}
    for kind in ("sph", "cyl", "ring"):
        centers, radii, nl = _prim_bounds(scene, kind, nlive)
        if nl == 0:
            out[kind] = None
            continue
        tx0, ty0, sw, sh = _screen_spans(
            centers, radii, origin, right, up2, view,
            jnp.asarray(left, dtype), jnp.asarray(bottom, dtype),
            jnp.asarray(psx, dtype), jnp.asarray(psy, dtype),
            width, height, tile_px, bool(frame["perspective"]),
        )
        seg = None
        if kind == "cyl":
            # a long edge's bounding sphere blankets the screen; cull the
            # rect pairs down to the thin projected band
            seg = _cyl_screen_seg(
                scene.cyl_base, scene.cyl_axis, scene.cyl_radius,
                origin, right, up2, view,
                jnp.asarray(left, dtype), jnp.asarray(bottom, dtype),
                jnp.asarray(psx, dtype), jnp.asarray(psy, dtype),
                bool(frame["perspective"]),
            )
        jobs.append((
            kind, ("screen", kind, width, height, tile_px),
            (tx0, ty0, sw, sh, tiles_x, nb, seg, tile_px),
        ))
    out.update(_build_kinds_cached(jobs, cap_cache))
    sph_chunks = sph_zmin = None
    if out["sph"] is not None:
        cand = out["sph"].cand
        # the Pallas closest-hit DMAs (8, CH) slices — CH must be a full
        # 128-lane tile, so pad small candidate rows up to 128
        K = cand.shape[1]
        k128 = max(128, -(-K // 128) * 128)
        if k128 != K:
            cand = jnp.pad(cand, ((0, 0), (0, k128 - K)), constant_values=-1)
        # wider chunks cut the per-chunk fixed costs (DMA wait + loop
        # control + scalar-core sync) that bound the megakernel trace;
        # early-exit granularity coarsens, but rejected intersections are
        # cheap VPU work
        import os as _os

        chunk = min(int(_os.environ.get("MDAPY_TPU_CHUNK_W", "128")),
                    cand.shape[1])
        sph_chunks, sph_zmin = _depth_sort_bins(
            cand, out["sph"].count,
            scene.sph_center, scene.sph_radius, origin, view, chunk,
        )
    return ScreenBins(sph_chunks, sph_zmin, out["cyl"], out["ring"], tiles_x, tiles_y, tile_px)


# ---------------------------------------------------------------------------
# light-space binning
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("grid",))
def _light_spans(centers, radii, e1, e2, umin, vmin, inv_cell, grid: int):
    u = centers @ e1
    v = centers @ e2
    live = radii > 0
    x0 = jnp.clip(jnp.floor((u - radii - umin) * inv_cell), 0, grid - 1).astype(jnp.int32)
    x1 = jnp.clip(jnp.floor((u + radii - umin) * inv_cell), 0, grid - 1).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor((v - radii - vmin) * inv_cell), 0, grid - 1).astype(jnp.int32)
    y1 = jnp.clip(jnp.floor((v + radii - vmin) * inv_cell), 0, grid - 1).astype(jnp.int32)
    sw = jnp.where(live, x1 - x0 + 1, 0)
    sh = jnp.where(live, y1 - y0 + 1, 0)
    return x0, y0, sw, sh


@jax.jit
def _light_frame(all_centers, all_radii, L):
    a = jnp.where(
        jnp.abs(L[0]) < 0.9,
        jnp.array([1.0, 0.0, 0.0], L.dtype),
        jnp.array([0.0, 1.0, 0.0], L.dtype),
    )
    e1 = jnp.cross(L, a)
    e1 = e1 / jnp.linalg.norm(e1)
    e2 = jnp.cross(L, e1)
    u = all_centers @ e1
    v = all_centers @ e2
    live = all_radii > 0
    big = jnp.array(1e30, all_centers.dtype)
    umin = jnp.min(jnp.where(live, u - all_radii, big))
    vmin = jnp.min(jnp.where(live, v - all_radii, big))
    umax = jnp.max(jnp.where(live, u + all_radii, -big))
    vmax = jnp.max(jnp.where(live, v + all_radii, -big))
    extent = jnp.maximum(jnp.maximum(umax - umin, vmax - vmin), 1e-6)
    return e1, e2, umin, vmin, extent


def build_light_bins(scene, light_dir, grid: int = 128,
                     nlive: Optional[dict] = None,
                     cap_cache: Optional[dict] = None) -> LightBins:
    dtype = scene.sph_center.dtype
    L = jnp.asarray(np.asarray(light_dir, dtype))
    # frame over all kinds' bounds
    cmid = scene.cyl_base + 0.5 * scene.cyl_axis
    clen = jnp.linalg.norm(scene.cyl_axis, axis=-1)
    cr = jnp.where(scene.cyl_radius > 0, 0.5 * clen + scene.cyl_radius, -1.0)
    allc = jnp.concatenate([scene.sph_center, cmid, scene.ring_center], axis=0)
    allr = jnp.concatenate([scene.sph_radius, cr, scene.ring_rout], axis=0)
    e1, e2, umin, vmin, extent = _light_frame(allc, allr, L)
    inv_cell = grid / extent
    jobs = []
    prims = {}
    out = {}
    for kind in ("sph", "cyl", "ring"):
        centers, radii, nl = _prim_bounds(scene, kind, nlive)
        if nl == 0:
            out[kind] = None
            continue
        prims[kind] = (centers, radii)
        x0, y0, sw, sh = _light_spans(centers, radii, e1, e2, umin, vmin, inv_cell, grid)
        # capacities keyed per (kind, grid) but NOT per light direction:
        # the high water across directions serves them all
        jobs.append((
            kind, ("light", kind, grid),
            (x0, y0, sw, sh, grid, grid * grid, None, 0),
        ))
    for kind, kb in _build_kinds_cached(jobs, cap_cache).items():
        centers, radii = prims[kind]
        cand, keys = _sort_light_cells(kb.cand, centers, radii, L)
        out[kind] = LightKind(cand, keys, kb.count)
    return LightBins(
        out["sph"], out["cyl"], out["ring"], L, e1, e2,
        jnp.stack([umin, vmin]), inv_cell, grid,
    )


@functools.partial(jax.jit, static_argnames=("cap", "shw"))
def _light_csr_kernel_data(cand, centers, radii, alphas, e1, e2, org, L,
                           cap: int, shw: int = 128):
    """CSR light-grid records for the Pallas shadow kernel.

    Per cell, candidates sorted DESCENDING by far-depth key (c.L + r) — the
    light-side-first scan order — then flattened with each cell's segment
    padded to a multiple of ``shw`` (the kernel's shadow-window width, so
    window DMAs stay aligned and never cross into the next cell's records).
    Records are rows [cu, cv, ck, r, key, alpha] where (cu, cv) are lateral
    light-space coords and ck = c.L, so the in-kernel occlusion test is 2D
    lateral + depth; alpha feeds the transparency-peeling sweep's
    multiplicative (1 - alpha) shadow attenuation."""
    ncells, K = cand.shape
    idx = jnp.maximum(cand, 0)
    live = cand >= 0
    keyfull = centers @ L + radii
    key = jnp.where(live, keyfull[idx], -BIG_DEPTH)
    # per-cell max far key: the kernel's scalar pre-gate skips whole cells
    # whose deepest-reaching record cannot block any lit ray
    ckmax = jnp.max(key, axis=1)
    _, cand_s = jax.lax.sort((-key, cand), dimension=1, num_keys=1)
    count = jnp.sum(live, axis=1).astype(jnp.int32)
    padded = ((count + (shw - 1)) // shw) * shw
    offs = jnp.cumsum(padded) - padded
    pair = jnp.arange(cap, dtype=jnp.int32)
    cell = jnp.cumsum(
        jnp.zeros(cap, jnp.int32).at[jnp.minimum(offs, cap - 1)].add(1)
    ) - 1
    cell = jnp.clip(cell, 0, ncells - 1)
    local = pair - offs[cell]
    valid = (local < count[cell]) & (local < K)
    ids = jnp.where(valid, cand_s[cell, jnp.minimum(local, K - 1)], -1)
    gi = jnp.maximum(ids, 0)
    ok = ids >= 0
    cu = jnp.where(ok, centers[gi] @ e1 - org[0], 0.0)
    cv = jnp.where(ok, centers[gi] @ e2 - org[1], 0.0)
    ck = jnp.where(ok, centers[gi] @ L, 0.0)
    r = jnp.where(ok, radii[gi], -1.0)
    kk = jnp.where(ok, ck + r, -BIG_DEPTH)
    al = jnp.where(ok, alphas[gi], 0.0)
    zero = jnp.zeros_like(cu)
    ldata = jnp.stack([cu, cv, ck, r, kk, al, zero, zero])
    return ldata, offs.astype(jnp.int32), count, ckmax


def build_light_records(lb: "LightBins", scene, cap_cache: Optional[dict] = None):
    """Dense CSR record tensor for sphere shadow tests in Pallas.

    Returns (ldata (8, cap) f32, offs (ncells,) i32, count (ncells,) i32)
    or None when the scene has no spheres.  ``cap_cache`` keeps the static
    record capacity at its high water so camera-motion frames reuse the
    jitted kernel instead of re-compiling on every capacity wiggle."""
    if lb.sph is None:
        return None
    from .megakernel import SHW as _shw

    cand = lb.sph.cand
    count = lb.sph.count
    padded_total = int(jnp.sum(((count + _shw - 1) // _shw) * _shw))
    cap = _round_pow2(padded_total, lo=_shw)
    if cap_cache is not None:
        key = ("lrec", lb.grid, _shw)
        cap = max(cap, cap_cache.get(key, 0))
        cap_cache[key] = cap
    return _light_csr_kernel_data(
        cand, scene.sph_center, scene.sph_radius, scene.sph_color[:, 3],
        lb.e1, lb.e2, lb.org, lb.L, cap, shw=_shw,
    )


@jax.jit
def _other_records(scene):
    """16-row records for every cylinder and ring in the scene.

    Rows: 0-2 position (cyl base / ring center), 3 radius (cyl rad /
    ring rout), 4-7 rgba, 8-10 unit axis (cyl axis direction / ring plane
    normal), 11 type (1 cyl, 2 ring), 12 cyl length, 13-15 zero.  Dead
    primitives carry radius -1."""
    cb, ca = scene.cyl_base, scene.cyl_axis
    alen = jnp.linalg.norm(ca, axis=-1)
    ahat = ca / jnp.maximum(alen, 1e-30)[:, None]
    crad = jnp.where(scene.cyl_radius > 0, scene.cyl_radius, -1.0)
    nc = cb.shape[0]
    crec = jnp.concatenate([
        cb, crad[:, None], scene.cyl_color, ahat,
        jnp.full((nc, 1), 1.0, cb.dtype), alen[:, None],
        jnp.zeros((nc, 3), cb.dtype),
    ], axis=1)                                            # (nc, 16)
    rc, rn = scene.ring_center, scene.ring_normal
    rrad = jnp.where(scene.ring_rout > 0, scene.ring_rout, -1.0)
    nr = rc.shape[0]
    rrec = jnp.concatenate([
        rc, rrad[:, None], scene.ring_color, rn,
        jnp.full((nr, 1), 2.0, rc.dtype), jnp.zeros((nr, 1), rc.dtype),
        jnp.zeros((nr, 3), rc.dtype),
    ], axis=1)                                            # (nr, 16)
    return jnp.concatenate([crec, rrec], axis=0).astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("KO",))
def _gather_other(cyl_cand, ring_cand, allrec, ncyl: int, KO: int):
    """Per-tile combined cyl+ring candidate records (nb, 16, KO) + counts."""
    ids = jnp.concatenate(
        [cyl_cand, jnp.where(ring_cand >= 0, ring_cand + ncyl, -1)], axis=1
    )
    # compact the -1 padding of the two lists together (stable order)
    order = jnp.argsort(jnp.where(ids >= 0, 0, 1), axis=1, stable=True)
    ids = jnp.take_along_axis(ids, order, axis=1)[:, :KO]
    pad = KO - ids.shape[1]
    if pad > 0:
        ids = jnp.pad(ids, ((0, 0), (0, pad)), constant_values=-1)
    live = ids >= 0
    rec = allrec[jnp.maximum(ids, 0)]                     # (nb, KO, 16)
    rec = jnp.where(live[..., None], rec, 0.0)
    rec = rec.at[..., 3].set(jnp.where(live, rec[..., 3], -1.0))
    count = jnp.sum(live, axis=1).astype(jnp.int32)
    return jnp.swapaxes(rec, 1, 2), count                 # (nb, 16, KO)


def gather_other_records(bins: "ScreenBins", scene, lb: "LightBins" = None):
    """Megakernel inputs for the non-sphere primitives.

    Returns (other_data (nb,16,KO) f32, other_count (nb,) i32,
    occ_recs (16, KG) f32, n_occ int) or None when the scene has neither
    cylinders nor rings.  ``occ_recs`` is the dense global occluder list for
    exact cyl/ring shadow tests (small scenes: box edges + sparse bonds);
    its rgba rows are repurposed as light-space cull data:
    row 4 = lateral u, 5 = lateral v, 6 = lateral bound radius,
    7 = far-depth key (c.L + bound)."""
    if bins.cyl is None and bins.ring is None:
        return None
    nb = bins.tiles_x * bins.tiles_y
    neg = -jnp.ones((nb, 8), jnp.int32)
    cyl_cand = bins.cyl.cand if bins.cyl is not None else neg
    ring_cand = bins.ring.cand if bins.ring is not None else neg
    ncyl = int(scene.cyl_base.shape[0])
    allrec = _other_records(scene)
    kmax = int(jnp.max(
        jnp.sum(cyl_cand >= 0, axis=1) + jnp.sum(ring_cand >= 0, axis=1)
    ))
    # the megakernel DMAs (16, KO) slices — the minor dim must be a full
    # 128-lane tile
    KO = max(128, -(-kmax // 128) * 128)
    other_data, other_count = _gather_other(cyl_cand, ring_cand, allrec, ncyl, KO)

    rec = np.asarray(allrec)
    live = rec[:, 3] > 0
    n_occ = int(live.sum())
    rec = rec[np.argsort(~live, kind="stable")]
    kg = max(128, -(-max(n_occ, 1) // 128) * 128)
    if rec.shape[0] < kg:
        rec = np.pad(rec, ((0, kg - rec.shape[0]), (0, 0)))
    rec = rec[:kg].copy()
    # rows 4-7 get repurposed as light-space cull data below; the shadow
    # kernel's transparency filter still needs the primitive alpha — stash
    # it in the spare row 15
    rec[:, 15] = rec[:, 7]
    if lb is not None and n_occ:
        e1 = np.asarray(lb.e1, np.float32)
        e2 = np.asarray(lb.e2, np.float32)
        L = np.asarray(lb.L, np.float32)
        org = np.asarray(lb.org, np.float32)
        p0 = rec[:, 0:3]
        is_cyl = rec[:, 11:12] == 1.0
        # lateral (light-space) footprint = projected 2D SEGMENT + radius:
        # exact for cylinders (a bounding sphere of a long edge covers the
        # whole grid); rings use a degenerate segment at the centre
        p1 = p0 + np.where(is_cyl, rec[:, 8:11] * rec[:, 12:13], 0.0)
        rec[:, 4] = p0 @ e1 - org[0]
        rec[:, 5] = p0 @ e2 - org[1]
        rec[:, 13] = p1 @ e1 - org[0]
        rec[:, 14] = p1 @ e2 - org[1]
        rec[:, 6] = rec[:, 3]                     # lateral pad = radius
        rec[:, 7] = np.maximum(p0 @ L, p1 @ L) + rec[:, 3]
    return other_data, other_count, jnp.asarray(rec.T), n_occ


@jax.jit
def _sort_light_cells(cand, centers, radii, L):
    """Sort each cell's candidates ascending by far-depth key c.L + r.

    A shadow ray starting at depth tau only needs the suffix with key > tau;
    lit (light-side) origins get a near-empty suffix."""
    idx = jnp.maximum(cand, 0)
    key = (centers @ L) + radii
    k = jnp.where(cand >= 0, key[idx], BIG_DEPTH)
    k_s, cand_s = jax.lax.sort((k, cand), dimension=1, num_keys=1)
    return cand_s, k_s
