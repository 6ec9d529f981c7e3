"""Tile-binned tracer — the TPU performance path.

Primary rays: each tile tests only its screen-bin candidates, *front-to-back*
in depth-sorted chunks with an early-termination while_loop — the tile-batch
analog of Tachyon's grid DDA walking cells near-to-far (grid.c:479).  A chunk
only runs when its conservative min depth could still beat some ray's best
hit, so interior tiles stop after one or two chunks regardless of how many
atoms hide behind the surface.  Candidate *data* is gathered once per chunk
(shared loads) and the intersection runs as dense (rays x chunk) VPU
broadcasts.  All AA samples trace together so the early-exit is shared.

Shadow rays use terminal light-grid lists (lateral coords constant along a
directional shadow ray) and are skipped entirely for tiles with no lit ray
(lax.cond) — which under the reference's headlight geometry is most of them.

Shading is Tachyon's model, identical to tracer.py; the two paths are
bit-compared in tests.  AO uses the brute path until the 3D-grid pass lands.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .accel import LightBins, ScreenBins, build_light_bins, build_screen_bins
from .scene import Scene
from .tracer import BIG, MINCONTRIB, RenderConfig

__all__ = ["render_image_tiled", "build_screen_bins", "build_light_bins"]


# ---------------------------------------------------------------------------
# dense candidate intersections with pre-gathered (shared) primitive data
# ---------------------------------------------------------------------------


def _t_spheres(o, d, c, r, eps):
    """o,d (R,3); c (K,3), r (K,) shared -> t (R,K)."""
    oc = o[:, None, :] - c[None, :, :]
    b = jnp.einsum("rkx,rx->rk", oc, d)
    cc = jnp.sum(oc * oc, axis=-1) - (r * r)[None, :]
    disc = b * b - cc
    ok = (disc >= 0) & (r > 0)[None, :]
    sq = jnp.sqrt(jnp.where(ok, disc, 0.0))
    t1 = -b - sq
    t2 = -b + sq
    t = jnp.where(t1 > eps, t1, jnp.where(t2 > eps, t2, BIG))
    return jnp.where(ok, t, BIG)


def _t_cyls(o, d, base, axis, rad, eps):
    alen = jnp.linalg.norm(axis, axis=-1)
    ahat = axis / jnp.maximum(alen, 1e-30)[:, None]
    oc = o[:, None, :] - base[None, :, :]
    dda = jnp.einsum("rx,kx->rk", d, ahat)
    oca = jnp.einsum("rkx,kx->rk", oc, ahat)
    # stable perpendicular-vector form (see tracer._cyl_t)
    dp = d[:, None, :] - dda[..., None] * ahat[None, :, :]
    op = oc - oca[..., None] * ahat[None, :, :]
    a2 = jnp.sum(dp * dp, axis=-1)
    b = jnp.sum(op * dp, axis=-1)
    c = jnp.sum(op * op, axis=-1) - (rad * rad)[None, :]
    disc = b * b - a2 * c
    live = (rad > 0)[None, :] & (disc >= 0) & (a2 > 1e-12)
    sq = jnp.sqrt(jnp.where(live, disc, 0.0))
    inv_a2 = 1.0 / jnp.where(a2 > 1e-12, a2, 1.0)
    t1 = (-b - sq) * inv_a2
    t2 = (-b + sq) * inv_a2
    s1 = oca + t1 * dda
    s2 = oca + t2 * dda
    ok1 = live & (t1 > eps) & (s1 >= 0) & (s1 <= alen[None, :])
    ok2 = live & (t2 > eps) & (s2 >= 0) & (s2 <= alen[None, :])
    return jnp.where(ok1, t1, jnp.where(ok2, t2, BIG))


def _t_rings(o, d, c, n, rout, eps):
    dn = jnp.einsum("rx,kx->rk", d, n)
    num = jnp.einsum("kx,kx->k", c, n)[None, :] - jnp.einsum("rx,kx->rk", o, n)
    t = num / jnp.where(jnp.abs(dn) > 1e-12, dn, 1.0)
    hit = o[:, None, :] + t[..., None] * d[:, None, :] - c[None, :, :]
    rho2 = jnp.sum(hit * hit, axis=-1)
    ok = (rout > 0)[None, :] & (jnp.abs(dn) > 1e-12) & (t > eps) & (rho2 <= (rout * rout)[None, :])
    return jnp.where(ok, t, BIG)


def _ray_box_texit(o, d, lo, hi):
    """Ray-AABB exit parameter; -BIG where the ray misses the box entirely."""
    inv = 1.0 / jnp.where(jnp.abs(d) > 1e-30, d, 1e-30)
    t0 = (lo[None, :] - o) * inv
    t1 = (hi[None, :] - o) * inv
    tnear = jnp.max(jnp.minimum(t0, t1), axis=1)
    tfar = jnp.min(jnp.maximum(t0, t1), axis=1)
    hit = (tfar >= jnp.maximum(tnear, 0.0))
    return jnp.where(hit, tfar, -BIG)


def _closest_hit_tile(o, d, scene: Scene, bins: ScreenBins, tid, eps, aabb):
    """Front-to-back chunked closest hit for one tile's rays.

    Returns (t, N, color, missed)."""
    R = o.shape[0]
    dtype = o.dtype
    best_t = jnp.full((R,), BIG, dtype)
    best_n = jnp.zeros((R, 3), dtype)
    best_col = jnp.zeros((R, 4), dtype)
    # cap the early-exit bound by each ray's scene-box exit so tiles with
    # background rays don't scan every chunk
    t_cap = _ray_box_texit(o, d, aabb[0], aabb[1])

    # small dense passes first: cylinders and rings
    if bins.cyl is not None:
        ids = bins.cyl.cand[tid]
        ci = jnp.maximum(ids, 0)
        base = scene.cyl_base[ci]
        axis = scene.cyl_axis[ci]
        rad = jnp.where(ids >= 0, scene.cyl_radius[ci], -1.0)
        cols = scene.cyl_color[ci]
        t = _t_cyls(o, d, base, axis, rad, eps)
        tmin = jnp.min(t, axis=1)
        sel = jnp.argmin(t, axis=1)
        better = tmin < best_t
        tsafe = jnp.where(tmin >= BIG, 0.0, tmin)
        hit = o + tsafe[:, None] * d
        b = base[sel]
        a = axis[sel]
        ahat = a / jnp.maximum(jnp.linalg.norm(a, axis=-1, keepdims=True), 1e-30)
        rel = hit - b
        s = jnp.sum(rel * ahat, axis=-1, keepdims=True)
        n = rel - s * ahat
        n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-30)
        best_n = jnp.where(better[:, None], n, best_n)
        best_col = jnp.where(better[:, None], cols[sel], best_col)
        best_t = jnp.where(better, tmin, best_t)
    if bins.ring is not None:
        ids = bins.ring.cand[tid]
        ri = jnp.maximum(ids, 0)
        c2 = scene.ring_center[ri]
        n2 = scene.ring_normal[ri]
        rout = jnp.where(ids >= 0, scene.ring_rout[ri], -1.0)
        cols = scene.ring_color[ri]
        t = _t_rings(o, d, c2, n2, rout, eps)
        tmin = jnp.min(t, axis=1)
        sel = jnp.argmin(t, axis=1)
        better = tmin < best_t
        best_n = jnp.where(better[:, None], n2[sel], best_n)
        best_col = jnp.where(better[:, None], cols[sel], best_col)
        best_t = jnp.where(better, tmin, best_t)

    # depth-sorted sphere chunks with early termination
    if bins.sph_chunks is not None:
        nchunks = bins.sph_chunks.shape[1]
        zmin = bins.sph_zmin[tid]            # (nchunks,)

        def cond(carry):
            c, bt, bn, bc = carry
            need = jnp.max(jnp.minimum(bt, t_cap))
            return (c < nchunks) & (zmin[jnp.minimum(c, nchunks - 1)] < need)

        def body(carry):
            c, bt, bn, bc = carry
            ids = bins.sph_chunks[tid, c]    # (CH,)
            si = jnp.maximum(ids, 0)
            ctr = scene.sph_center[si]
            rr = jnp.where(ids >= 0, scene.sph_radius[si], -1.0)
            cols = scene.sph_color[si]
            t = _t_spheres(o, d, ctr, rr, eps)
            tmin = jnp.min(t, axis=1)
            sel = jnp.argmin(t, axis=1)
            better = tmin < bt
            tsafe = jnp.where(tmin >= BIG, 0.0, tmin)
            hit = o + tsafe[:, None] * d
            n = hit - ctr[sel]
            n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-30)
            bn = jnp.where(better[:, None], n, bn)
            bc = jnp.where(better[:, None], cols[sel], bc)
            bt = jnp.where(better, tmin, bt)
            return c + 1, bt, bn, bc

        _, best_t, best_n, best_col = jax.lax.while_loop(
            cond, body, (jnp.int32(0), best_t, best_n, best_col)
        )

    missed = best_t >= BIG
    facing = jnp.sum(best_n * d, axis=-1, keepdims=True)
    best_n = jnp.where(facing > 0, -best_n, best_n)
    return best_t, best_n, best_col, missed


_SHADOW_WINDOW = 32


def _shadow_filter_lb(hit, scene: Scene, lb: LightBins, light_dir, eps, with_trans):
    """Shadow transmission via depth-sorted light-grid suffix windows.

    Each cell's candidates are sorted by far-depth key (c.L + r); a ray
    starting at depth tau = h.L only tests the suffix with key > tau, in
    windows of 32, stopping when every ray is blocked or exhausted.  Lit
    (light-side) origins have near-empty suffixes, so the common case is a
    single window."""
    dtype = hit.dtype
    u = hit @ lb.e1 - lb.org[0]
    v = hit @ lb.e2 - lb.org[1]
    gx = jnp.clip(jnp.floor(u * lb.inv_cell), 0, lb.grid - 1).astype(jnp.int32)
    gy = jnp.clip(jnp.floor(v * lb.inv_cell), 0, lb.grid - 1).astype(jnp.int32)
    cell = gy * lb.grid + gx
    d = jnp.broadcast_to(light_dir, hit.shape)
    tau = hit @ lb.L
    R = hit.shape[0]
    blocked = jnp.zeros((R,), bool)
    filt = jnp.ones((R,), dtype)
    W = _SHADOW_WINDOW

    def run_kind(kind, t_of_ids, alpha_of_ids, blocked, filt):
        K = kind.cand.shape[1]
        keys_col = kind.keys[cell]                       # (R,K) gather
        start = jnp.sum(keys_col <= tau[:, None], axis=1).astype(jnp.int32)
        count = kind.count[cell]
        nwin = -(-K // W)

        def cond(carry):
            w, blk, fl = carry
            more = start + w * W < count
            need = more & (~blk if not with_trans else more)
            return (w < nwin) & jnp.any(need)

        def body(carry):
            w, blk, fl = carry
            sl = start[:, None] + w * W + jnp.arange(W, dtype=jnp.int32)[None, :]
            ok_slot = sl < count[:, None]
            sl = jnp.minimum(sl, K - 1)
            ids = jnp.where(ok_slot, kind.cand[cell[:, None], sl], -1)
            t = t_of_ids(ids)
            inr = t < BIG
            if with_trans:
                alpha = alpha_of_ids(ids)
                opq = alpha >= 0.99999
                blk = blk | jnp.any(inr & opq, axis=1)
                fl = fl * jnp.prod(jnp.where(inr & ~opq, 1.0 - alpha, 1.0), axis=1)
            else:
                blk = blk | jnp.any(inr, axis=1)
            return w + 1, blk, fl

        _, blocked, filt = jax.lax.while_loop(cond, body, (jnp.int32(0), blocked, filt))
        return blocked, filt

    if lb.sph is not None:
        def t_sph(ids):
            si = jnp.maximum(ids, 0)
            c = scene.sph_center[si]
            r = jnp.where(ids >= 0, scene.sph_radius[si], -1.0)
            oc = hit[:, None, :] - c
            b = jnp.sum(oc * d[:, None, :], axis=-1)
            cc = jnp.sum(oc * oc, axis=-1) - r * r
            disc = b * b - cc
            ok = (disc >= 0) & (r > 0)
            sq = jnp.sqrt(jnp.where(ok, disc, 0.0))
            t1 = -b - sq
            t2 = -b + sq
            return jnp.where(ok, jnp.where(t1 > eps, t1, jnp.where(t2 > eps, t2, BIG)), BIG)

        def a_sph(ids):
            return jnp.where(ids >= 0, scene.sph_color[jnp.maximum(ids, 0), 3], 1.0)

        blocked, filt = run_kind(lb.sph, t_sph, a_sph, blocked, filt)
    if lb.cyl is not None:
        def t_cyl(ids):
            ci = jnp.maximum(ids, 0)
            base = scene.cyl_base[ci]
            axis = scene.cyl_axis[ci]
            rad = jnp.where(ids >= 0, scene.cyl_radius[ci], -1.0)
            alen = jnp.linalg.norm(axis, axis=-1)
            ahat = axis / jnp.maximum(alen, 1e-30)[..., None]
            oc = hit[:, None, :] - base
            dda = jnp.sum(d[:, None, :] * ahat, axis=-1)
            oca = jnp.sum(oc * ahat, axis=-1)
            dp = d[:, None, :] - dda[..., None] * ahat
            op = oc - oca[..., None] * ahat
            a2 = jnp.sum(dp * dp, axis=-1)
            b = jnp.sum(op * dp, axis=-1)
            cq = jnp.sum(op * op, axis=-1) - rad * rad
            disc = b * b - a2 * cq
            live = (rad > 0) & (disc >= 0) & (a2 > 1e-12)
            sq = jnp.sqrt(jnp.where(live, disc, 0.0))
            inv_a2 = 1.0 / jnp.where(a2 > 1e-12, a2, 1.0)
            t1 = (-b - sq) * inv_a2
            t2 = (-b + sq) * inv_a2
            s1 = oca + t1 * dda
            s2 = oca + t2 * dda
            ok1 = live & (t1 > eps) & (s1 >= 0) & (s1 <= alen)
            ok2 = live & (t2 > eps) & (s2 >= 0) & (s2 <= alen)
            return jnp.where(ok1, t1, jnp.where(ok2, t2, BIG))

        def a_cyl(ids):
            return jnp.where(ids >= 0, scene.cyl_color[jnp.maximum(ids, 0), 3], 1.0)

        blocked, filt = run_kind(lb.cyl, t_cyl, a_cyl, blocked, filt)
    if lb.ring is not None:
        def t_ring(ids):
            ri = jnp.maximum(ids, 0)
            c2 = scene.ring_center[ri]
            n2 = scene.ring_normal[ri]
            rout = jnp.where(ids >= 0, scene.ring_rout[ri], -1.0)
            dn = jnp.sum(d[:, None, :] * n2, axis=-1)
            num = jnp.sum((c2 - hit[:, None, :]) * n2, axis=-1)
            t0 = num / jnp.where(jnp.abs(dn) > 1e-12, dn, 1.0)
            hp = hit[:, None, :] + t0[..., None] * d[:, None, :] - c2
            rho2 = jnp.sum(hp * hp, axis=-1)
            ok = (rout > 0) & (jnp.abs(dn) > 1e-12) & (t0 > eps) & (rho2 <= rout * rout)
            return jnp.where(ok, t0, BIG)

        def a_ring(ids):
            return jnp.where(ids >= 0, scene.ring_color[jnp.maximum(ids, 0), 3], 1.0)

        blocked, filt = run_kind(lb.ring, t_ring, a_ring, blocked, filt)

    return jnp.where(blocked, 0.0, filt).astype(dtype)


# ---------------------------------------------------------------------------
# tiled image renderer (no-AO path; AO falls back to brute render_image)
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "width", "height", "perspective", "tile_px", "tiles_x", "tiles_y"),
)
def render_image_tiled(
    scene: Scene,
    bins: ScreenBins,
    lb: LightBins,
    origin,
    lowleft,
    iplaneright,
    iplaneup,
    view,
    light_dir,
    cfg: RenderConfig,
    width: int,
    height: int,
    perspective: bool,
    seed,
    tile_px: int,
    tiles_x: int,
    tiles_y: int,
):
    """Render (H,W,3) float RGB via screen bins. Requires cfg.ao_enabled=False."""
    assert not cfg.ao_enabled, "tiled path does not do AO yet; use render_image"
    dtype = scene.sph_center.dtype
    origin = jnp.asarray(origin, dtype)
    lowleft = jnp.asarray(lowleft, dtype)
    ipr = jnp.asarray(iplaneright, dtype)
    ipu = jnp.asarray(iplaneup, dtype)
    view = jnp.asarray(view, dtype)
    light = jnp.asarray(light_dir, dtype)
    bg = jnp.asarray(cfg.background, dtype)
    P = tile_px * tile_px
    ntiles = tiles_x * tiles_y
    S = (cfg.aa_samples if cfg.aa_enabled else 0) + 1
    R = P * S
    lightcol = cfg.direct_light_intensity
    ambient, diffuse_k = 0.3, 0.8
    base_key = jax.random.PRNGKey(seed)
    dynamic_sched = cfg.ao_enabled or (cfg.aa_enabled and cfg.aa_samples > 4)
    off = 0.0 if dynamic_sched else 1.0

    ix = jnp.arange(tile_px, dtype=dtype)
    sub_x = jnp.tile(ix, tile_px)
    sub_y = jnp.repeat(ix, tile_px)

    # conservative scene AABB over live primitives (flipped space)
    def _minmax(centers, extent, live):
        big = jnp.array(1e30, dtype)
        lo = jnp.min(jnp.where(live[:, None], centers - extent[:, None], big), axis=0)
        hi = jnp.max(jnp.where(live[:, None], centers + extent[:, None], -big), axis=0)
        return lo, hi

    lo1, hi1 = _minmax(scene.sph_center, scene.sph_radius, scene.sph_radius > 0)
    cmid = scene.cyl_base + 0.5 * scene.cyl_axis
    cext = 0.5 * jnp.linalg.norm(scene.cyl_axis, axis=-1) + jnp.maximum(scene.cyl_radius, 0)
    lo2, hi2 = _minmax(cmid, cext, scene.cyl_radius > 0)
    lo3, hi3 = _minmax(scene.ring_center, scene.ring_rout, scene.ring_rout > 0)
    aabb = (
        jnp.minimum(lo1, jnp.minimum(lo2, lo3)),
        jnp.maximum(hi1, jnp.maximum(hi2, hi3)),
    )

    def shade_tile(tid):
        tx = (tid % tiles_x).astype(dtype)
        ty = (tid // tiles_x).astype(dtype)
        px0 = tx * tile_px + sub_x + off      # (P,)
        py0 = ty * tile_px + sub_y + off
        key = jax.random.fold_in(base_key, tid)
        jit2 = jax.random.uniform(key, (S, P, 2), dtype, minval=-0.5, maxval=0.5)
        jit2 = jit2.at[0].set(0.0)            # sample 0 unjittered
        x = (px0[None, :] + jit2[:, :, 0]).reshape(R)
        y = (py0[None, :] + jit2[:, :, 1]).reshape(R)
        if perspective:
            d = lowleft[None, :] + x[:, None] * ipr[None, :] + y[:, None] * ipu[None, :]
            d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
            o = jnp.broadcast_to(origin, (R, 3))
        else:
            o = lowleft[None, :] + x[:, None] * ipr[None, :] + y[:, None] * ipu[None, :]
            d = jnp.broadcast_to(view, (R, 3))

        def shade_hit(o_cur):
            t, N, col, missed = _closest_hit_tile(o_cur, d, scene, bins, tid, cfg.eps, aabb)
            tsafe = jnp.where(missed, 0.0, t)
            hit = o_cur + tsafe[:, None] * d
            inten = jnp.sum(N * light[None, :], axis=-1)
            lit = (inten > MINCONTRIB) & ~missed
            if cfg.shadows_enabled and cfg.direct_light_enabled:
                filt = jax.lax.cond(
                    jnp.any(lit),
                    lambda: _shadow_filter_lb(hit, scene, lb, light, cfg.eps, cfg.transparency),
                    lambda: jnp.ones((R,), dtype),
                )
            else:
                filt = jnp.ones((R,), dtype)
            diffuse = (
                jnp.where(lit, inten * lightcol * filt, 0.0)
                if cfg.direct_light_enabled
                else jnp.zeros((R,), dtype)
            )
            shade = diffuse_k * diffuse + ambient
            rgb = col[:, :3] * shade[:, None]
            rgb = jnp.where(missed[:, None], bg[None, :], rgb)
            return rgb, t, col[:, 3], missed

        if not cfg.transparency:
            rgb, _, _, _ = shade_hit(o)
        else:
            def peel(carry2, _):
                o_cur, weight, acc2 = carry2
                srgb, t, alpha, missed = shade_hit(o_cur)
                a = jnp.where(missed, 1.0, alpha)
                acc2 = acc2 + weight[:, None] * a[:, None] * srgb
                weight = weight * (1.0 - a)
                tsafe = jnp.where(missed, 0.0, t)
                o_next = o_cur + (tsafe + cfg.eps)[:, None] * d
                return (o_next, weight, acc2), None

            init = (o, jnp.ones((R,), dtype), jnp.zeros((R, 3), dtype))
            (o_f, w_f, acc2), _ = jax.lax.scan(peel, init, None, length=cfg.max_trans)
            rgb = acc2 + w_f[:, None] * bg[None, :]

        return jnp.mean(rgb.reshape(S, P, 3), axis=0)

    out = jax.lax.map(shade_tile, jnp.arange(ntiles, dtype=jnp.int32))
    img = out.reshape(tiles_y, tiles_x, tile_px, tile_px, 3)
    img = img.transpose(0, 2, 1, 3, 4).reshape(tiles_y * tile_px, tiles_x * tile_px, 3)
    img = img[:height, :width]
    return img[::-1]


# ---------------------------------------------------------------------------
# Pallas fast path: opaque scenes, no AO — global rays + VMEM chunk loop
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "width", "height", "perspective", "tile_px", "tiles_x", "tiles_y",
        "interpret", "do_flip", "light_grid_n",
    ),
)
def render_image_pallas(
    scene: Scene,
    bins: ScreenBins,
    chunk_data,           # (nb, nchunks, CH, 8) pre-gathered sphere records
    lb: LightBins,
    origin, lowleft, iplaneright, iplaneup, view, light_dir,
    cfg: RenderConfig,
    width: int, height: int, perspective: bool, seed,
    tile_px: int, tiles_x: int, tiles_y: int,
    interpret: bool = False,
    ty_offset=0,
    do_flip: bool = True,
    light_records=None,   # (ldata, offs, cnt) CSR for the Pallas shadow kernel
    light_grid_n: int = 128,
):
    """Opaque-scene renderer: Pallas chunked closest hit + global shading.

    Transparency and AO fall back to the XLA paths.  For large frames the
    front-end calls this per horizontal tile band (``ty_offset`` shifts the
    pixel rows; ``do_flip=False`` defers the vertical flip to assembly) so
    per-frame intermediates stay bounded."""
    from .pallas_kernels import closest_hit_spheres_tiles

    assert not cfg.ao_enabled and not cfg.transparency
    dtype = scene.sph_center.dtype
    origin = jnp.asarray(origin, dtype)
    lowleft = jnp.asarray(lowleft, dtype)
    ipr = jnp.asarray(iplaneright, dtype)
    ipu = jnp.asarray(iplaneup, dtype)
    view = jnp.asarray(view, dtype)
    light = jnp.asarray(light_dir, dtype)
    bg = jnp.asarray(cfg.background, dtype)
    P = tile_px * tile_px
    nb = tiles_x * tiles_y
    S = (cfg.aa_samples if cfg.aa_enabled else 0) + 1
    R = P * S
    lightcol = cfg.direct_light_intensity
    ambient, diffuse_k = 0.3, 0.8
    dynamic_sched = cfg.ao_enabled or (cfg.aa_enabled and cfg.aa_samples > 4)
    off = 0.0 if dynamic_sched else 1.0
    base_key = jax.random.PRNGKey(seed)

    # --- global ray generation --------------------------------------------
    ix = jnp.arange(tile_px, dtype=dtype)
    sub_x = jnp.tile(ix, tile_px)
    sub_y = jnp.repeat(ix, tile_px)
    tid = jnp.arange(nb, dtype=jnp.int32)
    tx = (tid % tiles_x).astype(dtype)
    ty = (tid // tiles_x).astype(dtype) + jnp.asarray(ty_offset, dtype)
    px0 = tx[:, None] * tile_px + sub_x[None, :] + off      # (nb, P)
    py0 = ty[:, None] * tile_px + sub_y[None, :] + off
    jit2 = jax.random.uniform(base_key, (nb, S, P, 2), dtype, minval=-0.5, maxval=0.5)
    jit2 = jit2.at[:, 0].set(0.0)
    x = (px0[:, None, :] + jit2[..., 0]).reshape(nb, R)
    y = (py0[:, None, :] + jit2[..., 1]).reshape(nb, R)
    if perspective:
        d = (
            lowleft[None, None, :]
            + x[..., None] * ipr[None, None, :]
            + y[..., None] * ipu[None, None, :]
        )
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        o = jnp.broadcast_to(origin, (nb, R, 3))
    else:
        o = (
            lowleft[None, None, :]
            + x[..., None] * ipr[None, None, :]
            + y[..., None] * ipu[None, None, :]
        )
        d = jnp.broadcast_to(view, (nb, R, 3))

    # scene AABB cap
    def _minmax(centers, extent, live):
        big = jnp.array(1e30, dtype)
        lo = jnp.min(jnp.where(live[:, None], centers - extent[:, None], big), axis=0)
        hi = jnp.max(jnp.where(live[:, None], centers + extent[:, None], -big), axis=0)
        return lo, hi

    lo1, hi1 = _minmax(scene.sph_center, scene.sph_radius, scene.sph_radius > 0)
    cmid = scene.cyl_base + 0.5 * scene.cyl_axis
    cext = 0.5 * jnp.linalg.norm(scene.cyl_axis, axis=-1) + jnp.maximum(scene.cyl_radius, 0)
    lo2, hi2 = _minmax(cmid, cext, scene.cyl_radius > 0)
    lo3, hi3 = _minmax(scene.ring_center, scene.ring_rout, scene.ring_rout > 0)
    lo = jnp.minimum(lo1, jnp.minimum(lo2, lo3))
    hi = jnp.maximum(hi1, jnp.maximum(hi2, hi3))
    tcap = _ray_box_texit(o.reshape(-1, 3), d.reshape(-1, 3), lo, hi).reshape(nb, R)

    # --- sphere closest hit (Pallas) --------------------------------------
    best_t, best_rec = closest_hit_spheres_tiles(
        o, d, tcap, bins.sph_zmin, chunk_data, eps=cfg.eps, interpret=interpret
    )

    # --- cyl/ring merge (per tile, dense small) ---------------------------
    def other_kinds(args):
        tid1, o1, d1, bt, rec1 = args
        best_n = jnp.zeros((R, 3), dtype)
        best_c = jnp.zeros((R, 4), dtype)
        have = rec1[:, 3] > 0
        hit0 = o1 + jnp.where(have, bt, 0.0)[:, None] * d1
        n0 = hit0 - rec1[:, 0:3]
        n0 = n0 / jnp.maximum(jnp.linalg.norm(n0, axis=-1, keepdims=True), 1e-30)
        best_n = jnp.where(have[:, None], n0, best_n)
        best_c = jnp.where(have[:, None], rec1[:, 4:8], best_c)
        if bins.cyl is not None:
            ids = bins.cyl.cand[tid1]
            ci = jnp.maximum(ids, 0)
            base = scene.cyl_base[ci]
            axis = scene.cyl_axis[ci]
            rad = jnp.where(ids >= 0, scene.cyl_radius[ci], -1.0)
            t = _t_cyls(o1, d1, base, axis, rad, cfg.eps)
            tmin = jnp.min(t, axis=1)
            selc = jnp.argmin(t, axis=1)
            better = tmin < bt
            tsafe = jnp.where(tmin >= BIG, 0.0, tmin)
            hitc = o1 + tsafe[:, None] * d1
            bsel = base[selc]
            asel = axis[selc]
            ahat = asel / jnp.maximum(jnp.linalg.norm(asel, axis=-1, keepdims=True), 1e-30)
            rel = hitc - bsel
            s = jnp.sum(rel * ahat, axis=-1, keepdims=True)
            n = rel - s * ahat
            n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-30)
            best_n = jnp.where(better[:, None], n, best_n)
            best_c = jnp.where(better[:, None], scene.cyl_color[ci][selc], best_c)
            bt = jnp.where(better, tmin, bt)
        if bins.ring is not None:
            ids = bins.ring.cand[tid1]
            ri = jnp.maximum(ids, 0)
            c2 = scene.ring_center[ri]
            n2 = scene.ring_normal[ri]
            rout = jnp.where(ids >= 0, scene.ring_rout[ri], -1.0)
            t = _t_rings(o1, d1, c2, n2, rout, cfg.eps)
            tmin = jnp.min(t, axis=1)
            selr = jnp.argmin(t, axis=1)
            better = tmin < bt
            best_n = jnp.where(better[:, None], n2[selr], best_n)
            best_c = jnp.where(better[:, None], scene.ring_color[ri][selr], best_c)
            bt = jnp.where(better, tmin, bt)
        return bt, best_n, best_c

    if bins.cyl is not None or bins.ring is not None:
        best_t, N, col = jax.lax.map(
            other_kinds, (jnp.arange(nb, dtype=jnp.int32), o, d, best_t, best_rec)
        )
    else:
        have = best_rec[..., 3] > 0
        hit0 = o + jnp.where(have, best_t, 0.0)[..., None] * d
        n0 = hit0 - best_rec[..., 0:3]
        n0 = n0 / jnp.maximum(jnp.linalg.norm(n0, axis=-1, keepdims=True), 1e-30)
        N = jnp.where(have[..., None], n0, 0.0)
        col = jnp.where(have[..., None], best_rec[..., 4:8], 0.0)

    # --- global shading ----------------------------------------------------
    missed = best_t >= BIG
    facing = jnp.sum(N * d, axis=-1, keepdims=True)
    N = jnp.where(facing > 0, -N, N)
    tsafe = jnp.where(missed, 0.0, best_t)
    hit = o + tsafe[..., None] * d
    inten = jnp.sum(N * light[None, None, :], axis=-1)
    lit = (inten > MINCONTRIB) & ~missed

    if cfg.shadows_enabled and cfg.direct_light_enabled:
        if light_records is not None:
            from .pallas_kernels import shadow_filter_tiles

            ldata, loffs, lcnt = light_records[:3]
            u = hit @ lb.e1 - lb.org[0]
            v = hit @ lb.e2 - lb.org[1]
            tau = hit @ lb.L
            uvt = jnp.stack([u, v, tau], axis=-1)
            gx = jnp.clip(
                jnp.floor(u * lb.inv_cell), 0, light_grid_n - 1
            ).astype(jnp.int32)
            gy = jnp.clip(
                jnp.floor(v * lb.inv_cell), 0, light_grid_n - 1
            ).astype(jnp.int32)
            cellxy = jnp.stack([gx, gy], axis=-1)
            filt = shadow_filter_tiles(
                uvt, cellxy, lit.astype(jnp.int32), ldata, loffs, lcnt,
                grid_n=light_grid_n, eps=cfg.eps, interpret=interpret,
            )
            # spheres handled by the kernel; cyl/ring occluders (rare) would
            # need the XLA light-grid pass — callers only pass light_records
            # for sphere-only scenes.
        else:
            def tile_shadow(args):
                hit1, lit1 = args
                return jax.lax.cond(
                    jnp.any(lit1),
                    lambda: _shadow_filter_lb(hit1, scene, lb, light, cfg.eps, False),
                    lambda: jnp.ones((R,), dtype),
                )

            filt = jax.lax.map(tile_shadow, (hit, lit))
    else:
        filt = jnp.ones((nb, R), dtype)

    diffuse = (
        jnp.where(lit, inten * lightcol * filt, 0.0)
        if cfg.direct_light_enabled
        else jnp.zeros((nb, R), dtype)
    )
    shade = diffuse_k * diffuse + ambient
    rgb = col[..., :3] * shade[..., None]
    rgb = jnp.where(missed[..., None], bg[None, None, :], rgb)

    out = jnp.mean(rgb.reshape(nb, S, P, 3), axis=1)
    img = out.reshape(tiles_y, tiles_x, tile_px, tile_px, 3)
    img = img.transpose(0, 2, 1, 3, 4).reshape(tiles_y * tile_px, tiles_x * tile_px, 3)
    img = img[:height, :width]
    return img[::-1] if do_flip else img
