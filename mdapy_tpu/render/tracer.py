"""The ray-tracing core: batched XLA kernels reproducing Tachyon's shading.

Replaces the reference's per-ray recursive C tracer (trace.c/shade.c) and the
OptiX SIMT pipeline (TachyonOptiXShaders.cu) with dense ray-batch x
primitive-batch intersection + masked min-reduce — the shape TPUs like
(SURVEY.md §7 hard-part 2).  Shading model is Tachyon's exactly:

  rgb = base * (diffuse * (sum_l shadow_l * lightcol * max(N.L,0) * light_scale
                           + ao) + ambient)
  ao  = (2/S) * sum_s unoccluded_s * |N.d_s| * skycol      (shade.c:412-483)
  ambient=0.3, diffuse=0.8 (tachyon_render.h makeTex);
  light_scale = 0.2 when AO is on (rt_rescale_lights, tachyon_render.h:199)
  MINCONTRIB = 1/512 light-contribution floor (tachyon.h:917)
  quantization = truncating *255 clamp (imageio.c:174-186)

Primary rays at integer pixel coords, AA = 1 corner sample + N jittered in
[-0.5,0.5] box-filtered (camera.c cam_perspective_aa_ray), scanlines bottom-up
with a final vertical flip (tachyon_render.h:219-235).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .scene import Scene

__all__ = ["RenderConfig", "render_rays", "render_image", "trace_closest", "occlusion"]

MINCONTRIB = 1.0 / 512.0
BIG = 1e18


class RenderConfig(NamedTuple):
    """Static render settings (hashable -> part of the jit cache key)."""

    aa_samples: int = 12          # extra jittered samples (total = aa+1)
    aa_enabled: bool = True
    ao_samples: int = 12
    ao_enabled: bool = True
    shadows_enabled: bool = True
    direct_light_enabled: bool = True
    ao_brightness: float = 0.8
    ao_max_dist: float = 3.402823e38
    direct_light_intensity: float = 0.9
    background: tuple = (0.0, 0.0, 0.0)
    eps: float = 4e-4             # Tachyon EPSILON (float build, tachyon.h:905)
    transparency: bool = False    # enable transparency peeling
    max_trans: int = 4            # peeling budget when transparency on


# ---------------------------------------------------------------------------
# primitive intersections — (R,3) rays x (C,) primitives -> (R,C) hit params
# ---------------------------------------------------------------------------


def _sphere_t(o, d, centers, radii, eps):
    """Closest positive hit parameter per (ray, sphere); BIG on miss."""
    oc = o[:, None, :] - centers[None, :, :]              # (R,C,3)
    b = jnp.einsum("rcx,rx->rc", oc, d)                   # d assumed unit
    c = jnp.sum(oc * oc, axis=-1) - (radii * radii)[None, :]
    disc = b * b - c
    ok = (disc >= 0.0) & (radii > 0.0)[None, :]
    sq = jnp.sqrt(jnp.where(ok, disc, 0.0))
    t1 = -b - sq
    t2 = -b + sq
    t = jnp.where(t1 > eps, t1, jnp.where(t2 > eps, t2, BIG))
    return jnp.where(ok, t, BIG)


def _cyl_t(o, d, base, axis, radii, eps):
    """Finite (uncapped) cylinder along `axis` from `base` (cylinder.c)."""
    alen = jnp.linalg.norm(axis, axis=-1)                 # (C,)
    ahat = axis / jnp.maximum(alen, 1e-30)[:, None]
    oc = o[:, None, :] - base[None, :, :]                 # (R,C,3)
    dda = jnp.einsum("rx,cx->rc", d, ahat)                # (R,C)
    oca = jnp.einsum("rcx,cx->rc", oc, ahat)
    # explicit perpendicular components: `1 - dda^2` and `|oc|^2 - oca^2`
    # cancel catastrophically in f32 for rays nearly parallel to long thin
    # cylinders (box edges) — grey-haze artifacts; forming the perpendicular
    # vectors first is stable
    dp = d[:, None, :] - dda[..., None] * ahat[None, :, :]   # (R,C,3)
    op = oc - oca[..., None] * ahat[None, :, :]
    a2 = jnp.sum(dp * dp, axis=-1)                        # |d_perp|^2 >= 0
    b = jnp.sum(op * dp, axis=-1)
    c = jnp.sum(op * op, axis=-1) - (radii * radii)[None, :]
    disc = b * b - a2 * c
    live = (radii > 0.0)[None, :] & (disc >= 0.0) & (a2 > 1e-12)
    sq = jnp.sqrt(jnp.where(live, disc, 0.0))
    inv_a2 = 1.0 / jnp.where(a2 > 1e-12, a2, 1.0)
    t1 = (-b - sq) * inv_a2
    t2 = (-b + sq) * inv_a2
    s1 = oca + t1 * dda
    s2 = oca + t2 * dda
    ok1 = live & (t1 > eps) & (s1 >= 0.0) & (s1 <= alen[None, :])
    ok2 = live & (t2 > eps) & (s2 >= 0.0) & (s2 <= alen[None, :])
    return jnp.where(ok1, t1, jnp.where(ok2, t2, BIG))


def _ring_t(o, d, centers, normals, rout, eps):
    """Flat ring (disk, inner radius 0) in the plane through center (ring.c)."""
    dn = jnp.einsum("rx,cx->rc", d, normals)              # (R,C)
    num = jnp.einsum("cx,cx->c", centers, normals)[None, :] - jnp.einsum(
        "rx,cx->rc", o, normals
    )
    t = num / jnp.where(jnp.abs(dn) > 1e-12, dn, 1.0)
    hit = o[:, None, :] + t[..., None] * d[:, None, :] - centers[None, :, :]
    rho2 = jnp.sum(hit * hit, axis=-1)
    ok = (
        (rout > 0.0)[None, :]
        & (jnp.abs(dn) > 1e-12)
        & (t > eps)
        & (rho2 <= (rout * rout)[None, :])
    )
    return jnp.where(ok, t, BIG)


# ---------------------------------------------------------------------------
# closest hit + occlusion
# ---------------------------------------------------------------------------


def trace_closest(o, d, scene: Scene, eps):
    """Returns (t, kind, idx): kind 0=sphere 1=cyl 2=ring; t=BIG on miss."""
    ts = _sphere_t(o, d, scene.sph_center, scene.sph_radius, eps)
    tc = _cyl_t(o, d, scene.cyl_base, scene.cyl_axis, scene.cyl_radius, eps)
    tr = _ring_t(o, d, scene.ring_center, scene.ring_normal, scene.ring_rout, eps)
    t0, i0 = jnp.min(ts, axis=1), jnp.argmin(ts, axis=1)
    t1, i1 = jnp.min(tc, axis=1), jnp.argmin(tc, axis=1)
    t2, i2 = jnp.min(tr, axis=1), jnp.argmin(tr, axis=1)
    tall = jnp.stack([t0, t1, t2], axis=1)                # (R,3)
    kind = jnp.argmin(tall, axis=1)
    t = jnp.min(tall, axis=1)
    idx = jnp.where(kind == 0, i0, jnp.where(kind == 1, i1, i2))
    return t, kind, idx


def occlusion(o, d, maxdist, scene: Scene, eps):
    """True where any primitive lies within (eps, maxdist) along the ray."""
    ts = _sphere_t(o, d, scene.sph_center, scene.sph_radius, eps)
    tc = _cyl_t(o, d, scene.cyl_base, scene.cyl_axis, scene.cyl_radius, eps)
    tr = _ring_t(o, d, scene.ring_center, scene.ring_normal, scene.ring_rout, eps)
    tmin = jnp.minimum(jnp.min(ts, axis=1), jnp.minimum(jnp.min(tc, axis=1), jnp.min(tr, axis=1)))
    # a miss is encoded as BIG; guard against maxdist sentinels larger than BIG
    return (tmin < maxdist) & (tmin < BIG)


def shadow_filter(o, d, maxdist, scene: Scene, eps, with_trans: bool):
    """Light transmission along a shadow ray in [0, 1].

    Opaque surfaces (alpha >= 0.99999, api.c:918-921) block fully; transparent
    ones multiply by (1 - alpha) (intersect.c:138-141, shadow filtering on by
    default).  With ``with_trans=False`` this reduces to a binary test.
    """
    if not with_trans:
        occ = occlusion(o, d, maxdist, scene, eps)
        return jnp.where(occ, 0.0, 1.0).astype(o.dtype)
    ts = _sphere_t(o, d, scene.sph_center, scene.sph_radius, eps)
    tc = _cyl_t(o, d, scene.cyl_base, scene.cyl_axis, scene.cyl_radius, eps)
    tr = _ring_t(o, d, scene.ring_center, scene.ring_normal, scene.ring_rout, eps)

    def fold(tmat, alpha):
        inrange = (tmat < maxdist) & (tmat < BIG)
        opaque = alpha[None, :] >= 0.99999
        blocked = jnp.any(inrange & opaque, axis=1)
        filt = jnp.prod(
            jnp.where(inrange & ~opaque, 1.0 - alpha[None, :], 1.0), axis=1
        )
        return blocked, filt

    b1, f1 = fold(ts, scene.sph_color[:, 3])
    b2, f2 = fold(tc, scene.cyl_color[:, 3])
    b3, f3 = fold(tr, scene.ring_color[:, 3])
    filt = f1 * f2 * f3
    return jnp.where(b1 | b2 | b3, 0.0, filt).astype(o.dtype)


def _surface(scene: Scene, kind, idx, hit, d):
    """(N, rgb, alpha) at hit points; normals flipped toward the viewer
    (sphere.c:125, cylinder/ring likewise)."""
    # sphere branch
    sc = scene.sph_center[idx]
    sn = hit - sc
    sn = sn / jnp.maximum(jnp.linalg.norm(sn, axis=-1, keepdims=True), 1e-30)
    scol = scene.sph_color[idx]
    # cylinder branch
    cb = scene.cyl_base[idx]
    ca = scene.cyl_axis[idx]
    calen = jnp.maximum(jnp.linalg.norm(ca, axis=-1, keepdims=True), 1e-30)
    cahat = ca / calen
    rel = hit - cb
    s = jnp.sum(rel * cahat, axis=-1, keepdims=True)
    cn = rel - s * cahat
    cn = cn / jnp.maximum(jnp.linalg.norm(cn, axis=-1, keepdims=True), 1e-30)
    ccol = scene.cyl_color[idx]
    # ring branch
    rn = scene.ring_normal[idx]
    rcol = scene.ring_color[idx]

    k = kind[:, None]
    N = jnp.where(k == 0, sn, jnp.where(k == 1, cn, rn))
    col = jnp.where(k == 0, scol, jnp.where(k == 1, ccol, rcol))
    # flip toward viewer
    facing = jnp.sum(N * d, axis=-1, keepdims=True)
    N = jnp.where(facing > 0.0, -N, N)
    return N, col[:, :3], col[:, 3]


# ---------------------------------------------------------------------------
# shading
# ---------------------------------------------------------------------------


def _shade_batch(o, d, scene: Scene, cfg: RenderConfig, light_dir, key):
    """Shade a batch of rays -> (R,3) float RGB (unclamped, pre-quantize)."""
    dtype = scene.sph_center.dtype
    R = o.shape[0]
    bg = jnp.asarray(cfg.background, dtype=dtype)

    light_scale = 0.2 if cfg.ao_enabled else 1.0
    lightcol = cfg.direct_light_intensity
    ambient, diffuse_k = 0.3, 0.8

    def shade_one_bounce(o, d, key):
        t, kind, idx = trace_closest(o, d, scene, cfg.eps)
        missed = t >= BIG
        tsafe = jnp.where(missed, 0.0, t)
        hit = o + tsafe[:, None] * d
        N, base, alpha = _surface(scene, kind, idx, hit, d)

        diffuse = jnp.zeros((R,), dtype)
        if cfg.direct_light_enabled:
            inten = light_scale * jnp.sum(N * light_dir[None, :], axis=-1)
            lit = inten > MINCONTRIB
            filt = 1.0
            if cfg.shadows_enabled:
                filt = shadow_filter(
                    hit, jnp.broadcast_to(light_dir, (R, 3)), BIG, scene,
                    cfg.eps, cfg.transparency,
                )
            diffuse = diffuse + jnp.where(lit, inten * lightcol * filt, 0.0)

        ao = jnp.zeros((R,), dtype)
        if cfg.ao_enabled and cfg.ao_samples > 0:
            def ao_body(i, carry):
                acc, k = carry
                k, sub = jax.random.split(k)
                dirs = jax.random.normal(sub, (R, 3), dtype)
                dirs = dirs / jnp.maximum(
                    jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-30
                )
                ndl = jnp.sum(dirs * N, axis=-1)
                dirs = jnp.where((ndl < 0)[:, None], -dirs, dirs)
                ndl = jnp.abs(ndl)
                # AO rays crawl EPSILON along N before testing (shade.c:429)
                filt = shadow_filter(
                    hit + cfg.eps * N, dirs, cfg.ao_max_dist, scene,
                    cfg.eps, cfg.transparency,
                )
                return acc + ndl * filt, k

            ao_sum, key = jax.lax.fori_loop(
                0, cfg.ao_samples, ao_body, (jnp.zeros((R,), dtype), key)
            )
            ao = (2.0 / cfg.ao_samples) * ao_sum * cfg.ao_brightness

        shade = diffuse_k * (diffuse + ao) + ambient
        rgb = base * shade[:, None]
        rgb = jnp.where(missed[:, None], bg[None, :], rgb)
        return rgb, t, alpha, missed

    if not cfg.transparency:
        rgb, _, _, _ = shade_one_bounce(o, d, key)
        return rgb

    # transparency peeling (RT_TRANS_VMD): col = a*col + (1-a)*transmitted,
    # iterated along the same ray direction with a fixed budget
    def peel(carry, k):
        o_cur, weight, acc = carry
        rgb, t, alpha, missed = shade_one_bounce(o_cur, d, k)
        a = jnp.where(missed, 1.0, alpha)
        acc = acc + weight[:, None] * a[:, None] * rgb
        weight = weight * (1.0 - a)
        tsafe = jnp.where(missed, 0.0, t)
        o_next = o_cur + (tsafe + cfg.eps)[:, None] * d
        return (o_next, weight, acc), None

    keys = jax.random.split(key, cfg.max_trans)
    init = (o, jnp.ones((R,), dtype), jnp.zeros((R, 3), dtype))
    (o_f, w_f, acc), _ = jax.lax.scan(peel, init, keys)
    # any residual weight sees the background
    return acc + w_f[:, None] * bg[None, :]


# ---------------------------------------------------------------------------
# full-image renderer
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit, static_argnames=("cfg", "width", "height", "perspective", "chunk")
)
def render_image(
    scene: Scene,
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
    chunk: int = 16384,
):
    """Render (H,W,3) float RGB, rows already flipped to top-down."""
    dtype = scene.sph_center.dtype
    origin = jnp.asarray(origin, dtype)
    lowleft = jnp.asarray(lowleft, dtype)
    ipr = jnp.asarray(iplaneright, dtype)
    ipu = jnp.asarray(iplaneup, dtype)
    view = jnp.asarray(view, dtype)
    light = jnp.asarray(light_dir, dtype)

    npix = width * height
    npad = -(-npix // chunk) * chunk
    base_key = jax.random.PRNGKey(seed)

    n_aa = cfg.aa_samples if cfg.aa_enabled else 0

    def do_chunk(ci):
        start = ci * chunk
        pix = start + jnp.arange(chunk)
        # Pixel-coordinate quirk of the reference: the static scanline loop
        # samples 1-based coords (trace.c:371-383, render.c:171-175) but the
        # dynamic pixel scheduler — used when AO is on or AA > 4 samples
        # (render.c:117) — samples 0-based coords (trace.c:331-344).
        dynamic_sched = cfg.ao_enabled or (cfg.aa_enabled and cfg.aa_samples > 4)
        off = 0.0 if dynamic_sched else 1.0
        px = (pix % width).astype(dtype) + off
        py = (pix // width).astype(dtype) + off  # bottom-up scanline index
        ckey = jax.random.fold_in(base_key, ci)

        def sample(s, carry):
            acc, k = carry
            k, kjit, kao = jax.random.split(k, 3)
            jitter = jax.random.uniform(
                kjit, (chunk, 2), dtype, minval=-0.5, maxval=0.5
            )
            x = px + jnp.where(s == 0, 0.0, jitter[:, 0])
            y = py + jnp.where(s == 0, 0.0, jitter[:, 1])
            if perspective:
                d = lowleft[None, :] + x[:, None] * ipr[None, :] + y[:, None] * ipu[None, :]
                d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
                o = jnp.broadcast_to(origin, (chunk, 3))
            else:
                o = lowleft[None, :] + x[:, None] * ipr[None, :] + y[:, None] * ipu[None, :]
                d = jnp.broadcast_to(view, (chunk, 3))
            rgb = _shade_batch(o, d, scene, cfg, light, kao)
            return acc + rgb, k

        acc, _ = jax.lax.fori_loop(
            0, n_aa + 1, sample, (jnp.zeros((chunk, 3), dtype), ckey)
        )
        return acc / (n_aa + 1.0)

    nchunks = npad // chunk
    out = jax.lax.map(do_chunk, jnp.arange(nchunks))
    img = out.reshape(npad, 3)[:npix].reshape(height, width, 3)
    return img[::-1]  # bottom-up -> top-down


def quantize(img_f) -> np.ndarray:
    """float RGB -> uint8 with Tachyon's truncating conversion (imageio.c:174)."""
    img = np.asarray(img_f, dtype=np.float64)
    q = np.clip((img * 255.0).astype(np.int32), 0, 255)
    return q.astype(np.uint8)
