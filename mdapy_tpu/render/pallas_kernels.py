"""Pallas TPU kernels for the tracer hot loop.

The XLA tiled path leaves ~30 unfused (rays x chunk) intermediates in HBM per
chunk iteration — memory-bound at ~300 GB/s.  This kernel keeps the whole
chunked closest-hit in VMEM: per screen tile, candidate sphere data streams
in as contiguous (8, CH) record chunks (pre-gathered densely at bin time so
the DMA is a plain slice, double-buffered), the (rays x CH) intersection runs
on the VPU, and only per-ray best_t / best_slot leave the kernel.

Early termination mirrors the XLA path: chunks are depth-sorted and the loop
stops when the next chunk's conservative min depth cannot beat
max_r(min(best_t_r, t_cap_r)).

TPU layout constraints shape the grid: each kernel step handles TILE_GROUP=8
tiles (so output blocks are (8, RB) with sublane 8) and ray blocks RB are a
multiple of 128 (lane tiling).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 1e18
TILE_GROUP = 8

__all__ = [
    "closest_hit_spheres_tiles",
    "gather_chunk_data",
    "gather_chunk_data_banded",
    "shadow_filter_tiles",
]


@functools.partial(jax.jit, static_argnames=())
def pack_sphere_table(centers, radii, colors):
    """Scene-constant packed (n, 8) record table [cx, cy, cz, r, rgba]."""
    return jnp.concatenate([centers, radii[:, None], colors], axis=1)


def gather_chunk_data(sph_chunks, centers, radii, colors, table=None):
    """(nb, nchunks, CH) ids -> dense (nb, nchunks, 8, CH) candidate records
    [cx, cy, cz, r, rgba] as *rows* so the last (DMA-tiled) dim is CH, which
    is 128-aligned; padded slots get r = -1.

    One packed row-8 gather: the TPU gather unit is latency-bound per ROW
    (~14 ns regardless of width up to a lane), so fetching the whole record
    in one gather runs ~3x faster than separate center/radius/color gathers
    (the cost that dominates band-streamed 10M-atom frames)."""
    ids = jnp.maximum(sph_chunks, 0)
    live = sph_chunks >= 0
    if table is None:
        table = pack_sphere_table(centers, radii, colors)  # (n, 8)
    rec = jnp.swapaxes(table[ids], -1, -2)            # (nb, nchunks, 8, CH)
    dead_r = jnp.where(live, rec[..., 3, :], -1.0)
    return rec.at[..., 3, :].set(dead_r)


@functools.partial(jax.jit, donate_argnums=(0,))
def _update_band(buf, part, row0):
    z = jnp.zeros((), row0.dtype)
    return jax.lax.dynamic_update_slice(
        buf, part.astype(buf.dtype), (row0, z, z, z)
    )


def gather_chunk_data_banded(sph_chunks, centers, radii, colors,
                             band_bytes: int = 1 << 30):
    """`gather_chunk_data` with bounded peak memory.

    The one-shot gather's peak footprint is ~3x the result (gather output +
    transpose + record table), which pushes a 10M-atom 1080p frustum's
    ~6 GB of records past HBM even though the RESULT fits.  Gather one
    tile-row band at a time and assemble into a single donated buffer, so
    the peak is result + one band.  The assembled records are then cached
    across frames by the renderer — steady-state frames skip the gather
    entirely (VERDICT r3 item 6: config5 was re-gathering ~6 GB per frame)."""
    nb, nchunks, CH = sph_chunks.shape
    table = pack_sphere_table(centers, radii, colors)
    row_bytes = nchunks * 8 * CH * 4
    rows = max(1, min(nb, band_bytes // max(row_bytes, 1)))
    out = jnp.zeros((nb, nchunks, 8, CH), jnp.float32)
    for b0 in range(0, nb, rows):
        b1 = min(nb, b0 + rows)
        part = gather_chunk_data(
            sph_chunks[b0:b1], centers, radii, colors, table=table
        )
        out = _update_band(out, part, jnp.int32(b0))
    return out


def _kernel(
    zmin_ref,     # (nb*nchunks,) SMEM scalar-prefetch — chunk min depths
    o_ref,        # (G, RB, 3) VMEM — ray origins for G tiles
    d_ref,        # (G, RB, 3) VMEM
    tcap_ref,     # (G, RB) VMEM — per-ray early-exit caps
    chunks_hbm,   # (nb, nchunks, 8, CH) ANY/HBM — candidate records
    t_out,        # (G, RB) VMEM out
    rec_out,      # (G, RB, 8) VMEM out — winning record [cx,cy,cz,r,rgba]
    buf,          # (2, 8, CH) VMEM scratch
    sems,         # (2,) DMA semaphores
    *,
    eps: float,
    nchunks: int,
    CH: int,
    nb: int,
):
    RB = o_ref.shape[1]
    group = pl.program_id(0)

    def per_tile(k, _):
        tile = group * TILE_GROUP + k
        ox = o_ref[k, :, 0:1]
        oy = o_ref[k, :, 1:2]
        oz = o_ref[k, :, 2:3]
        dx = d_ref[k, :, 0:1]
        dy = d_ref[k, :, 1:2]
        dz = d_ref[k, :, 2:3]
        tcap = tcap_ref[k, :][:, None]

        def dma(slot, c):
            return pltpu.make_async_copy(
                chunks_hbm.at[jnp.minimum(tile, nb - 1), c], buf.at[slot], sems.at[slot]
            )

        def cond(carry):
            c, best_t, best_rec = carry
            zc = zmin_ref[jnp.minimum(tile, nb - 1) * nchunks + jnp.minimum(c, nchunks - 1)]
            needed = jnp.max(jnp.minimum(best_t, tcap))
            return (c < nchunks) & (zc < needed)

        zc0 = zmin_ref[jnp.minimum(tile, nb - 1) * nchunks]
        first_needed = zc0 < jnp.max(tcap)

        @pl.when(first_needed)
        def _():
            dma(0, 0).start()

        def body(carry):
            c, best_t, best_rec = carry
            slot = jax.lax.rem(c, jnp.int32(2))
            nxt = jax.lax.rem(c + jnp.int32(1), jnp.int32(2))

            @pl.when(c + 1 < nchunks)
            def _():
                dma(nxt, c + 1).start()

            dma(slot, c).wait()
            rec = buf[slot]                    # (8, CH)
            cx = rec[0, :][None, :]
            cy = rec[1, :][None, :]
            cz = rec[2, :][None, :]
            r = rec[3, :][None, :]
            ocx = ox - cx                      # (RB, CH)
            ocy = oy - cy
            ocz = oz - cz
            b = ocx * dx + ocy * dy + ocz * dz
            cc = ocx * ocx + ocy * ocy + ocz * ocz - r * r
            disc = b * b - cc
            ok = (disc >= 0.0) & (r > 0.0)
            sq = jnp.sqrt(jnp.where(ok, disc, 0.0))
            t1 = -b - sq
            t2 = -b + sq
            t = jnp.where(t1 > eps, t1, jnp.where(t2 > eps, t2, BIG))
            t = jnp.where(ok, t, BIG)
            tmin = jnp.min(t, axis=1, keepdims=True)       # (RB,1)
            sel = jnp.argmin(t, axis=1).astype(jnp.int32)[:, None]
            better = tmin < best_t
            # winner's record via one-hot contraction (MXU) — keeps the
            # normal/color lookup out of XLA gather land entirely
            lanes = jax.lax.broadcasted_iota(jnp.int32, (RB, CH), 1)
            onehot = jnp.where(lanes == sel, 1.0, 0.0).astype(rec.dtype)
            rec_sel = jax.lax.dot_general(
                onehot, rec, (((1,), (1,)), ((), ())),
                preferred_element_type=rec.dtype,
            )                                              # (RB, 8)
            best_rec = jnp.where(better, rec_sel, best_rec)
            best_t = jnp.where(better, tmin, best_t)
            return c + 1, best_t, best_rec

        init = (
            jnp.int32(0),
            jnp.full((RB, 1), BIG, o_ref.dtype),
            jnp.zeros((RB, 8), o_ref.dtype),
        )
        cf, best_t, best_rec = jax.lax.while_loop(cond, body, init)

        # drain the in-flight DMA the loop started but never consumed
        @pl.when((cf < nchunks) & ((cf > 0) | first_needed))
        def _():
            dma(jax.lax.rem(cf, jnp.int32(2)), jnp.minimum(cf, nchunks - 1)).wait()

        t_out[k, :] = best_t[:, 0]
        rec_out[k, :, :] = best_rec
        return 0

    jax.lax.fori_loop(0, TILE_GROUP, per_tile, 0)


# ---------------------------------------------------------------------------
# shadow kernel — directional-light occlusion over the CSR light grid
# ---------------------------------------------------------------------------
#
# Shadow rays from one screen tile land in a handful of light-grid cells
# (their lateral light-space coords are spatially coherent).  Each cell's
# candidate records are depth-sorted light-side-first, so a window scan from
# the start blocks shadowed rays immediately (the topmost occluder in the
# column) and exits for lit rays as soon as the window's max far-depth key
# drops below the shallowest unblocked ray — no per-ray gathers anywhere:
# every window is a contiguous 128-lane DMA shared by the whole tile.

_SHADOW_W = 128


def _shadow_kernel(
    offs_ref,     # (ncells,) SMEM scalar-prefetch — CSR segment starts
    cnt_ref,      # (ncells,) SMEM — per-cell candidate counts
    uvt_ref,      # (G, RB, 3) VMEM — per-ray (u, v, tau) in light space
    cell_ref,     # (G, RB, 2) VMEM int32 — per-ray (gx, gy) light cells
    lit_ref,      # (G, RB) VMEM int32 — 1 where the ray needs a shadow test
    ldata_hbm,    # (8, CAP) ANY — CSR records [cu, cv, ck, r, key, 0, 0, 0]
    filt_out,     # (G, RB) VMEM out — 1.0 lit, 0.0 blocked
    buf,          # (2, 8, W) VMEM scratch
    sems,         # (2,) DMA semaphores
    *,
    eps: float,
    grid_n: int,
):
    W = _SHADOW_W

    def per_tile(k, _):
        u = uvt_ref[k, :, 0:1]            # (RB, 1)
        v = uvt_ref[k, :, 1:2]
        tau = uvt_ref[k, :, 2:3]
        gx = cell_ref[k, :, 0:1]
        gy = cell_ref[k, :, 1:2]
        lit = lit_ref[k, :][:, None] > 0  # (RB, 1)

        any_lit = jnp.any(lit)
        big = grid_n + 1
        cx0 = jnp.min(jnp.where(lit, gx, big))
        cx1 = jnp.max(jnp.where(lit, gx, -1))
        cy0 = jnp.min(jnp.where(lit, gy, big))
        cy1 = jnp.max(jnp.where(lit, gy, -1))
        nx = jnp.maximum(cx1 - cx0 + 1, 0)
        ny = jnp.maximum(cy1 - cy0 + 1, 0)
        ncell_tile = jnp.where(any_lit, nx * ny, 0)

        def dma(slot, off):
            # CSR segment starts and window strides are 128-multiples by
            # construction; tell Mosaic so the HBM slice is provably tiled
            return pltpu.make_async_copy(
                ldata_hbm.at[:, pl.ds(pl.multiple_of(off, W), W)],
                buf.at[slot],
                sems.at[slot],
            )

        # blocked is carried as f32 {0,1}: boolean (i1) loop carries of this
        # shape fail Mosaic legalization (padded i1 vector yields)
        def cell_body(carry):
            ci, blocked = carry
            dx = jax.lax.rem(ci, jnp.maximum(nx, 1))
            dy = ci // jnp.maximum(nx, 1)
            cell = (cy0 + dy) * grid_n + (cx0 + dx)
            cell = jnp.clip(cell, 0, grid_n * grid_n - 1)
            sel = jnp.where(
                lit & (gx == cx0 + dx) & (gy == cy0 + dy), 1.0, 0.0
            ).astype(blocked.dtype)
            off0 = offs_ref[cell]
            cnt = cnt_ref[cell]
            nw = (cnt + (W - 1)) // W

            def active_tau(blk):
                live = sel * (1.0 - blk) > 0.0
                return jnp.min(jnp.where(live, tau, BIG))

            def wcond(wc):
                w, blk, kmax = wc
                # continue while a selected ray is unblocked and the next
                # window could still contain an occluder above it
                return (
                    (w < nw)
                    & (jnp.max(sel * (1.0 - blk)) > 0.0)
                    & (kmax > active_tau(blk) + eps)
                )

            def wbody(wc):
                w, blk, kmax = wc
                slot = jax.lax.rem(w, jnp.int32(2))
                nxt = jax.lax.rem(w + jnp.int32(1), jnp.int32(2))

                @pl.when(w + 1 < nw)
                def _():
                    dma(nxt, off0 + (w + 1) * W).start()

                dma(slot, off0 + w * W).wait()
                rec = buf[slot]
                cu = rec[0, :][None, :]
                cv = rec[1, :][None, :]
                ck = rec[2, :][None, :]
                r = rec[3, :][None, :]
                du = cu - u
                dv = cv - v
                s2 = r * r - (du * du + dv * dv)
                oksq = s2 > 0.0
                s = jnp.sqrt(jnp.where(oksq, s2, 0.0))
                occ = oksq & (r > 0.0) & (ck + s > tau + eps)
                occf = jnp.max(jnp.where(occ, 1.0, 0.0), axis=1, keepdims=True)
                blk = jnp.maximum(blk, sel * occf.astype(blk.dtype))
                # next window's max key = its first record (descending sort)
                nxt_kmax = rec[4, W - 1]  # lower bound via this window's tail
                return w + 1, blk, nxt_kmax

            kmax0 = jnp.where(cnt > 0, BIG, -BIG)

            @pl.when(cnt > 0)
            def start_first():
                dma(0, off0).start()

            wf, blocked, _ = jax.lax.while_loop(
                wcond, wbody, (jnp.int32(0), blocked, kmax0)
            )

            # drain an in-flight DMA the loop prefetched but never consumed
            @pl.when((wf < nw) & (wf > 0))
            def _():
                dma(jax.lax.rem(wf, jnp.int32(2)), off0 + wf * W).wait()

            @pl.when((wf == 0) & (cnt > 0))
            def _():
                dma(0, off0).wait()

            return ci + 1, blocked

        litf = jnp.where(lit, 1.0, 0.0).astype(uvt_ref.dtype)

        def cell_cond(carry):
            ci, blocked = carry
            return (ci < ncell_tile) & (jnp.max(litf * (1.0 - blocked)) > 0.0)

        blocked0 = jnp.zeros((u.shape[0], 1), uvt_ref.dtype)
        _, blocked = jax.lax.while_loop(
            cell_cond, cell_body, (jnp.int32(0), blocked0)
        )
        filt_out[k, :] = 1.0 - blocked[:, 0]
        return 0

    jax.lax.fori_loop(0, TILE_GROUP, per_tile, 0)


@functools.partial(jax.jit, static_argnames=("grid_n", "eps", "interpret"))
def shadow_filter_tiles(
    uvt, cellxy, lit, ldata, offs, cnt, grid_n: int, eps: float = 4e-4,
    interpret: bool = False,
):
    """Binary shadow transmission for all tiles.

    uvt: (nb, R, 3) per-ray light-space (u, v, tau); cellxy: (nb, R, 2) i32;
    lit: (nb, R) i32 (1 = test me); ldata: (8, CAP) CSR records;
    offs/cnt: (ncells,) i32.  Returns filt (nb, R) in {0.0, 1.0}.
    """
    nb, R, _ = uvt.shape
    G = TILE_GROUP
    nbp = -(-nb // G) * G
    nrb = 1
    for cand_nrb in range(1, max(2, R // 128) + 1):
        if R % cand_nrb == 0 and (R // cand_nrb) % 128 == 0 and R // cand_nrb <= 2048:
            nrb = cand_nrb
            break
    RB = R // nrb
    if RB % 128:
        raise ValueError(f"ray count {R} must be a multiple of 128")
    if nbp != nb:
        padn = nbp - nb
        uvt = jnp.concatenate([uvt, jnp.zeros((padn, R, 3), uvt.dtype)], axis=0)
        cellxy = jnp.concatenate(
            [cellxy, jnp.zeros((padn, R, 2), jnp.int32)], axis=0
        )
        lit = jnp.concatenate([lit, jnp.zeros((padn, R), jnp.int32)], axis=0)
    kernel = functools.partial(_shadow_kernel, eps=eps, grid_n=grid_n)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nbp // G, nrb),
        in_specs=[
            pl.BlockSpec((G, RB, 3), lambda i, j, *_: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, RB, 2), lambda i, j, *_: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, RB), lambda i, j, *_: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[
            pl.BlockSpec((G, RB), lambda i, j, *_: (i, j), memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, 8, _SHADOW_W), uvt.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    (filt,) = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((nbp, R), uvt.dtype)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(offs, cnt, uvt, cellxy, lit, ldata)
    return filt[:nb]


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def closest_hit_spheres_tiles(o, d, tcap, zmin, chunk_data, eps: float = 4e-4, interpret: bool = False):
    """Chunked sphere closest hit over all tiles.

    o, d: (nb, R, 3); tcap: (nb, R); zmin: (nb, nchunks);
    chunk_data: (nb, nchunks, 8, CH).
    Returns best_t (nb, R) and the winner's record (nb, R, 8)
    [cx, cy, cz, r, rgba] (r <= 0 where the ray missed).
    """
    nb, R, _ = o.shape
    nchunks, CH = chunk_data.shape[1], chunk_data.shape[3]
    G = TILE_GROUP
    nbp = -(-nb // G) * G
    # ray blocks: multiple of 128 (lane tiling), small enough for VMEM temps
    nrb = 1
    for cand_nrb in range(1, max(2, R // 128) + 1):
        if R % cand_nrb == 0 and (R // cand_nrb) % 128 == 0 and R // cand_nrb <= 2048:
            nrb = cand_nrb
            break
    RB = R // nrb
    if RB % 128:
        raise ValueError(f"ray count {R} must be a multiple of 128")
    if nbp != nb:
        padn = nbp - nb
        o = jnp.concatenate([o, jnp.zeros((padn, R, 3), o.dtype)], axis=0)
        d = jnp.concatenate([d, jnp.ones((padn, R, 3), d.dtype)], axis=0)
        tcap = jnp.concatenate([tcap, jnp.full((padn, R), -BIG, tcap.dtype)], axis=0)
    kernel = functools.partial(_kernel, eps=eps, nchunks=nchunks, CH=CH, nb=nb)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nbp // G, nrb),
        in_specs=[
            pl.BlockSpec((G, RB, 3), lambda i, j, z: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, RB, 3), lambda i, j, z: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, RB), lambda i, j, z: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[
            pl.BlockSpec((G, RB), lambda i, j, z: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, RB, 8), lambda i, j, z: (i, j, 0), memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, 8, CH), o.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    t, rec = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((nbp, R), o.dtype),
            jax.ShapeDtypeStruct((nbp, R, 8), o.dtype),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(
        zmin.reshape(-1), o, d, tcap, chunk_data
    )
    return t[:nb], rec[:nb]
