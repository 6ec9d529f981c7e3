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

__all__ = ["closest_hit_spheres_tiles", "gather_chunk_data"]


@functools.partial(jax.jit, static_argnames=())
def gather_chunk_data(sph_chunks, centers, radii, colors):
    """(nb, nchunks, CH) ids -> dense (nb, nchunks, 8, CH) candidate records
    [cx, cy, cz, r, rgba] as *rows* so the last (DMA-tiled) dim is CH, which
    is 128-aligned; padded slots get r = -1."""
    ids = jnp.maximum(sph_chunks, 0)
    live = sph_chunks >= 0
    c = centers[ids]                                  # (nb, nchunks, CH, 3)
    r = jnp.where(live, radii[ids], -1.0)[..., None]  # (nb, nchunks, CH, 1)
    col = colors[ids]                                 # (nb, nchunks, CH, 4)
    rec = jnp.concatenate([c, r, col], axis=-1)       # (nb, nchunks, CH, 8)
    return jnp.swapaxes(rec, -1, -2)                  # (nb, nchunks, 8, CH)


def _kernel(
    zmin_ref,     # (nb*nchunks,) SMEM scalar-prefetch — chunk min depths
    o_ref,        # (G, RB, 3) VMEM — ray origins for G tiles
    d_ref,        # (G, RB, 3) VMEM
    tcap_ref,     # (G, RB) VMEM — per-ray early-exit caps
    chunks_hbm,   # (nb, nchunks, 8, CH) ANY/HBM — candidate records
    t_out,        # (G, RB) VMEM out
    id_out,       # (G, RB) VMEM out (chunk*CH + slot, or -1)
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
            c, best_t, best_id = carry
            zc = zmin_ref[jnp.minimum(tile, nb - 1) * nchunks + jnp.minimum(c, nchunks - 1)]
            needed = jnp.max(jnp.minimum(best_t, tcap))
            return (c < nchunks) & (zc < needed)

        zc0 = zmin_ref[jnp.minimum(tile, nb - 1) * nchunks]
        first_needed = zc0 < jnp.max(tcap)

        @pl.when(first_needed)
        def _():
            dma(0, 0).start()

        def body(carry):
            c, best_t, best_id = carry
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
            best_id = jnp.where(better, c * CH + sel, best_id)
            best_t = jnp.where(better, tmin, best_t)
            return c + 1, best_t, best_id

        init = (
            jnp.int32(0),
            jnp.full((RB, 1), BIG, o_ref.dtype),
            jnp.full((RB, 1), -1, jnp.int32),
        )
        cf, best_t, best_id = jax.lax.while_loop(cond, body, init)

        # drain the in-flight DMA the loop started but never consumed
        @pl.when((cf < nchunks) & ((cf > 0) | first_needed))
        def _():
            dma(jax.lax.rem(cf, jnp.int32(2)), jnp.minimum(cf, nchunks - 1)).wait()

        t_out[k, :] = best_t[:, 0]
        id_out[k, :] = best_id[:, 0]
        return 0

    jax.lax.fori_loop(0, TILE_GROUP, per_tile, 0)


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def closest_hit_spheres_tiles(o, d, tcap, zmin, chunk_data, eps: float = 4e-4, interpret: bool = False):
    """Chunked sphere closest hit over all tiles.

    o, d: (nb, R, 3); tcap: (nb, R); zmin: (nb, nchunks);
    chunk_data: (nb, nchunks, 8, CH).
    Returns best_t (nb, R), best_slot (nb, R) flat slot into (nchunks*CH) or -1.
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
            pl.BlockSpec((G, RB), lambda i, j, z: (i, j), memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, 8, CH), o.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    t, sid = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((nbp, R), o.dtype),
            jax.ShapeDtypeStruct((nbp, R), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(
        zmin.reshape(-1), o, d, tcap, chunk_data
    )
    return t[:nb], sid[:nb]
