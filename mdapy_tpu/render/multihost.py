"""Multi-host scale-out: jax.distributed runtime + hierarchical meshes.

The reference ships (but never enables) an MPI layer in its Tachyon engine
(reference extern/tachyon/src/parallel.c:1-628; rt_initialize_nompi at
tachyon_render.h:137).  The TPU-native replacement is the standard JAX
multi-controller model:

* one Python process per host, each seeing its local chips;
  ``init_distributed()`` wires them into one runtime (GRPC coordinator);
* a 2-D ``(hosts, cores)`` mesh — the ``cores`` axis rides ICI inside each
  host/slice, the ``hosts`` axis rides DCN across them;
* the pixel grid is the data-parallel axis: every device owns a horizontal
  band of tile rows (host bands contiguous, so a gathered frame crosses DCN
  once); primitive/CSR tables are replicated per device — sharding them
  only pays past ~50M primitives;
* the training step reduces pixel-loss gradients hierarchically —
  ``psum`` over ``cores`` (ICI) then ``hosts`` (DCN) — and rematerializes
  the forward in row-chunks (``jax.checkpoint`` per chunk) so the backward
  pass is a sequence of independent blocks whose gradient contributions XLA
  can overlap with the collectives.

Single-process (CPU or one chip) the same code runs on a simulated
hierarchy: the local device list is folded into the (hosts, cores) grid —
this is what ``dryrun_multichip`` exercises with 8 virtual CPU devices.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import numpy as np

__all__ = [
    "init_distributed",
    "make_hier_mesh",
    "render_image_mega_hier",
    "render_train_step_hier",
]


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[Sequence[int]] = None,
) -> Tuple[int, int]:
    """Join the multi-host runtime; no-op for single-process runs.

    Arguments fall back to ``MDAPY_COORDINATOR`` / ``MDAPY_NUM_PROCS`` /
    ``MDAPY_PROC_ID`` (and then to JAX's own auto-detection on supported
    cluster environments).  Must run before the first backend touch.
    Returns ``(process_index, process_count)``.
    """
    import jax

    addr = coordinator_address or os.environ.get("MDAPY_COORDINATOR")
    if addr:
        jax.distributed.initialize(
            coordinator_address=addr,
            num_processes=int(
                num_processes or os.environ.get("MDAPY_NUM_PROCS", "1")
            ),
            process_id=int(
                process_id or os.environ.get("MDAPY_PROC_ID", "0")
            ),
            local_device_ids=local_device_ids,
        )
    return jax.process_index(), jax.process_count()


def make_hier_mesh(
    n_hosts: Optional[int] = None,
    cores_per_host: Optional[int] = None,
    axis_names: Tuple[str, str] = ("hosts", "cores"),
):
    """(hosts, cores) mesh with each host's local devices on one row.

    In a real multi-host run ``n_hosts`` defaults to ``jax.process_count()``
    and the row split follows device ownership, putting DCN traffic only on
    the first axis.  Single-process, the local device list is folded to the
    requested shape to *simulate* the hierarchy (the dryrun path).
    """
    import jax
    from jax.sharding import Mesh

    devs = list(jax.devices())
    if n_hosts is None:
        n_hosts = max(jax.process_count(), 1)
    if cores_per_host is None:
        cores_per_host = max(len(devs) // n_hosts, 1)
    need = n_hosts * cores_per_host
    if need > len(devs):
        raise ValueError(
            f"mesh {n_hosts}x{cores_per_host} needs {need} devices, "
            f"have {len(devs)}"
        )
    # group by owning process so rows = hosts when genuinely multi-host
    devs.sort(key=lambda d: (d.process_index, d.id))
    grid = np.array(devs[:need]).reshape(n_hosts, cores_per_host)
    return Mesh(grid, axis_names)


def _band_axes(mesh) -> Tuple:
    """All mesh axes, flattened onto the tile-band dimension."""
    names = tuple(mesh.axis_names)
    return names if len(names) > 1 else (names[0],)


def render_image_mega_hier(
    chunk_data, zmin, ldata, loffs, lcnt, params, seed,
    *,
    S: int, width: int, height: int, tiles_x: int, tiles_y: int,
    grid_n: int, eps: float, perspective: bool, shadows: bool,
    mesh, interpret: bool = False,
    other_data=None, other_count=None, occ_recs=None, n_occ: int = 0,
    extra_lights=None, tile_px: int = 16,
):
    """Megakernel forward over a hierarchical mesh.

    Every device of the flattened (hosts, cores) grid renders one
    horizontal tile band; bands are laid out so a host's bands are
    contiguous rows of the frame (host-local ICI gather first, one DCN hop
    for the cross-host stack).  Scene tables replicate per device.
    """
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from .distributed import shard_map
    from .megakernel import render_image_mega
    TILE_PX = tile_px

    axes = _band_axes(mesh)
    n = int(np.prod(mesh.devices.shape))
    if tiles_y % n != 0:
        raise ValueError(f"tiles_y {tiles_y} not divisible by mesh size {n}")
    rows_t = tiles_y // n
    nb_band = rows_t * tiles_x
    band_h = rows_t * TILE_PX
    params = jnp.asarray(params, jnp.float32)
    band_ids = jnp.arange(n - 1, -1, -1, dtype=jnp.int32).reshape(n, 1)
    has_other = other_data is not None

    def shard_fn(band_id, chunk_b, zmin_b, ocnt_b, other_b, params_r):
        b = band_id[0, 0]
        row0 = (b * band_h).astype(jnp.float32)
        p = params_r.at[3:6].add(row0 * params_r[9:12])
        kw = {}
        if has_other:
            kw = dict(other_data=other_b, other_count=ocnt_b,
                      occ_recs=occ_recs, n_occ=n_occ)
        # distinct AA jitter stream per band (tile ids restart per band)
        return render_image_mega(
            chunk_b, zmin_b, ldata, loffs, lcnt, p, seed + b * 9973,
            S=S, width=width, height=band_h,
            tiles_x=tiles_x, tiles_y=rows_t, grid_n=grid_n, eps=eps,
            perspective=perspective, shadows=shadows, interpret=interpret,
            extra_lights=extra_lights, tile_px=tile_px, **kw,
        )

    rev = np.arange(n - 1, -1, -1)
    sel = (rev[:, None] * nb_band + np.arange(nb_band)[None]).reshape(-1)
    chunk_r = jnp.asarray(chunk_data)[sel]
    zmin_r = jnp.asarray(zmin)[sel]
    ocnt_r = (jnp.asarray(other_count)[sel] if has_other
              else jnp.zeros((n * nb_band,), jnp.int32))
    other_r = (jnp.asarray(other_data)[sel] if has_other
               else jnp.zeros((n * nb_band, 1, 1), jnp.float32))

    fn = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(axes), P(axes), P(axes), P(axes), P(axes), P()),
        out_specs=P(axes),
        check_rep=False,
    )
    img = fn(band_ids, chunk_r, zmin_r, ocnt_r, other_r, params)
    pad_top = tiles_y * TILE_PX - height
    return img[pad_top:] if pad_top else img


def render_train_step_hier(
    scene, frame: dict, target, cfg, width: int, height: int, mesh,
    seed: int = 0, chunk: int = 16384, remat_chunks: int = 1,
):
    """Differentiable pixel-loss step on a hierarchical mesh.

    Each device renders its scanline band; with ``remat_chunks > 1`` the
    band is rendered as a ``lax.scan`` over row chunks wrapped in
    ``jax.checkpoint``, so the backward pass recomputes one chunk at a time
    (bounded memory) and emits its gradient contribution as soon as the
    chunk's backward block retires — the pieces XLA's scheduler overlaps
    with the closing collectives.  Gradients reduce ``psum`` over ``cores``
    (ICI) first, then ``hosts`` (DCN).  Returns (loss, grads) replicated.
    """
    import dataclasses

    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from .distributed import shard_map
    from .tracer import render_image

    axes = _band_axes(mesh)
    n = int(np.prod(mesh.devices.shape))
    if height % n != 0:
        raise ValueError(f"height {height} not divisible by mesh size {n}")
    rows = height // n
    if rows % remat_chunks != 0:
        raise ValueError(f"band rows {rows} not divisible by {remat_chunks}")
    crow = rows // remat_chunks
    perspective = bool(frame["perspective"])
    dtype = jnp.asarray(scene.sph_center).dtype
    cam = {k: jnp.asarray(frame[k], dtype)
           for k in ("origin", "lowleft", "iplaneright", "iplaneup",
                     "view", "light_dir")}
    band_ids = jnp.arange(n - 1, -1, -1, dtype=jnp.int32)

    @jax.checkpoint
    def band_chunk_loss(params, band_id, tgt, ci):
        c, r, col = params
        scene2 = dataclasses.replace(
            scene, sph_center=c, sph_radius=r, sph_color=col
        )
        row0 = band_id * rows + ci * crow
        ll = cam["lowleft"] + row0.astype(dtype) * cam["iplaneup"]
        img = render_image(
            scene2, cam["origin"], ll, cam["iplaneright"],
            cam["iplaneup"], cam["view"], cam["light_dir"],
            cfg, width, crow, perspective,
            seed + band_id * jnp.int32(9973), chunk=chunk,
        )
        # chunk rows count bottom-up in the image plane; the target
        # array is top-down, so chunk ci maps to target slice
        # (remat_chunks - 1 - ci)
        tgt_c = jax.lax.dynamic_slice(
            tgt,
            ((remat_chunks - 1 - ci) * crow, jnp.int32(0), jnp.int32(0)),
            (crow, width, 3),
        )
        return jnp.sum((img - tgt_c) ** 2)

    def band_loss(params, band_id, tgt):
        if remat_chunks == 1:
            total = band_chunk_loss(params, band_id, tgt, jnp.int32(0))
        else:
            def body(acc, ci):
                return acc + band_chunk_loss(params, band_id, tgt, ci), None
            total, _ = jax.lax.scan(
                body, jnp.float32(0.0),
                jnp.arange(remat_chunks, dtype=jnp.int32),
            )
        return total / (rows * width * 3)

    norm = rows * width * 3

    def shard_fn(c, r, col, band_id, tgt):
        if remat_chunks > 1:
            # OVERLAPPED gradient reduction: differentiate and psum each
            # remat chunk INSIDE the scan, so every chunk's collective
            # rides the wire while the next chunk's recompute + backward
            # runs — instead of one all-reduce parked after the last
            # backward block.  loss = sum of chunk losses and the params
            # are shared, so sum-of-chunk-grads == grad-of-sum.
            params0 = (c, r, col)
            bid = band_id[0]

            def chunk_loss_p(params, ci):
                return band_chunk_loss(params, bid, tgt, ci)


            def body(carry, ci):
                lacc, gacc = carry
                l_c, g_c = jax.value_and_grad(chunk_loss_p)(params0, ci)
                for ax in reversed(axes):
                    l_c = jax.lax.pmean(l_c, ax)
                    g_c = jax.tree.map(
                        lambda g, ax=ax: jax.lax.pmean(g, ax), g_c
                    )
                return (lacc + l_c,
                        jax.tree.map(jnp.add, gacc, g_c)), None

            zg = jax.tree.map(jnp.zeros_like, params0)
            (loss, grads), _ = jax.lax.scan(
                body, (jnp.float32(0.0), zg),
                jnp.arange(remat_chunks, dtype=jnp.int32),
            )
            inv = 1.0 / norm
            return loss * inv, jax.tree.map(lambda g: g * inv, grads)
        loss, grads = jax.value_and_grad(band_loss)(
            (c, r, col), band_id[0], tgt
        )
        # hierarchical all-reduce: ICI first, then DCN
        for ax in reversed(axes):
            loss = jax.lax.pmean(loss, ax)
            grads = jax.tree.map(lambda g: jax.lax.pmean(g, ax), grads)
        return loss, grads

    fn = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P(), P(), P(axes), P(axes)),
        out_specs=(P(), (P(), P(), P())),
        check_rep=False,
    )
    return fn(
        jnp.asarray(scene.sph_center), jnp.asarray(scene.sph_radius),
        jnp.asarray(scene.sph_color), band_ids, jnp.asarray(target, dtype),
    )
