"""Vectorized common-neighbor-analysis signature machinery.

Replaces the reference's per-atom bitmask graph walk (src/cna.cpp:20-160:
NeighborBondArray, findCommonNeighbors, findNeighborBonds,
calcMaxChainLength) with dense boolean tensors + label-propagation connected
components over the <=14-node common-neighbor bond graph — the same
signatures, computed as (atoms, ni, nn, nn) batched ops.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["bond_matrix", "cna_signatures"]


def bond_matrix(pos, verlet, nn, matrix, inv, boundary, cutoff_sq):
    """(n, nn, nn) bool: are neighbors ni1, ni2 of each atom bonded?

    cutoff_sq may be scalar or per-atom (n,)."""
    j = jnp.maximum(verlet[:, :nn], 0)
    pj = pos[j]                                   # (n, nn, 3)
    disp = pj[:, :, None, :] - pj[:, None, :, :]  # (n, nn, nn, 3)
    frac = disp @ inv
    frac = frac - jnp.round(frac) * boundary
    disp = frac @ matrix
    d2 = jnp.sum(disp * disp, axis=-1)
    if jnp.ndim(cutoff_sq) > 0:
        cut = cutoff_sq[:, None, None]
    else:
        cut = cutoff_sq
    bonded = d2 <= cut
    eye = jnp.eye(nn, dtype=bool)
    return bonded & ~eye[None]


def _max_chain_length(B, cn):
    """Max number of bonds in a connected component of the common-neighbor
    bond graph.  B: (..., nn, nn) bonds among common neighbors (symmetric),
    cn: (..., nn) common-neighbor mask."""
    nn = B.shape[-1]
    node_ids = jnp.arange(nn, dtype=jnp.int32)
    labels = jnp.where(cn, node_ids, nn)          # isolated label for non-CN
    # only nodes参与 that have at least one bond matter for bond counting
    def prop(_, labels):
        nl = jnp.where(B, labels[..., None, :], nn)  # labels of adjacent nodes
        best = jnp.min(nl, axis=-1)
        return jnp.minimum(labels, best)

    labels = jax.lax.fori_loop(0, nn, prop, labels)
    # count bonds per component root: bond (p,q) belongs to root labels[p]
    iu, ju = jnp.triu_indices(nn, k=1)
    bond_mask = B[..., iu, ju]                     # (..., nb)
    bond_root = labels[..., iu]                    # (..., nb)
    onehot = (bond_root[..., None] == node_ids) & bond_mask[..., None]
    counts = jnp.sum(onehot, axis=-2)              # (..., nn) bonds per root
    return jnp.max(counts, axis=-1)


@functools.partial(jax.jit, static_argnames=("nn",))
def cna_signatures(bonded, nn: int):
    """Per (atom, neighbor ni): (numCommonNeighbors, numNeighborBonds,
    maxChainLength) — the CNA triplet signature.

    bonded: (n, nn, nn) bool."""
    cn = bonded                                    # cn[i, ni, :] = common nbrs of (i, ni)
    ncn = jnp.sum(cn, axis=-1)                     # (n, nn)
    # bonds among common neighbors, per ni
    B = (
        bonded[:, None, :, :]
        & cn[:, :, :, None]
        & cn[:, :, None, :]
    )                                              # (n, ni, nn, nn)
    iu, ju = jnp.triu_indices(nn, k=1)
    nbonds = jnp.sum(B[..., iu, ju], axis=-1)      # (n, ni)
    maxchain = _max_chain_length(B, cn[:, :, :])   # cn per ni: (n, ni, nn)
    return ncn, nbonds, maxchain
