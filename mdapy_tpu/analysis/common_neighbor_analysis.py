"""Adaptive & fixed-cutoff Common Neighbor Analysis.

Parity: reference src/cna.cpp:289-510 (AdaptiveCNA / FixedCNA) +
common_neighbor_analysis.py — labels 0=Other, 1=FCC, 2=HCP, 3=BCC, 4=ICO.
Adaptive mode: per-atom cutoff (1+sqrt2)/2 * mean(d of 12 NN) for the
fcc/hcp/ico test, then a 14-neighbor bcc test with the reference's
sqrt(4/3)-weighted first-shell average.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core.box import init_box
from ..neighbor.knn import knn_search
from ..neighbor.neighbor import neighbor_search
from .cna_core import bond_matrix, cna_signatures
from .common import box_arrays

__all__ = ["CommonNeighborAnalysis"]

OTHER, FCC, HCP, BCC, ICO = 0, 1, 2, 3, 4


class CommonNeighborAnalysis:
    def __init__(self, pos, box, rc=None):
        self.pos = np.ascontiguousarray(pos, dtype=np.float64)
        self.box = init_box(box)
        self.rc = rc
        self.cna = None

    def compute(self):
        n = len(self.pos)
        m, inv, b = box_arrays(self.box, jnp.float64)
        pos = jnp.asarray(self.pos)
        if self.rc is None:
            verlet, dist = knn_search(self.pos, self.box, 14)
            out = np.empty(n, dtype=np.int32)
            chunk = max(1, int(4e8 // (14 * 14 * 14)))
            for s in range(0, n, chunk):
                e = min(n, s + chunk)
                out[s:e] = np.asarray(
                    _acna_chunk(pos, jnp.asarray(verlet), jnp.asarray(dist),
                                m, inv, b, s, e - s)
                )
            self.cna = out
        else:
            verlet, dist, nn = neighbor_search(self.pos, self.box, float(self.rc))
            # fixed CNA requires exactly 12 or 14 neighbors; pad to >=14 cols
            M = max(14, verlet.shape[1])
            vl = np.full((n, M), -1, dtype=np.int32)
            vl[:, : verlet.shape[1]] = verlet
            out = np.empty(n, dtype=np.int32)
            chunk = max(1, int(4e8 // (M * M * M)))
            for s in range(0, n, chunk):
                e = min(n, s + chunk)
                out[s:e] = np.asarray(
                    _fcna_chunk(pos, jnp.asarray(vl), jnp.asarray(nn),
                                m, inv, b, float(self.rc) ** 2, s, e - s)
                )
            self.cna = out
        return self


def _pbc_dist(pos, i_pos, j, matrix, inv, boundary):
    disp = pos[j] - i_pos[:, None, :]
    frac = disp @ inv
    frac = frac - jnp.round(frac) * boundary
    disp = frac @ matrix
    return jnp.linalg.norm(disp, axis=-1)


@functools.partial(jax.jit, static_argnames=("count",))
def _acna_chunk(pos, verlet, dist, matrix, inv, boundary, start, count: int):
    vl = jax.lax.dynamic_slice_in_dim(verlet, start, count, 0)
    posn = jax.lax.dynamic_slice_in_dim(pos, start, count, 0)
    d = _pbc_dist(pos, posn, jnp.maximum(vl[:, :14], 0), matrix, inv, boundary)

    # fcc/hcp/ico pass: 12 neighbors
    rc12 = jnp.mean(d[:, :12], axis=1) * (1.0 + jnp.sqrt(2.0)) * 0.5
    bonded12 = bond_matrix(pos, vl, 12, matrix, inv, boundary, rc12**2)
    ncn, nb, mc = cna_signatures(bonded12, 12)
    s421 = (ncn == 4) & (nb == 2) & (mc == 1)
    s422 = (ncn == 4) & (nb == 2) & (mc == 2)
    s555 = (ncn == 5) & (nb == 5) & (mc == 5)
    n421 = jnp.sum(s421, axis=1)
    n422 = jnp.sum(s422, axis=1)
    n555 = jnp.sum(s555, axis=1)
    pattern = jnp.where(
        n421 == 12, FCC,
        jnp.where((n421 == 6) & (n422 == 6), HCP, jnp.where(n555 == 12, ICO, OTHER)),
    )

    # bcc pass: 14 neighbors, first 8 distances scaled by sqrt(4/3)
    w = jnp.concatenate([
        jnp.full(8, jnp.sqrt(4.0 / 3.0), d.dtype), jnp.ones(6, d.dtype)
    ])
    rc14 = jnp.sum(d * w[None, :], axis=1) / 14.0 * (1.0 + jnp.sqrt(2.0)) * 0.5
    bonded14 = bond_matrix(pos, vl, 14, matrix, inv, boundary, rc14**2)
    ncn14, nb14, mc14 = cna_signatures(bonded14, 14)
    s444 = (ncn14 == 4) & (nb14 == 4) & (mc14 == 4)
    s666 = (ncn14 == 6) & (nb14 == 6) & (mc14 == 6)
    is_bcc = (jnp.sum(s666, axis=1) == 8) & (jnp.sum(s444, axis=1) == 6)
    return jnp.where((pattern == OTHER) & is_bcc, BCC, pattern).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("count",))
def _fcna_chunk(pos, verlet, nn_count, matrix, inv, boundary, rc_sq, start, count: int):
    vl = jax.lax.dynamic_slice_in_dim(verlet, start, count, 0)
    nnc = jax.lax.dynamic_slice_in_dim(nn_count, start, count, 0)
    M = vl.shape[1]
    bonded = bond_matrix(pos, vl, M, matrix, inv, boundary, rc_sq)
    # mask out slots beyond each atom's neighbor count
    slot = jnp.arange(M)
    ok = slot[None, :] < nnc[:, None]
    bonded = bonded & ok[:, :, None] & ok[:, None, :]
    ncn, nb, mc = cna_signatures(bonded, M)
    valid_ni = ok
    s421 = valid_ni & (ncn == 4) & (nb == 2) & (mc == 1)
    s422 = valid_ni & (ncn == 4) & (nb == 2) & (mc == 2)
    s555 = valid_ni & (ncn == 5) & (nb == 5) & (mc == 5)
    s444 = valid_ni & (ncn == 4) & (nb == 4) & (mc == 4)
    s666 = valid_ni & (ncn == 6) & (nb == 6) & (mc == 6)
    n421 = jnp.sum(s421, axis=1)
    n422 = jnp.sum(s422, axis=1)
    n555 = jnp.sum(s555, axis=1)
    n444 = jnp.sum(s444, axis=1)
    n666 = jnp.sum(s666, axis=1)
    usable = (nnc == 12) | (nnc == 14)
    pattern = jnp.where(
        n421 == 12, FCC,
        jnp.where(
            (n421 == 6) & (n422 == 6), HCP,
            jnp.where(n555 == 12, ICO,
                      jnp.where((n666 == 8) & (n444 == 6), BCC, OTHER)),
        ),
    )
    return jnp.where(usable, pattern, OTHER).astype(jnp.int32)
