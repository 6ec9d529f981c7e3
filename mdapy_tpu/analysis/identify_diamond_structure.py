"""Identify cubic/hexagonal diamond structure.

Parity: reference src/cna.cpp:163-287 (IdentifyDiamond) — build a 12-neighbor
list from the 3 non-self neighbors of each of the 4 nearest neighbors, run
the fcc/hcp CNA signature on it with cutoff 1.2071068 * mean distance, then
propagate 1st/2nd-neighbor labels:
0=Other, 1=CubicDiamond, 2/3=cubic 1st/2nd-neighbor, 4=HexDiamond,
5/6=hex 1st/2nd-neighbor.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core.box import init_box
from ..neighbor.knn import knn_search
from .cna_core import bond_matrix, cna_signatures
from .common import box_arrays

__all__ = ["IdentifyDiamondStructure"]


class IdentifyDiamondStructure:
    def __init__(self, pos, box):
        self.pos = np.ascontiguousarray(pos, dtype=np.float64)
        self.box = init_box(box)
        self.ids = None

    def compute(self):
        verlet, dist = knn_search(self.pos, self.box, 4)
        m, inv, b = box_arrays(self.box, jnp.float64)
        core = np.asarray(
            _ids_core(jnp.asarray(self.pos), jnp.asarray(verlet), m, inv, b)
        )
        # label propagation (host; two sequential passes like cna.cpp:254-287)
        pattern = core.copy()
        v = np.asarray(verlet)
        for src, dst in ((1, 2), (4, 5)):
            hits = np.nonzero(pattern == src)[0]
            for i in hits:
                for j in v[i, :4]:
                    if pattern[j] == 0:
                        pattern[j] = dst
        for src, dst in ((2, 3), (5, 6)):
            hits = np.nonzero(pattern == src)[0]
            for i in hits:
                for j in v[i, :4]:
                    if pattern[j] == 0:
                        pattern[j] = dst
        self.ids = pattern.astype(np.int32)
        return self


@jax.jit
def _ids_core(pos, verlet, matrix, inv, boundary):
    n = pos.shape[0]
    # second-shell 12-list: 3 non-self neighbors of each of the 4 NN,
    # replicating the reference's slot-filling order (cna.cpp:186-202)
    first = verlet[:, :4]                               # (n, 4)
    j4 = jnp.maximum(first, 0)
    nb_of_nb = verlet[j4][:, :, :4]                     # (n, 4, 4)
    self_idx = jnp.arange(n)[:, None, None]
    not_self = nb_of_nb != self_idx
    # take first 3 non-self per neighbor
    order = jnp.argsort(~not_self, axis=2, stable=True) # non-self first
    picked = jnp.take_along_axis(nb_of_nb, order[:, :, :3], axis=2)
    new_verlet = picked.reshape(n, 12)

    disp = pos[new_verlet] - pos[:, None, :]
    frac = disp @ inv
    frac = frac - jnp.round(frac) * boundary
    disp = frac @ matrix
    d = jnp.linalg.norm(disp, axis=-1)
    rc = jnp.mean(d, axis=1) * 1.2071068
    bonded = bond_matrix(pos, new_verlet, 12, matrix, inv, boundary, rc**2)
    ncn, nb, mc = cna_signatures(bonded, 12)
    s421 = (ncn == 4) & (nb == 2) & (mc == 1)
    s422 = (ncn == 4) & (nb == 2) & (mc == 2)
    n421 = jnp.sum(s421, axis=1)
    n422 = jnp.sum(s422, axis=1)
    return jnp.where(
        n421 == 12, 1, jnp.where((n421 == 6) & (n422 == 6), 4, 0)
    ).astype(jnp.int32)
