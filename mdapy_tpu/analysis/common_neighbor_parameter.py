"""Common neighbor parameter (Tsuzuki/Branicio/Rino).

Parity: reference src/common_neighbor_parameter.cpp:10-141 —
cnp_i = (1/N_i) * sum_{j in nb(i)} | sum_{k in cn(i,j)} (r_ik + r_jk) |^2
with common neighbors limited to pairs within rc; atoms with no neighbor
get 1000.0.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core.box import init_box
from .common import box_arrays, min_image_jnp

__all__ = ["CommonNeighborParameter", "cnp_from_neighbors"]


@functools.partial(jax.jit, static_argnames=())
def cnp_from_neighbors(pos, verlet, dist, matrix, inv, boundary, rc):
    pos = jnp.asarray(pos)
    n, M = verlet.shape
    ok = (verlet >= 0) & (dist <= rc)                        # (n, M)
    j = jnp.maximum(verlet, 0)
    # membership: is verlet[j][s] also a neighbor of i (within rc both ways)?
    vj = verlet[j]                                           # (n, M, M) neighbors of each j
    dj = dist[j]
    okj = ok[j]                                              # validity of j's slots
    # common[h, s]: verlet[i, h] == verlet[j, s]
    same = verlet[:, None, :, None] == vj[:, :, None, :]     # (n, M, M, M) i-slot h vs j-slot s
    both = ok[:, None, :, None] & okj[:, :, None, :] & same
    # k position for each j-slot s
    k = jnp.maximum(vj, 0)                                   # (n, M, M)
    r_ik = pos[k] - pos[:, None, None, :]                    # (n, M, M, 3)
    r_ik = min_image_jnp(r_ik, matrix, inv, boundary)
    r_jk = pos[k] - pos[j][:, :, None, :]
    r_jk = min_image_jnp(r_jk, matrix, inv, boundary)
    contrib = -(r_ik + r_jk)                                 # reference uses r_i - r_k etc.
    w = jnp.any(both, axis=2)                                # (n, M, M): j-slot s is common
    R = jnp.sum(jnp.where(w[..., None], contrib, 0.0), axis=2)  # (n, M, 3)
    r2 = jnp.sum(R * R, axis=-1)                             # (n, M)
    Ncnt = jnp.sum(ok, axis=1)
    cnp = jnp.sum(jnp.where(ok, r2, 0.0), axis=1) / jnp.maximum(Ncnt, 1)
    return jnp.where(Ncnt > 0, cnp, 1000.0)


class CommonNeighborParameter:
    """API parity: reference common_neighbor_parameter.py."""

    def __init__(self, pos, box, rc, verlet_list, distance_list, neighbor_number):
        self.pos = np.ascontiguousarray(pos, dtype=np.float64)
        self.box = init_box(box)
        self.rc = float(rc)
        self.verlet_list = verlet_list
        self.distance_list = distance_list
        self.neighbor_number = neighbor_number
        self.cnp = None

    def compute(self):
        m, inv, b = box_arrays(self.box, jnp.asarray(self.pos).dtype)
        n = len(self.pos)
        # chunk over atoms: the (n, M, M, M) mask is memory-hungry
        M = self.verlet_list.shape[1]
        chunk = max(1, min(n, int(2e8 // max(M**3, 1))))
        out = []
        vl = jnp.asarray(self.verlet_list)
        dl = jnp.asarray(self.distance_list)
        pos = jnp.asarray(self.pos)
        for s in range(0, n, chunk):
            e = min(n, s + chunk)
            out.append(
                _cnp_chunk(pos, vl, dl, m, inv, b, self.rc, s, e - s)
            )
        self.cnp = np.concatenate([np.asarray(o) for o in out])
        return self


@functools.partial(jax.jit, static_argnames=("count",))
def _cnp_chunk(pos, verlet, dist, matrix, inv, boundary, rc, start, count: int):
    vl = jax.lax.dynamic_slice_in_dim(verlet, start, count, 0)
    dl = jax.lax.dynamic_slice_in_dim(dist, start, count, 0)
    posn = jax.lax.dynamic_slice_in_dim(pos, start, count, 0)
    n, M = vl.shape
    ok = (vl >= 0) & (dl <= rc)
    j = jnp.maximum(vl, 0)
    vj = verlet[j]
    dj = dist[j]
    okj = (vj >= 0) & (dj <= rc)
    same = vl[:, None, :, None] == vj[:, :, None, :]
    both = ok[:, None, :, None] & okj[:, :, None, :] & same
    k = jnp.maximum(vj, 0)
    r_ik = posn[:, None, None, :] - pos[k]
    r_ik = min_image_jnp(r_ik, matrix, inv, boundary)
    r_jk = pos[j][:, :, None, :] - pos[k]
    r_jk = min_image_jnp(r_jk, matrix, inv, boundary)
    contrib = r_ik + r_jk
    w = jnp.any(both, axis=2)
    R = jnp.sum(jnp.where(w[..., None], contrib, 0.0), axis=2)
    r2 = jnp.sum(R * R, axis=-1)
    Ncnt = jnp.sum(ok, axis=1)
    cnp = jnp.sum(jnp.where(ok, r2, 0.0), axis=1) / jnp.maximum(Ncnt, 1)
    return jnp.where(Ncnt > 0, cnp, 1000.0)
