"""Exact k-nearest-neighbor search on the cell grid.

The reference uses kd-trees (reference: src/fast_knn.cpp:208-846, knn.py);
TPU favors grid + sort + masked top-k.  Exactness argument: the cell grid is
built with cell span >= rc along every axis, so the 27-cell stencil covers the
full ball of radius rc around any query.  If an atom has >= k candidates
within rc, its k nearest are all inside that ball and the masked top-k is
exact.  The host loop grows rc (density-seeded) until every atom satisfies
the condition — usually a single pass.
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import jax.numpy as jnp
import numpy as np

from ..core.box import Box, init_box
from ..core.frame import AtomFrame
from . import cell_list as cl
from .neighbor import replicate_for_small_box, _next_pow2

__all__ = ["NearestNeighbor", "knn_search"]


def knn_search(
    pos: np.ndarray, box: Box, k: int, rc_initial: Optional[float] = None
) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (indices (N,k) int32, distances (N,k)) sorted ascending.

    Indices refer to original atoms (mod N under small-box replication).
    """
    pos = np.ascontiguousarray(pos, dtype=np.float64)
    n = pos.shape[0]
    if n <= k and not np.any(box.boundary):
        # without periodic images there simply aren't k other atoms
        raise ValueError(f"Need more than k={k} atoms, got {n}")
    if rc_initial is None:
        # density-seeded radius: expected k neighbors in a ball + 45% margin
        # (retry loop below escalates 1.5x on undershoot; 1.45 keeps the
        # candidate width ~30% tighter than the old 1.6 for uniform systems)
        vol = abs(box.volume)
        rc_initial = 1.45 * (3.0 * (k + 1) / (4.0 * np.pi * n / vol)) ** (1.0 / 3.0)
    rc = float(rc_initial)
    for _attempt in range(24):
        pos_c, box_c, n_images = replicate_for_small_box(pos, box, rc)
        ncells = cl.cell_grid_shape(box_c.matrix, rc)
        posj = jnp.asarray(pos_c)
        mj = jnp.asarray(box_c.matrix)
        oj = jnp.asarray(box_c.origin)
        bj = jnp.asarray(box_c.boundary)
        order, sorted_cid, cell_start, cell_count, max_occ = cl.cell_occupancy(
            posj, mj, oj, bj, ncells
        )
        M = int(max_occ)
        verlet, dist, cnt, _ = cl.neighbor_list_auto(
            posj, mj, oj, bj, rc, ncells,
            order, sorted_cid, cell_start, cell_count, M,
            max_neigh=k, chunk=min(65536, _next_pow2(n)),
            n_query=n, n_images=n_images, diagonal=not box_c.triclinic,
        )
        cnt_min = int(jnp.min(cnt))
        if cnt_min >= k:
            verlet = np.asarray(verlet)
            if n_images > 1:
                verlet = (verlet % n).astype(np.int32)
            return verlet, np.asarray(dist)
        rc *= 1.5
    raise RuntimeError("knn_search failed to converge radius (degenerate geometry?)")


class NearestNeighbor:
    """k-NN front-end mirroring the reference API (reference: knn.py:63-129).

    After ``compute()``: ``verlet_list`` (N,k) int32 sorted by distance,
    ``distance_list`` (N,k), ``neighbor_number`` = k for every atom.
    """

    def __init__(self, pos: Union[np.ndarray, AtomFrame], box, k: int) -> None:
        if isinstance(pos, AtomFrame):
            pos = np.column_stack([pos["x"], pos["y"], pos["z"]])
        self.pos = np.ascontiguousarray(pos, dtype=np.float64)
        self.box = init_box(box)
        self.k = int(k)
        self.verlet_list: Optional[np.ndarray] = None
        self.distance_list: Optional[np.ndarray] = None
        self.neighbor_number: Optional[np.ndarray] = None

    def compute(self) -> "NearestNeighbor":
        self.verlet_list, self.distance_list = knn_search(self.pos, self.box, self.k)
        self.neighbor_number = np.full(self.pos.shape[0], self.k, dtype=np.int32)
        return self
