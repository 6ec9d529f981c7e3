"""Wigner-Seitz defect analysis: reference-lattice site occupancy.

Parity: reference wigner_seitz_defect.py:66-135 — each atom of the current
(defective) configuration is assigned to its nearest reference-lattice site;
per-site occupancy 0 = vacancy, >1 = interstitial.  The reference uses a
persistent kd-tree (fast_knn.cpp Tree); here the assignment is a cell-grid
nearest-site query (the same machinery as the neighbor engine, query set !=
candidate set).
"""

from __future__ import annotations

import numpy as np

from ..core.box import Box, init_box

__all__ = ["WignerSeitzAnalysis"]


class WignerSeitzAnalysis:
    def __init__(self, ref, affine: bool = False):
        # ref: System or (pos, box)
        if hasattr(ref, "pos"):
            self.ref_pos = ref.pos
            self.ref_box = ref.box
        else:
            self.ref_pos, self.ref_box = ref
        self.ref_pos = np.ascontiguousarray(self.ref_pos, dtype=np.float64)
        self.affine = bool(affine)
        self.occupancy = None
        self.vacancy_number = 0
        self.interstitial_number = 0

    def compute(self, current):
        if hasattr(current, "pos"):
            cur_pos = current.pos
            cur_box = current.box
        else:
            cur_pos, cur_box = current
        cur_pos = np.ascontiguousarray(cur_pos, dtype=np.float64)
        if self.affine:
            map_matrix = np.linalg.solve(cur_box.matrix, self.ref_box.matrix)
            cur_pos = cur_pos @ map_matrix
        site = nearest_site(cur_pos, self.ref_pos, self.ref_box)
        occ = np.zeros(len(self.ref_pos), dtype=np.int32)
        np.add.at(occ, site, 1)
        self.occupancy = occ
        self.vacancy_number = int(np.sum(occ == 0))
        self.interstitial_number = int(np.sum(np.maximum(occ - 1, 0)))
        if hasattr(current, "data"):
            current.data["site_index"] = site.astype(np.int32)
        return self


def nearest_site(query: np.ndarray, sites: np.ndarray, box: Box) -> np.ndarray:
    """Index of the nearest reference site for each query point (PBC-aware)."""
    import jax.numpy as jnp

    from ..neighbor import cell_list as cl
    from ..neighbor.neighbor import replicate_for_small_box

    nsite = len(sites)
    # seed radius: typical nearest-site distance from density
    vol = abs(box.volume)
    rc = 2.0 * (vol / nsite) ** (1.0 / 3.0)
    for _ in range(20):
        sites_c, box_c, n_images = replicate_for_small_box(sites, box, rc)
        ncells = cl.cell_grid_shape(box_c.matrix, rc)
        sj = jnp.asarray(sites_c)
        mj = jnp.asarray(box_c.matrix)
        oj = jnp.asarray(box_c.origin)
        bj = jnp.asarray(box_c.boundary)
        order, _, start, count, mocc = cl.cell_occupancy(sj, mj, oj, bj, ncells)
        # wrap queries into the replicated box frame before the stencil
        qw = box_c.wrap(query)
        verlet, dist, cnt, _ = cl.neighbor_list_fixed(
            sj, mj, oj, bj, rc, ncells, order, start, count, int(mocc),
            max_neigh=1, chunk=65536, exclude_self=False,
            query_pos=jnp.asarray(qw),
        )
        # exclude_self=False drops exact-zero distances; redo with a tiny
        # positive floor by accepting any hit (cnt>0 means found)
        if int(jnp.min(cnt)) >= 1:
            idx = np.asarray(verlet[:, 0])
            return (idx % nsite).astype(np.int64)
        rc *= 1.6
    raise RuntimeError("nearest_site failed to find sites for all atoms")
