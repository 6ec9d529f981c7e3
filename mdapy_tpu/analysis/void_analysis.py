"""Void detection via empty-cell-grid filling + clustering.

Parity: reference void_analysis.py:44-116 + src/neighbor.cpp:780
(_fill_cell_for_void) — overlay a grid of cell size rc, mark cells with no
atoms, cluster adjacent empty cells; void_number = cluster count,
void_volume = n_empty_cells * rc^3.
"""

from __future__ import annotations

import numpy as np

__all__ = ["VoidAnalysis"]


class VoidAnalysis:
    def __init__(self, system, rc: float = 5.0):
        self.system = system
        self.rc = float(rc)
        self.void_number = 0
        self.void_volume = 0.0

    def compute(self):
        box = self.system.box
        pos = self.system.pos
        frac = (pos - box.origin) @ box.inverse_box
        per = box.boundary.astype(bool)
        frac = np.where(per, frac - np.floor(frac), frac)
        thickness = box.get_thickness()
        nc = np.maximum(1, (thickness / self.rc).astype(int))
        idx = np.clip((frac * nc).astype(int), 0, nc - 1)
        flat = (idx[:, 0] * nc[1] + idx[:, 1]) * nc[2] + idx[:, 2]
        filled = np.zeros(int(np.prod(nc)), dtype=bool)
        filled[flat] = True
        empty = ~filled.reshape(nc)
        n_empty = int(empty.sum())
        if n_empty == 0:
            self.void_number = 0
            self.void_volume = 0.0
            return self
        # cluster adjacent empty cells (6-connectivity with periodic wrap)
        from scipy.sparse import coo_matrix
        from scipy.sparse.csgraph import connected_components

        cells = np.argwhere(empty)
        cell_id = -np.ones(nc, dtype=np.int64)
        cell_id[tuple(cells.T)] = np.arange(len(cells))
        rows, cols = [], []
        for axis in range(3):
            for sgn in (1, -1):
                shifted = cells.copy()
                shifted[:, axis] += sgn
                if per[axis]:
                    shifted[:, axis] %= nc[axis]
                ok = (shifted[:, axis] >= 0) & (shifted[:, axis] < nc[axis])
                nb = cell_id[tuple(shifted[ok].T)]
                src = np.arange(len(cells))[ok]
                good = nb >= 0
                rows.append(src[good])
                cols.append(nb[good])
        rows = np.concatenate(rows) if rows else np.array([], dtype=int)
        cols = np.concatenate(cols) if cols else np.array([], dtype=int)
        adj = coo_matrix(
            (np.ones(len(rows)), (rows, cols)), shape=(len(cells), len(cells))
        )
        ncomp, labels = connected_components(adj, directed=False)
        self.void_number = int(ncomp)
        self.void_volume = float(n_empty * self.rc**3)
        self.void_labels = labels
        return self
