"""Lindemann index over a trajectory (global + per-atom, incremental Welford).

Parity: reference src/lindemann.cpp:151-152 + lindemann_parameter.py —
q_ij = sqrt(<r_ij^2> - <r_ij>^2) / <r_ij>, Lindemann index = mean over pairs;
per-frame running values via Welford update so memory stays O(N^2), not
O(frames * N^2).
"""

from __future__ import annotations

import numpy as np

__all__ = ["LindemannParameter"]


class LindemannParameter:
    def __init__(self, pos_list: np.ndarray, only_global: bool = False):
        self.pos_list = np.ascontiguousarray(pos_list, dtype=np.float64)
        assert self.pos_list.ndim == 3
        self.only_global = bool(only_global)
        self.lindemann_frame = None
        self.lindemann_atom = None
        self.lindemann_trj = None

    def compute(self):
        nframe, n, _ = self.pos_list.shape
        mean = np.zeros((n, n))
        m2 = np.zeros((n, n))
        frames = []
        iu = np.triu_indices(n, k=1)
        for f in range(nframe):
            pos = self.pos_list[f]
            diff = pos[:, None, :] - pos[None, :, :]
            rij = np.sqrt(np.sum(diff * diff, axis=2))
            k = f + 1
            delta = rij - mean
            mean += delta / k
            m2 += delta * (rij - mean)
            if k > 1:
                var = m2 / k
                with np.errstate(invalid="ignore", divide="ignore"):
                    q = np.sqrt(var) / mean
                q[~np.isfinite(q)] = 0.0
                frames.append(q[iu].mean())
            else:
                frames.append(0.0)
        self.lindemann_frame = np.array(frames)
        self.lindemann_trj = float(self.lindemann_frame[-1])
        if not self.only_global:
            var = m2 / nframe
            with np.errstate(invalid="ignore", divide="ignore"):
                q = np.sqrt(var) / mean
            q[~np.isfinite(q)] = 0.0
            np.fill_diagonal(q, 0.0)
            self.lindemann_atom = q.sum(axis=1) / (n - 1)
        return self
