"""Warren-Cowley short-range-order parameter matrix.

Parity: reference src/warren_cowley_parameter.cpp:10-86 + warren_cowley_parameter.py —
alpha_ab = 1 - P(b | neighbor of a) / c_b, computed from the neighbor list.
"""

from __future__ import annotations

import numpy as np

__all__ = ["WarrenCowleyParameter"]


class WarrenCowleyParameter:
    def __init__(self, types, verlet_list, neighbor_number, elements=None):
        self.types = np.asarray(types, dtype=np.int64)
        self.verlet_list = np.asarray(verlet_list)
        self.neighbor_number = np.asarray(neighbor_number)
        labels = self.types if elements is None else np.asarray(elements)
        self._labels = labels
        uniq = sorted(set(labels.tolist()))
        self.elements = list(uniq)
        self.Ntype = len(uniq)
        lut = {l: i for i, l in enumerate(uniq)}
        self.type_idx = np.array([lut[l] for l in labels.tolist()], dtype=np.int64)
        self.wcp = None

    def compute(self):
        n = len(self.type_idx)
        nt = self.Ntype
        valid = self.verlet_list >= 0
        j = np.where(valid, self.verlet_list, 0)
        ti = np.repeat(self.type_idx[:, None], self.verlet_list.shape[1], axis=1)
        tj = self.type_idx[j]
        pair_counts = np.zeros((nt, nt), dtype=np.float64)
        np.add.at(pair_counts, (ti[valid], tj[valid]), 1.0)
        conc = np.bincount(self.type_idx, minlength=nt) / n
        # probability of a b-neighbor around an a-atom
        tot_a = pair_counts.sum(axis=1)
        with np.errstate(invalid="ignore", divide="ignore"):
            p = pair_counts / tot_a[:, None]
            alpha = 1.0 - p / conc[None, :]
        alpha[~np.isfinite(alpha)] = 0.0
        self.wcp = alpha
        self.WCP = alpha  # reference-API name (warren_cowley_parameter.py:193)
        return self

    def plot(self, fig=None, ax=None):
        import matplotlib.pyplot as plt

        if fig is None and ax is None:
            fig, ax = plt.subplots()
        im = ax.imshow(self.wcp, cmap="coolwarm")
        ax.set_xticks(range(self.Ntype))
        ax.set_yticks(range(self.Ntype))
        ax.set_xticklabels([str(e) for e in self.elements])
        ax.set_yticklabels([str(e) for e in self.elements])
        plt.colorbar(im, ax=ax)
        return fig, ax
