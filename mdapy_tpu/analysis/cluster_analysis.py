"""Connected-component cluster labeling over the neighbor graph.

Parity: reference src/cluster.cpp:154-156 + cluster_analysis.py — clusters of
atoms linked within rc (scalar, or a per-type-pair dict like {'1-1': 1.5}),
1-based labels ordered so cluster 1 is discovered first (we relabel by each
component's minimum atom index to keep deterministic output).

Implementation: the bonded-pair list is built on device (vectorized mask over
the verlet list); the union-find itself runs on host via scipy's
connected_components (an O(E) sparse pass — the reference's serial BFS
equivalent).  A pure-JAX min-label propagation exists for on-device use:
``connected_components_jax``.
"""

from __future__ import annotations

from typing import Dict, Optional, Union

import numpy as np

from ..core.box import init_box
from ..neighbor.neighbor import neighbor_search

__all__ = ["ClusterAnalysis", "connected_components", "connected_components_jax"]


def connected_components(verlet: np.ndarray, bonded_mask: np.ndarray) -> np.ndarray:
    """0-based component labels from a masked neighbor list (host, scipy)."""
    from scipy.sparse import coo_matrix
    from scipy.sparse.csgraph import connected_components as _cc

    n = verlet.shape[0]
    ii, slot = np.nonzero(bonded_mask)
    jj = verlet[ii, slot]
    adj = coo_matrix((np.ones(len(ii)), (ii, jj)), shape=(n, n))
    _, labels = _cc(adj, directed=False)
    return labels


def connected_components_jax(verlet, bonded_mask, max_iters: int = 64):
    """Pure-JAX iterative min-label propagation (device-side alternative)."""
    import jax
    import jax.numpy as jnp

    n, M = verlet.shape
    labels0 = jnp.arange(n, dtype=jnp.int32)
    j = jnp.where(bonded_mask, verlet, 0)

    def body(state):
        labels, _ = state
        neigh = jnp.where(bonded_mask, labels[j], n)
        new = jnp.minimum(labels, jnp.min(neigh, axis=1))
        # pointer-jump for faster convergence
        new = new[new]
        changed = jnp.any(new != labels)
        return new, changed

    def cond(state):
        return state[1]

    labels, _ = jax.lax.while_loop(cond, body, (labels0, jnp.bool_(True)))
    return labels


class ClusterAnalysis:
    def __init__(self, pos, box, rc: Union[float, Dict] = 5.0, types=None, max_neigh=None):
        self.pos = np.ascontiguousarray(pos, dtype=np.float64)
        self.box = init_box(box)
        self.rc = rc
        self.types = None if types is None else np.asarray(types, dtype=np.int32)
        self.max_neigh = max_neigh
        self.particleClusters = None
        self.cluster_number = 0

    def compute(self):
        if np.isscalar(self.rc):
            rmax = float(self.rc)
            cut = None
        else:
            # dict {'1-1': 1.5} or {(1,1): 1.5}
            if self.types is None:
                raise ValueError("Per-type-pair cutoffs require a type array")
            ntypes = int(self.types.max())
            cut = np.zeros((ntypes, ntypes))
            for key, val in self.rc.items():
                a, b = key if isinstance(key, tuple) else key.split("-")
                cut[int(a) - 1, int(b) - 1] = cut[int(b) - 1, int(a) - 1] = float(val)
            rmax = float(cut.max())
        verlet, dist, nn = neighbor_search(self.pos, self.box, rmax, self.max_neigh)
        valid = verlet >= 0
        if cut is None:
            bonded = valid & (dist <= rmax)
        else:
            j = np.where(valid, verlet, 0)
            pair_rc = cut[self.types[:, None] - 1, self.types[j] - 1]
            bonded = valid & (dist <= pair_rc)
        labels = connected_components(verlet, bonded)
        # deterministic 1-based relabeling by first-occurrence order
        order = np.full(labels.max() + 1, -1, dtype=np.int64)
        nxt = 0
        out = np.empty_like(labels)
        for i, lab in enumerate(labels):
            if order[lab] < 0:
                order[lab] = nxt
                nxt += 1
            out[i] = order[lab]
        self.particleClusters = (out + 1).astype(np.int32)
        self.cluster_number = int(nxt)
        return self

    def get_size_of_cluster(self, cluster_id: int) -> int:
        return int(np.sum(self.particleClusters == cluster_id))
