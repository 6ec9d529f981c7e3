"""Centro-symmetry parameter (Kelchner et al.).

Parity: reference src/centro_symmetry_parameter.cpp:12-98 — for each atom
take its N nearest neighbors, form all N(N-1)/2 pair sums r_ij + r_ik, and
sum the N/2 smallest squared norms.

TPU shape: vmapped dense (M, M, 3) pair sums + masked top-k — no sorting
kernels, no per-atom loops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core.box import init_box
from ..neighbor.knn import knn_search
from .common import box_arrays, min_image_jnp

__all__ = ["CentroSymmetryParameter", "csp_from_neighbors"]


def csp_from_neighbors(pos, verlet, matrix, inv, boundary, N: int):
    """csp (n,) from the first N columns of a kNN verlet list."""
    pos = jnp.asarray(pos)
    verlet = jnp.asarray(verlet[:, :N])
    j = jnp.maximum(verlet, 0)
    disp = pos[j] - pos[:, None, :]
    disp = min_image_jnp(disp, matrix, inv, boundary)        # (n, N, 3)
    pair = disp[:, :, None, :] + disp[:, None, :, :]         # (n, N, N, 3)
    d2 = jnp.sum(pair * pair, axis=-1)                       # (n, N, N)
    iu, ju = jnp.triu_indices(N, k=1)
    vals = d2[:, iu, ju]                                     # (n, N(N-1)/2)
    half = N // 2
    neg_top, _ = jax.lax.top_k(-vals, half)
    return jnp.sum(-neg_top, axis=1)


class CentroSymmetryParameter:
    """API parity: reference centro_symmetry_parameter.py."""

    def __init__(self, pos, box, N: int = 12):
        if N % 2 != 0 or N <= 0:
            raise ValueError("N must be a positive even number")
        self.pos = np.ascontiguousarray(pos, dtype=np.float64)
        self.box = init_box(box)
        self.N = int(N)
        self.csp = None

    def compute(self):
        verlet, _ = knn_search(self.pos, self.box, self.N)
        m, inv, b = box_arrays(self.box, jnp.asarray(self.pos).dtype)
        self.csp = np.asarray(
            csp_from_neighbors(self.pos, verlet, m, inv, b, self.N)
        )
        return self
