"""Shared helpers for analysis kernels: device-side neighbor-list math.

All analysis algorithms consume the same (verlet_list, distance_list,
neighbor_number) contract the neighbor engine produces (-1-padded rows,
distance-ascending), mirroring the reference's per-algorithm C++ kernels.
The helpers here are dtype-polymorphic jnp functions so every analysis runs
in f64 on the CPU backend (golden parity) and f32 on TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "neighbor_disp",
    "valid_mask",
    "min_image_jnp",
    "segment_mean_cols",
]


def min_image_jnp(disp, matrix, inv, boundary):
    """Component-wise fractional minimum image (reference box.h pbc)."""
    frac = disp @ inv
    shift = jnp.round(frac)
    frac = frac - shift * boundary
    return frac @ matrix


def valid_mask(verlet, distance=None, rc=None):
    m = verlet >= 0
    if rc is not None and distance is not None:
        m = m & (distance <= rc)
    return m


def neighbor_disp(pos, verlet, matrix, inv, boundary):
    """(N, M, 3) displacement r_j - r_i minimum-imaged; invalid slots zero."""
    j = jnp.maximum(verlet, 0)
    disp = pos[j] - pos[:, None, :]
    disp = min_image_jnp(disp, matrix, inv, boundary)
    return jnp.where((verlet >= 0)[..., None], disp, 0.0)


def segment_mean_cols(values, labels, num_segments):
    """Per-label mean of values (host helper for small problems)."""
    s = jax.ops.segment_sum(values, labels, num_segments)
    c = jax.ops.segment_sum(jnp.ones_like(values), labels, num_segments)
    return s / jnp.maximum(c, 1)


def box_arrays(box, dtype=jnp.float64):
    m = jnp.asarray(np.asarray(box.matrix), dtype)
    inv = jnp.asarray(np.asarray(box.inverse_box), dtype)
    b = jnp.asarray(np.asarray(box.boundary), dtype)
    return m, inv, b
