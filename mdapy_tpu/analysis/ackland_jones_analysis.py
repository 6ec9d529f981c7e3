"""Ackland-Jones bond-angle analysis (0=Other, 1=FCC, 2=HCP, 3=BCC, 4=ICO).

Parity: reference src/ackland_jones_analysis.cpp:12-177 — chi histogram over
the 8 canonical cos(theta) intervals for pairs of the N0 nearest neighbors
(N0/N1 from the 1.45/1.55 * <r^2 of 6 NN> shells), then the published
delta_cp/bcc/fcc/hcp decision tree.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core.box import init_box
from ..neighbor.knn import knn_search
from .common import box_arrays, min_image_jnp

__all__ = ["AcklandJonesAnalysis"]


class AcklandJonesAnalysis:
    def __init__(self, pos, box):
        self.pos = np.ascontiguousarray(pos, dtype=np.float64)
        self.box = init_box(box)
        self.aja = None

    def compute(self):
        verlet, dist = knn_search(self.pos, self.box, 14)
        m, inv, b = box_arrays(self.box, jnp.float64)
        self.aja = np.asarray(
            _aja(jnp.asarray(self.pos), jnp.asarray(verlet), jnp.asarray(dist), m, inv, b)
        )
        return self


@jax.jit
def _aja(pos, verlet, dist, matrix, inv, boundary):
    n = pos.shape[0]
    d2 = dist * dist                                   # (n, 14)
    r0_sq = jnp.mean(d2[:, :6], axis=1)
    N1 = jnp.sum(d2 < (1.55 * r0_sq)[:, None], axis=1)
    N0 = jnp.sum(d2 < (1.45 * r0_sq)[:, None], axis=1)

    j = jnp.maximum(verlet, 0)
    disp = pos[j] - pos[:, None, :]
    disp = min_image_jnp(disp, matrix, inv, boundary)
    unit = disp / jnp.maximum(dist, 1e-30)[..., None]
    cosang = jnp.einsum("imx,inx->imn", unit, unit)    # (n, 14, 14)
    mm = jnp.arange(14)
    pair_ok = (
        (mm[None, :, None] < mm[None, None, :])
        & (mm[None, :, None] < N0[:, None, None])
        & (mm[None, None, :] < N0[:, None, None])
    )
    edges = jnp.array([-0.945, -0.915, -0.755, -0.195, 0.195, 0.245, 0.795])
    bin_idx = jnp.sum(cosang[..., None] >= edges, axis=-1)  # 0..7
    alpha = jnp.stack(
        [jnp.sum(pair_ok & (bin_idx == k), axis=(1, 2)) for k in range(8)], axis=1
    ).astype(jnp.float64)

    sigma_cp = jnp.abs(1.0 - alpha[:, 6] / 24.0)
    s56m4 = alpha[:, 5] + alpha[:, 6] - alpha[:, 4]
    sigma_bcc = jnp.where(
        s56m4 != 0, 0.35 * alpha[:, 4] / s56m4, sigma_cp + 1.0
    )
    sigma_fcc = 0.61 * (jnp.abs(alpha[:, 0] + alpha[:, 1] - 6) + alpha[:, 2]) / 6.0
    sigma_hcp = (
        jnp.abs(alpha[:, 0] - 3.0)
        + jnp.abs(alpha[:, 0] + alpha[:, 1] + alpha[:, 2] + alpha[:, 3] - 9)
    ) / 12.0
    sigma_bcc = jnp.where(alpha[:, 0] == 7, 0.0, sigma_bcc)
    sigma_fcc = jnp.where(alpha[:, 0] == 6, 0.0, sigma_fcc)
    sigma_hcp = jnp.where(alpha[:, 0] <= 3, 0.0, sigma_hcp)

    out = jnp.where(sigma_fcc < sigma_hcp, 1, 2)
    out = jnp.where((N1 > 12) | (N1 < 11), 0, out)
    out = jnp.where(sigma_bcc <= sigma_cp, jnp.where(N1 < 11, 0, 3), out)
    out = jnp.where(alpha[:, 4] < 3, jnp.where((N1 > 13) | (N1 < 11), 0, 4), out)
    out = jnp.where(alpha[:, 7] > 0, 0, out)
    return out.astype(jnp.int32)
