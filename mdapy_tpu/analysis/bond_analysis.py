"""Bond-length and bond-angle histograms.

Parity: reference src/bond_analysis.cpp:10-283 — lengths: unique pairs
(j > i) within rc binned by floor(r/dr); angles: all neighbor pairs (jj<kk)
of each center, theta = acos(cos) in degrees binned by floor(theta/dtheta),
nbins shared.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core.box import init_box
from .common import box_arrays, min_image_jnp

__all__ = ["BondAnalysis"]


class BondAnalysis:
    def __init__(self, pos, box, rc, nbin, verlet_list, distance_list, neighbor_number):
        self.pos = np.ascontiguousarray(pos, dtype=np.float64)
        self.box = init_box(box)
        self.rc = float(rc)
        self.nbin = int(nbin)
        self.verlet_list = verlet_list
        self.distance_list = distance_list
        self.neighbor_number = neighbor_number
        self.bond_length_distribution = None
        self.bond_angle_distribution = None

    def compute(self):
        m, inv, b = box_arrays(self.box, jnp.asarray(self.pos).dtype)
        ld, ad = _bond_hist(
            jnp.asarray(self.pos), jnp.asarray(self.verlet_list),
            jnp.asarray(self.distance_list), m, inv, b, self.rc, self.nbin,
        )
        self.bond_length_distribution = np.asarray(ld)
        self.bond_angle_distribution = np.asarray(ad)
        dr = self.rc / self.nbin
        dth = 180.0 / self.nbin
        self.r = (np.arange(self.nbin) + 0.5) * dr
        self.theta = (np.arange(self.nbin) + 0.5) * dth
        # reference-API names (bond_analysis.py:237 exposes r_length/r_angle)
        self.r_length = self.r
        self.r_angle = self.theta
        return self

    def plot_bond_length_distribution(self, fig=None, ax=None):
        import matplotlib.pyplot as plt

        if fig is None and ax is None:
            fig, ax = plt.subplots()
        ax.plot(self.r, self.bond_length_distribution, "o-")
        ax.set_xlabel(r"r ($\AA$)")
        ax.set_ylabel("count")
        return fig, ax

    def plot_bond_angle_distribution(self, fig=None, ax=None):
        import matplotlib.pyplot as plt

        if fig is None and ax is None:
            fig, ax = plt.subplots()
        ax.plot(self.theta, self.bond_angle_distribution, "o-")
        ax.set_xlabel(r"$\theta$ (deg)")
        ax.set_ylabel("count")
        return fig, ax


@functools.partial(jax.jit, static_argnames=("nbin",))
def _bond_hist(pos, verlet, dist, matrix, inv, boundary, rc, nbin: int):
    n, M = verlet.shape
    ok = (verlet >= 0) & (dist <= rc)
    dr = rc / nbin
    # lengths: j > i only
    jmat = jnp.maximum(verlet, 0)
    upper = ok & (verlet > jnp.arange(n)[:, None])
    kbin = jnp.minimum((dist / dr).astype(jnp.int32), nbin - 1)
    kbin = jnp.where(upper, kbin, nbin)
    lhist = jnp.zeros(nbin + 1, jnp.int32).at[kbin.reshape(-1)].add(1)

    # angles: pairs (jj < kk) of neighbors of each center
    disp = pos[jmat] - pos[:, None, :]
    disp = min_image_jnp(disp, matrix, inv, boundary)
    norm = jnp.maximum(dist, 1e-30)
    unit = disp / norm[..., None]
    cosang = jnp.einsum("imx,inx->imn", unit, unit)
    cosang = jnp.clip(cosang, -1.0, 1.0)
    theta = jnp.degrees(jnp.arccos(cosang))
    dth = 180.0 / nbin
    tbin = jnp.minimum((theta / dth).astype(jnp.int32), nbin - 1)
    iu, ju = jnp.triu_indices(M, k=1)
    pair_ok = ok[:, iu] & ok[:, ju]
    tsel = jnp.where(pair_ok, tbin[:, iu, ju], nbin)
    ahist = jnp.zeros(nbin + 1, jnp.int32).at[tsel.reshape(-1)].add(1)
    return lhist[:nbin], ahist[:nbin]
