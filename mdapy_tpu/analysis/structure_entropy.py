"""Per-atom pair-entropy fingerprint (Piaggi & Parrinello, JCP 2017).

Parity: reference src/structure_entropy.cpp:15-113 — Gaussian-smeared local
g_i(r) on nbins = floor(rc/sigma)+1 points, trapezoid-integrated
s_i = -pi rho sigma * sum[(g ln g - g + 1) r^2] with the reference's exact
prefactor, bin-0 fixup, and low-g branch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core.box import init_box

__all__ = ["StructureEntropy"]


class StructureEntropy:
    def __init__(self, pos, box, rc, sigma, use_local_density,
                 verlet_list, distance_list, neighbor_number):
        self.pos = np.ascontiguousarray(pos, dtype=np.float64)
        self.box = init_box(box)
        self.rc = float(rc)
        self.sigma = float(sigma)
        self.use_local_density = bool(use_local_density)
        self.verlet_list = verlet_list
        self.distance_list = distance_list
        self.neighbor_number = neighbor_number
        self.entropy = None

    def compute(self):
        self.entropy = np.asarray(
            _entropy(
                jnp.asarray(self.verlet_list),
                jnp.asarray(self.distance_list),
                self.rc, self.sigma,
                len(self.pos) / abs(self.box.volume),
                self.use_local_density,
            )
        )
        return self


@functools.partial(jax.jit, static_argnames=("rc", "sigma", "use_local_density"))
def _entropy(verlet, dist, rc: float, sigma: float, global_density, use_local_density: bool):
    dtype = dist.dtype
    nbins = int(np.floor(rc / sigma)) + 1
    step = rc / (nbins - 1)
    rlist = jnp.arange(nbins, dtype=dtype) * step
    rsq = rlist * rlist
    factor = 4.0 * jnp.pi * global_density * jnp.sqrt(2.0 * jnp.pi * sigma * sigma)
    prefactor = rsq * factor
    prefactor = prefactor.at[0].set(prefactor[1])

    ok = (verlet >= 0) & (dist <= rc)                 # (n, M)
    dmask = jnp.where(ok, dist, 2.0 * rc + 10.0)
    delta = rlist[None, None, :] - dmask[..., None]   # (n, M, nbins)
    gauss = jnp.exp(-(delta * delta) / (2.0 * sigma * sigma))
    gauss = jnp.where(ok[..., None], gauss, 0.0)
    g = jnp.sum(gauss, axis=1) / prefactor[None, :]   # (n, nbins)

    if use_local_density:
        n_neigh = jnp.sum(ok, axis=1)
        local_vol = 4.0 / 3.0 * jnp.pi * rc**3
        density = n_neigh / local_vol
        fac = global_density / jnp.maximum(density, 1e-30)
        g = g * fac[:, None]
        dens = density
    else:
        dens = jnp.full(verlet.shape[0], global_density, dtype)

    integrand = jnp.where(
        g >= 1e-10, (g * jnp.log(jnp.maximum(g, 1e-30)) - g + 1.0) * rsq[None, :], rsq[None, :]
    )
    # reference trapezoid: sum of (f_j + f_{j+1}) without the 1/2 — folded
    # into its -pi*rho*sigma prefactor convention
    s = jnp.sum(integrand[:, :-1] + integrand[:, 1:], axis=1)
    return -jnp.pi * dens * s * sigma
