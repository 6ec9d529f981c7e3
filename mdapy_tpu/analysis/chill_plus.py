"""CHILL+ ice/water structure identification.

Parity: reference src/chill_plus.cpp — q_3m bond correlations:
c_ij = Re(q3_i . conj(q3_j)) / (|q3_i| |q3_j|); eclipsed if -0.35 < c < 0.25,
staggered if c < -0.8; 4-coordinated atoms classified as
0=Other 1=HexIce 2=CubicIce 3=InterfacialIce 4=Hydrate 5=InterfacialHydrate.
"""

from __future__ import annotations

import numpy as np

from ..core.box import init_box
from ..neighbor.neighbor import neighbor_search
from .common import box_arrays
from .steinhardt_bond_orientation import _ylm_block

__all__ = ["ChillPlus"]


class ChillPlus:
    def __init__(self, pos, box, rc: float = 3.5, max_neigh=None):
        self.pos = np.ascontiguousarray(pos, dtype=np.float64)
        self.box = init_box(box)
        self.rc = float(rc)
        self.max_neigh = max_neigh
        self.chill_plus = None

    def compute(self):
        import jax.numpy as jnp

        verlet, dist, nn = neighbor_search(self.pos, self.box, self.rc, self.max_neigh)
        m, inv, b = box_arrays(self.box, jnp.float64)
        pos = jnp.asarray(self.pos)
        j = jnp.maximum(jnp.asarray(verlet), 0)
        ok = (jnp.asarray(verlet) >= 0) & (jnp.asarray(dist) <= self.rc)
        disp = pos[j] - pos[:, None, :]
        frac = disp @ inv
        frac = frac - jnp.round(frac) * b
        disp = frac @ m
        rmag = jnp.maximum(jnp.linalg.norm(disp, axis=-1), 1e-30)
        costheta = disp[..., 2] / rmag
        rxy = jnp.sqrt(disp[..., 0] ** 2 + disp[..., 1] ** 2)
        small = rxy < 1e-15
        er = jnp.where(small, 1.0, disp[..., 0] / jnp.where(small, 1.0, rxy))
        ei = jnp.where(small, 0.0, disp[..., 1] / jnp.where(small, 1.0, rxy))
        yr, yi = _ylm_block(3, costheta, er, ei)       # (n, M, 7)
        w = ok[..., None]
        qr = jnp.sum(jnp.where(w, yr, 0.0), axis=1)    # (n, 7)
        qi = jnp.sum(jnp.where(w, yi, 0.0), axis=1)
        qr = np.asarray(qr)
        qi = np.asarray(qi)
        verlet = np.asarray(verlet)
        okn = np.asarray(ok)
        jn = np.where(okn, verlet, 0)
        qnorm = np.sqrt((qr**2 + qi**2).sum(axis=1))
        num = np.einsum("im,ikm->ik", qr, qr[jn]) + np.einsum("im,ikm->ik", qi, qi[jn])
        with np.errstate(invalid="ignore", divide="ignore"):
            c = num / (qnorm[:, None] * qnorm[jn])
        c[~np.isfinite(c)] = 0.0
        eclipsed = okn & (c > -0.35) & (c < 0.25)
        staggered = okn & (c < -0.8)
        ne = eclipsed.sum(axis=1)
        ns = staggered.sum(axis=1)
        coord = okn.sum(axis=1)
        # if/elif chain of chill_plus.cpp:93-103 in priority order
        code = np.select(
            [ne == 4, ne == 3, ns == 4, (ns == 3) & (ne == 1),
             (ns == 3) & (ne == 0), ns == 2],
            [4, 5, 2, 1, 3, 3],
            default=0,
        ).astype(np.int32)
        code = np.where(coord == 4, code, 0).astype(np.int32)
        self.chill_plus = code
        return self
