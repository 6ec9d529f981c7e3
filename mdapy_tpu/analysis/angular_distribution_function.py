"""Angular distribution function for element triplets A-B-C (A central).

Parity: reference angular_distribution_function.py:17-246 +
src/bond_analysis.cpp compute_adf — for each central atom of type A, B
neighbors within [rAB_min, rAB_max] and C neighbors within [rAC_min, rAC_max]
form angles at A binned over [0, 180] degrees; same-type (B == C) pairs are
counted once (kk > jj).
"""

from __future__ import annotations

import functools
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from ..core.box import init_box
from ..neighbor.neighbor import neighbor_search
from .common import box_arrays, min_image_jnp

__all__ = ["AngularDistributionFunction"]


class AngularDistributionFunction:
    def __init__(
        self,
        pos,
        box,
        rc_dict: Dict[str, List[float]],
        nbin: int = 100,
        types=None,
        elements=None,
        verlet_list=None,
        distance_list=None,
        neighbor_number=None,
    ):
        self.pos = np.ascontiguousarray(pos, dtype=np.float64)
        self.box = init_box(box)
        self.rc_dict = dict(rc_dict)
        self.nbin = int(nbin)
        if elements is not None:
            labels = np.asarray(elements).astype(str)
            self.ele_unique = sorted(set(labels.tolist()))
            lut = {e: i for i, e in enumerate(self.ele_unique)}
            self.type_idx = np.array([lut[e] for e in labels], dtype=np.int32)
        elif types is not None:
            t = np.asarray(types)
            self.ele_unique = sorted(set(t.tolist()))
            lut = {e: i for i, e in enumerate(self.ele_unique)}
            self.type_idx = np.array([lut[v] for v in t.tolist()], dtype=np.int32)
        else:
            raise ValueError("ADF requires types or elements")
        pair_list, rc_list = [], []
        for key, rcs in self.rc_dict.items():
            a, b, c = [p.strip() for p in key.split("-")]
            def to_idx(s):
                if s in lut:
                    return lut[s]
                # allow integer type labels passed as strings
                try:
                    return lut[int(s)]
                except (ValueError, KeyError):
                    raise KeyError(f"Unknown species {s!r} in rc_dict")
            pair_list.append([to_idx(a), to_idx(b), to_idx(c)])
            rc_list.append([float(v) for v in rcs])
        self.pair_list = np.asarray(pair_list, dtype=np.int32)
        self.rc_list = np.asarray(rc_list, dtype=np.float64)
        self._nlist = (verlet_list, distance_list, neighbor_number)
        self.bond_angle_distribution = None
        self.r_angle = None

    def compute(self):
        verlet, dist, nn = self._nlist
        if verlet is None:
            rmax = float(self.rc_list[:, [1, 3]].max())
            verlet, dist, nn = neighbor_search(self.pos, self.box, rmax)
        m, inv, b = box_arrays(self.box, jnp.float64)
        hists = []
        for p in range(len(self.pair_list)):
            hists.append(
                np.asarray(
                    _adf_one(
                        jnp.asarray(self.pos), jnp.asarray(verlet),
                        jnp.asarray(dist), jnp.asarray(self.type_idx),
                        m, inv, b,
                        int(self.pair_list[p, 0]), int(self.pair_list[p, 1]),
                        int(self.pair_list[p, 2]),
                        tuple(self.rc_list[p]), self.nbin,
                    )
                )
            )
        self.bond_angle_distribution = np.stack(hists)
        dth = 180.0 / self.nbin
        self.r_angle = (np.arange(self.nbin) + 0.5) * dth
        return self

    def plot_bond_angle_distribution(self, fig=None, ax=None):
        import matplotlib.pyplot as plt

        if fig is None and ax is None:
            fig, ax = plt.subplots()
        for p, key in enumerate(self.rc_dict):
            ax.plot(self.r_angle, self.bond_angle_distribution[p], "o-", label=key)
        ax.legend()
        ax.set_xlabel(r"$\theta$ (deg)")
        ax.set_ylabel("count")
        return fig, ax


@functools.partial(jax.jit, static_argnames=("ta", "tb", "tc", "rcs", "nbin"))
def _adf_one(pos, verlet, dist, type_idx, matrix, inv, boundary,
             ta: int, tb: int, tc: int, rcs, nbin: int):
    n, M = verlet.shape
    rab0, rab1, rac0, rac1 = rcs
    ok = verlet >= 0
    j = jnp.maximum(verlet, 0)
    tj = type_idx[j]
    central = type_idx == ta
    okB = ok & (tj == tb) & (dist >= rab0) & (dist <= rab1) & central[:, None]
    okC = ok & (tj == tc) & (dist >= rac0) & (dist <= rac1) & central[:, None]
    disp = pos[j] - pos[:, None, :]
    disp = min_image_jnp(disp, matrix, inv, boundary)
    unit = disp / jnp.maximum(dist, 1e-30)[..., None]
    cosang = jnp.clip(jnp.einsum("imx,inx->imn", unit, unit), -1.0, 1.0)
    theta = jnp.degrees(jnp.arccos(cosang))
    dth = 180.0 / nbin
    tbin = jnp.minimum((theta / dth).astype(jnp.int32), nbin - 1)
    mm = jnp.arange(M)
    if tb == tc:
        pair_ok = okB[:, :, None] & okC[:, None, :] & (mm[None, :, None] < mm[None, None, :])
    else:
        pair_ok = okB[:, :, None] & okC[:, None, :] & (mm[None, :, None] != mm[None, None, :])
    sel = jnp.where(pair_ok, tbin, nbin)
    hist = jnp.zeros(nbin + 1, jnp.int32).at[sel.reshape(-1)].add(1)
    return hist[:nbin]
