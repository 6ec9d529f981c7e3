"""Steinhardt bond-orientational order parameters q_l (+ w_l, averaged,
weighted variants) and the solid-liquid classifier.

Parity: reference src/steinhardt_bond_orientation.cpp:188-676 (LAMMPS
compute orientorder/atom conventions): per-atom
qlm = sum_j w_ij Y_lm(r_ij) / sum_j w_ij, optional neighborhood average
(including self, unfiltered by rc), q_l = sqrt(4pi/(2l+1) sum_m |qlm|^2),
w_l via the Clebsch-Gordan triple sum / sqrt(2l+1), wl_hat normalized by
(qnormfac/q_l)^3; solid-liquid via s_ij = 4pi/13 * Re(qlm_i . conj(qlm_j)) /
(Q6_i Q6_j) > threshold with >= n_bond solid bonds and isolated-solid
removal.

Spherical harmonics are built from the same stable m-recurrences, vectorized
over neighbors with static per-degree unrolling (l <= 16).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..core.box import init_box
from ..neighbor.knn import knn_search
from ..neighbor.neighbor import neighbor_search
from .common import box_arrays, min_image_jnp

__all__ = ["SteinhardtBondOrientation"]


def _factorial(n):
    return math.factorial(n)


def clebsch_gordan_list(l: int) -> np.ndarray:
    """CG coefficients in the kernel's (m1, m2) iteration order."""
    out = []
    for m1 in range(2 * l + 1):
        aa2 = m1 - l
        for m2 in range(max(0, l - m1), min(2 * l + 1, 3 * l - m1 + 1)):
            bb2 = m2 - l
            m = aa2 + bb2 + l
            sums = 0.0
            for z in range(max(0, max(-aa2, bb2)), min(l, min(l - aa2, l + bb2)) + 1):
                ifac = -1 if z % 2 else 1
                sums += ifac / (
                    _factorial(z) * _factorial(l - z) * _factorial(l - aa2 - z)
                    * _factorial(l + bb2 - z) * _factorial(aa2 + z) * _factorial(-bb2 + z)
                )
            cc2 = m - l
            sfaccg = math.sqrt(
                _factorial(l + aa2) * _factorial(l - aa2) * _factorial(l + bb2)
                * _factorial(l - bb2) * _factorial(l + cc2) * _factorial(l - cc2)
                * (2 * l + 1)
            )
            dcg = math.sqrt(_factorial(l) ** 3 / _factorial(3 * l + 1))
            out.append(sums * dcg * sfaccg)
    return np.asarray(out)


def _ylm_block(l: int, costheta, expphi_r, expphi_i):
    """Y_lm for m = -l..l as (real, imag) arrays shaped (..., 2l+1).

    Follows the kernel's associated-Legendre recurrence and the
    Y_{l,-m} = (-1)^m conj(Y_{lm}) fold (steinhardt_bond_orientation.cpp:243-299,
    388-413)."""
    x = costheta
    sqx = jnp.sqrt(jnp.maximum(1.0 - x * x, 0.0))
    # P_l^m for m = 0..l
    plm = []
    for m in range(l + 1):
        p = jnp.ones_like(x)
        for i in range(1, m + 1):
            p = p * (2 * i - 1) * sqx
        pm1 = jnp.zeros_like(x)
        for i in range(m + 1, l + 1):
            p, pm1 = ((2 * i - 1) * x * p - (i + m - 1) * pm1) / (i - m), p
        plm.append(p)
    out_r = [None] * (2 * l + 1)
    out_i = [None] * (2 * l + 1)
    # m = 0
    pref0 = math.sqrt((2 * l + 1) / (4 * math.pi))
    out_r[l] = pref0 * plm[0]
    out_i[l] = jnp.zeros_like(x)
    em_r, em_i = expphi_r, expphi_i
    for m in range(1, l + 1):
        fac = 1.0
        for i in range(l - m + 1, l + m + 1):
            fac *= i
        pref = math.sqrt((2 * l + 1) / (4 * math.pi * fac))
        c_r = pref * plm[m] * em_r
        c_i = pref * plm[m] * em_i
        out_r[l + m] = c_r
        out_i[l + m] = c_i
        sgn = -1.0 if m % 2 else 1.0
        out_r[l - m] = sgn * c_r
        out_i[l - m] = -sgn * c_i
        em_r, em_i = em_r * expphi_r - em_i * expphi_i, em_r * expphi_i + em_i * expphi_r
    return jnp.stack(out_r, axis=-1), jnp.stack(out_i, axis=-1)


class SteinhardtBondOrientation:
    def __init__(
        self,
        pos,
        box,
        llist: Sequence[int] = (4, 6),
        nnn: int = 12,
        rc: float = -1.0,
        average: bool = False,
        wl: bool = False,
        wlhat: bool = False,
        use_voronoi: bool = False,
        use_weight: bool = False,
        weight: Optional[np.ndarray] = None,
        identify_liquid: bool = False,
        threshold: float = 0.7,
        n_bond: int = 7,
        max_neigh: Optional[int] = None,
        a_face_area_threshold: float = -1.0,
        r_face_area_threshold: float = -1.0,
        verlet_list=None,
        distance_list=None,
        neighbor_number=None,
        face_areas=None,
    ):
        self.pos = np.ascontiguousarray(pos, dtype=np.float64)
        self.box = init_box(box)
        self.llist = [int(l) for l in llist]
        self.nnn = int(nnn)
        self.rc = float(rc)
        self.average = bool(average)
        self.wl = bool(wl)
        self.wlhat = bool(wlhat)
        self.use_voronoi = bool(use_voronoi)
        self.use_weight = bool(use_weight)
        self.weight = weight
        self.identify_liquid = bool(identify_liquid)
        self.threshold = float(threshold)
        self.n_bond = int(n_bond)
        self.max_neigh = max_neigh
        self.a_face_area_threshold = float(a_face_area_threshold)
        self.r_face_area_threshold = float(r_face_area_threshold)
        self._nlist = (verlet_list, distance_list, neighbor_number)
        self._face_areas = face_areas
        self.qnarray = None
        self.solidliquid = None
        self.nbond = None

    @property
    def out_names(self):
        names = [f"ql{l}" for l in self.llist]
        if self.wl:
            names += [f"wl{l}" for l in self.llist]
        if self.wlhat:
            names += [f"whl{l}" for l in self.llist]
        return names

    def compute(self):
        n = len(self.pos)
        verlet, dist, nn = self._nlist
        weight = self.weight
        if verlet is None:
            if self.use_voronoi:
                from .voronoi import VoronoiAnalysis

                vor = VoronoiAnalysis(self.pos, self.box)
                vor.compute_neighbors(
                    self.a_face_area_threshold, self.r_face_area_threshold
                )
                verlet, dist, nn = vor.verlet_list, vor.distance_list, vor.neighbor_number
                if self.use_weight and weight is None:
                    weight = vor.face_areas
            elif self.nnn > 0:
                verlet, dist = knn_search(self.pos, self.box, self.nnn)
                nn = np.full(n, self.nnn, dtype=np.int32)
            else:
                if self.rc <= 0:
                    raise ValueError("Provide nnn > 0 or rc > 0")
                verlet, dist, nn = neighbor_search(self.pos, self.box, self.rc, self.max_neigh)
        rc_eff = self.rc if self.rc > 0 else 1e30
        if self.use_weight and weight is None:
            raise ValueError("use_weight=True requires weight (or use_voronoi)")
        m, inv, b = box_arrays(self.box, jnp.float64)

        slot_ok = np.asarray(verlet) >= 0
        if not self.use_voronoi and self.nnn > 0:
            slot_ok = slot_ok & (np.arange(verlet.shape[1])[None, :] < self.nnn)
        else:
            slot_ok = slot_ok & (np.arange(verlet.shape[1])[None, :] < np.asarray(nn)[:, None])

        qlms = []
        for l in self.llist:
            qr, qi = _qlm_for_l(
                jnp.asarray(self.pos), jnp.asarray(verlet), jnp.asarray(dist),
                jnp.asarray(slot_ok),
                (jnp.asarray(weight, jnp.float64) if self.use_weight else None),
                m, inv, b, l, rc_eff,
            )
            if self.average:
                qr, qi = _average_qlm(qr, qi, jnp.asarray(verlet), jnp.asarray(slot_ok))
            qlms.append((np.asarray(qr), np.asarray(qi)))

        cols = []
        qn_per_l = []
        for l, (qr, qi) in zip(self.llist, qlms):
            qnorm = math.sqrt(4 * math.pi / (2 * l + 1))
            qsum = (qr**2 + qi**2).sum(axis=1)
            qn = qnorm * np.sqrt(qsum)
            cols.append(qn)
            qn_per_l.append(qn)
        if self.wl or self.wlhat:
            wl_cols, wlhat_cols = [], []
            for l, (qr, qi), qn in zip(self.llist, qlms, qn_per_l):
                cg = clebsch_gordan_list(l)
                wlsum = np.zeros(n)
                k = 0
                q = qr + 1j * qi
                for m1 in range(2 * l + 1):
                    for m2 in range(max(0, l - m1), min(2 * l + 1, 3 * l - m1 + 1)):
                        m3 = m1 + m2 - l
                        prod = q[:, m1] * q[:, m2] * np.conj(q[:, m3])
                        wlsum += prod.real * cg[k]
                        k += 1
                wlf = wlsum / math.sqrt(2 * l + 1)
                if self.wl:
                    wl_cols.append(wlf)
                if self.wlhat:
                    qnorm = math.sqrt(4 * math.pi / (2 * l + 1))
                    with np.errstate(divide="ignore", invalid="ignore"):
                        fac = (qnorm / qn) ** 3
                    fac[~np.isfinite(fac)] = 0.0
                    wlhat_cols.append(wlf * fac)
            cols += wl_cols + wlhat_cols
        self.qnarray = np.column_stack(cols)

        if self.identify_liquid:
            if 6 not in self.llist:
                raise ValueError("identify_liquid requires l=6 in llist")
            i6 = self.llist.index(6)
            qr, qi = qlms[i6]
            q6 = qn_per_l[i6]
            self._solid_liquid(np.asarray(verlet), np.asarray(dist), slot_ok, qr, qi, q6, rc_eff)
        return self

    def _solid_liquid(self, verlet, dist, slot_ok, qr, qi, q6, rc_eff):
        n = len(q6)
        j = np.where(slot_ok, verlet, 0)
        ok = slot_ok & (dist <= rc_eff)
        num = np.einsum("im,ikm->ik", qr, qr[j]) + np.einsum("im,ikm->ik", qi, qi[j])
        with np.errstate(divide="ignore", invalid="ignore"):
            sij = num / q6[:, None] / q6[j] * 4 * np.pi / 13.0
        sij[~np.isfinite(sij)] = 0.0
        solid_bond = ok & (sij > self.threshold)
        nbond = solid_bond.sum(axis=1).astype(np.int32)
        solid = (nbond >= self.n_bond).astype(np.int32)
        # remove isolated solid atoms
        neigh_solid = np.where(slot_ok, solid[j], 0).max(axis=1)
        solid = np.where((solid == 1) & (neigh_solid == 0), 0, solid).astype(np.int32)
        self.solidliquid = solid
        self.nbond = nbond


def _qlm_for_l(pos, verlet, dist, slot_ok, weight, matrix, inv, boundary, l, rc_eff):
    j = jnp.maximum(verlet, 0)
    disp = pos[j] - pos[:, None, :]
    disp = min_image_jnp(disp, matrix, inv, boundary)
    ok = slot_ok & (dist > 1e-15) & (dist <= rc_eff)
    rmag = jnp.maximum(dist, 1e-30)
    costheta = disp[..., 2] / rmag
    rxy = jnp.sqrt(disp[..., 0] ** 2 + disp[..., 1] ** 2)
    small = rxy < 1e-15
    er = jnp.where(small, 1.0, disp[..., 0] / jnp.where(small, 1.0, rxy))
    ei = jnp.where(small, 0.0, disp[..., 1] / jnp.where(small, 1.0, rxy))
    yr, yi = _ylm_block(l, costheta, er, ei)          # (n, M, 2l+1)
    w = jnp.ones_like(dist) if weight is None else weight
    w = jnp.where(ok, w, 0.0)
    qr = jnp.sum(w[..., None] * yr, axis=1)
    qi = jnp.sum(w[..., None] * yi, axis=1)
    wsum = jnp.sum(w, axis=1)
    return qr / wsum[:, None], qi / wsum[:, None]


def _average_qlm(qr, qi, verlet, slot_ok):
    """Include self + all listed neighbors (no rc filter — kernel parity)."""
    j = jnp.maximum(verlet, 0)
    ok = slot_ok
    cnt = 1 + jnp.sum(ok, axis=1)
    ar = qr + jnp.sum(jnp.where(ok[..., None], qr[j], 0.0), axis=1)
    ai = qi + jnp.sum(jnp.where(ok[..., None], qi[j], 0.0), axis=1)
    return ar / cnt[:, None], ai / cnt[:, None]
