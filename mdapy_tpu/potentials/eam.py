"""EAM (eam.alloy / setfl) potential — JAX evaluation, LAMMPS-spline parity.

Parity: reference eam.py:141-523 + src/eam.cpp + src/spline.h — the uniform
cubic-Hermite spline with LAMMPS/GPUMD finite-difference node derivatives,
r*phi (z2r) pair channel, two-pass density/embedding + pair force evaluation,
per-atom virials with the 0.5 pair factor, Voigt stress.

The whole evaluation is one jitted function over (N, M) neighbor tensors —
batched table lookups + VPU arithmetic, autodiff-compatible end to end (the
analytic derivative path mirrors the kernel exactly for LAMMPS parity).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.box import init_box
from ..neighbor.neighbor import neighbor_search, replicate_for_small_box
from .calculator import CalculatorMP

__all__ = ["EAM", "EAMAverage", "lammps_spline_coeffs", "spline_eval"]


def lammps_spline_coeffs(y: np.ndarray) -> np.ndarray:
    """Node derivatives (in normalized coordinate) of the LAMMPS spline.

    fp[0] = y1-y0; fp[1] = (y2-y0)/2;
    fp[m] = ((y[m-2]-y[m+2]) + 8(y[m+1]-y[m-1]))/12;
    fp[n-2] = (y[n-1]-y[n-3])/2; fp[n-1] = y[n-1]-y[n-2].
    (spline.h LAMMPS convention block.)"""
    y = np.asarray(y, dtype=np.float64)
    n = y.shape[-1]
    fp = np.empty_like(y)
    fp[..., 0] = y[..., 1] - y[..., 0]
    fp[..., 1] = 0.5 * (y[..., 2] - y[..., 0])
    fp[..., 2 : n - 2] = (
        (y[..., 0 : n - 4] - y[..., 4:n]) + 8.0 * (y[..., 3 : n - 1] - y[..., 1 : n - 3])
    ) / 12.0
    fp[..., n - 2] = 0.5 * (y[..., n - 1] - y[..., n - 3])
    fp[..., n - 1] = y[..., n - 1] - y[..., n - 2]
    return fp


def spline_eval(y, fp, h, x, idx=()):
    """Evaluate (f, df/dx) of the LAMMPS spline; x clamped to the table.

    y/fp are tables of shape ``idx_dims + (ntab,)``; ``idx`` is a tuple of
    integer arrays (broadcast-compatible with x) selecting the leading table
    dims per evaluation point. Only the two bracketing nodes are gathered
    per point — never the whole table — so memory stays O(x.size)."""
    n = y.shape[-1]
    m = jnp.clip(jnp.floor(x / h).astype(jnp.int32), 0, n - 2)
    dx = jnp.clip(x - m * h, 0.0, h)
    idx = tuple(idx)
    ym = y[idx + (m,)]
    yp = y[idx + (m + 1,)]
    fm = fp[idx + (m,)]
    fpp = fp[idx + (m + 1,)]
    a = ym
    b = fm / h
    c = (3.0 * (yp - ym) - 2.0 * fm - fpp) / (h * h)
    d = (fm + fpp - 2.0 * (yp - ym)) / (h * h * h)
    f = a + dx * (b + dx * (c + dx * d))
    df = b + dx * (2.0 * c + 3.0 * dx * d)
    return f, df


class EAM(CalculatorMP):
    """eam.alloy (setfl) potential (reference eam.py:141-523)."""

    def __init__(self, filename: str):
        super().__init__()
        self.filename = filename
        self._read_eam_alloy()
        # precompute spline node derivatives
        self._F_fp = lammps_spline_coeffs(self.F_rho)
        self._rho_fp = lammps_spline_coeffs(self.rho_r)
        self._z2r_fp = lammps_spline_coeffs(self._rphi_r)

    # -- parsing -----------------------------------------------------------
    def _read_eam_alloy(self) -> None:
        with open(self.filename) as f:
            lines = f.readlines()
        self.header = lines[:3]
        line4 = lines[3].split()
        self.Nelements = int(line4[0])
        self.elements_list = line4[1 : 1 + self.Nelements]
        line5 = lines[4].split()
        self.nrho = int(line5[0])
        self.drho = float(line5[1])
        self.nr = int(line5[2])
        self.dr = float(line5[3])
        self.rc = float(line5[4])
        self.r = np.arange(self.nr) * self.dr
        self.rho = np.arange(self.nrho) * self.drho

        idx = [5]

        def read_section(count: int) -> np.ndarray:
            out = np.empty(count)
            got = 0
            while got < count and idx[0] < len(lines):
                toks = lines[idx[0]].split("#")[0].split()
                for t in toks:
                    if got >= count:
                        break
                    out[got] = float(t)
                    got += 1
                idx[0] += 1
            if got < count:
                raise ValueError(f"EAM file truncated: wanted {count}, got {got}")
            return out

        self.F_rho = np.zeros((self.Nelements, self.nrho))
        self.rho_r = np.zeros((self.Nelements, self.nr))
        for e in range(self.Nelements):
            idx[0] += 1  # per-element info line
            self.F_rho[e] = read_section(self.nrho)
            self.rho_r[e] = read_section(self.nr)
        self._rphi_r = np.zeros((self.Nelements, self.Nelements, self.nr))
        for i in range(self.Nelements):
            for j in range(i + 1):
                self._rphi_r[i, j] = read_section(self.nr)
                if i != j:
                    self._rphi_r[j, i] = self._rphi_r[i, j]
        self.phi_r = np.zeros_like(self._rphi_r)
        self.phi_r[:, :, 1:] = self._rphi_r[:, :, 1:] / self.r[1:]
        self.phi_r[:, :, 0] = self.phi_r[:, :, 1]

    def write_eam_alloy(self, output_name: Optional[str] = None) -> str:
        """Write the tables back in setfl format (eam.py:221)."""
        if output_name is None:
            output_name = "".join(self.elements_list) + ".eam.alloy"
        with open(output_name, "w") as f:
            for ln in self.header:
                f.write(ln if ln.endswith("\n") else ln + "\n")
            f.write(f"    {self.Nelements} " + " ".join(self.elements_list) + "\n")
            f.write(
                f"{self.nrho} {self.drho:.16E} {self.nr} {self.dr:.16E} {self.rc:.10f}\n"
            )
            from ..core.elements import atomic_masses, atomic_numbers

            def dump(arr):
                for k in range(0, len(arr), 5):
                    f.write(" ".join(f"{v: .16E}" for v in arr[k : k + 5]) + "\n")

            for e, name in enumerate(self.elements_list):
                z = atomic_numbers.get(name, 0)
                f.write(f"{z} {atomic_masses[z]:.6f} 0.0 none\n")
                dump(self.F_rho[e])
                dump(self.rho_r[e])
            for i in range(self.Nelements):
                for j in range(i + 1):
                    dump(self._rphi_r[i, j])
        return output_name

    # -- evaluation --------------------------------------------------------
    def calculate(self, system) -> None:
        elems = np.asarray(system.data["element"]).astype(str)
        for e in set(elems.tolist()):
            if e not in self.elements_list:
                raise ValueError(
                    f"{e} not supported by this EAM potential ({self.elements_list})"
                )
        lut = {e: i for i, e in enumerate(self.elements_list)}
        types = np.array([lut[e] for e in elems], dtype=np.int32)
        old_n = system.N
        pos, box, n_images = replicate_for_small_box(system.pos, system.box, self.rc)
        if n_images > 1:
            types = np.tile(types, n_images)
        # box already enlarged, so indices refer to the replicated atom set
        verlet, dist, nn = neighbor_search(pos, box, self.rc)
        energy, force, virial = _eam_eval(
            jnp.asarray(pos), jnp.asarray(types),
            jnp.asarray(verlet), jnp.asarray(dist),
            jnp.asarray(box.matrix), jnp.asarray(box.inverse_box),
            jnp.asarray(box.boundary.astype(np.float64)),
            jnp.asarray(self.F_rho), jnp.asarray(self._F_fp),
            jnp.asarray(self.rho_r), jnp.asarray(self._rho_fp),
            jnp.asarray(self._rphi_r), jnp.asarray(self._z2r_fp),
            self.drho, self.dr, self.rc,
        )
        energy = np.asarray(energy)
        force = np.asarray(force)
        virial = np.asarray(virial)
        self.results["energies"] = energy[:old_n]
        self.results["forces"] = force[:old_n]
        self.results["virials"] = virial[:old_n]
        self.results["stress"] = self.stress_from_virials(
            virial, abs(box.volume)
        )

    def plot(self, fig=None, ax=None):
        import matplotlib.pyplot as plt

        if fig is None:
            fig, ax = plt.subplots(1, 3, figsize=(12, 3.2))
        for e, name in enumerate(self.elements_list):
            ax[0].plot(self.rho, self.F_rho[e], label=name)
            ax[1].plot(self.r, self.rho_r[e], label=name)
            ax[2].plot(self.r[1:], self.phi_r[e, e, 1:], label=name)
        ax[0].set_xlabel(r"$\rho$"); ax[0].set_ylabel(r"F($\rho$) (eV)")
        ax[1].set_xlabel(r"r ($\AA$)"); ax[1].set_ylabel(r"$\rho$(r)")
        ax[2].set_xlabel(r"r ($\AA$)"); ax[2].set_ylabel(r"$\phi$(r) (eV)")
        ax[2].set_ylim(-1, 5)
        for a in ax:
            a.legend(fontsize=7)
        return fig, ax


@functools.partial(jax.jit, static_argnames=())
def _eam_eval(
    pos, types, verlet, dist, matrix, inv, boundary,
    F_rho, F_fp, rho_r, rho_fp, z2r, z2r_fp, drho, dr, rc,
):
    n, M = verlet.shape
    ok = (verlet >= 0) & (dist <= rc)
    j = jnp.maximum(verlet, 0)
    tj = types[j]
    ti = types[:, None]

    # pass 1: density + embedding
    dist0 = jnp.where(ok, dist, 0.0)
    rho_ij, _ = spline_eval(rho_r, rho_fp, dr, dist0, (tj,))
    rho_i = jnp.sum(jnp.where(ok, rho_ij, 0.0), axis=1)
    F_i, dF_i = spline_eval(F_rho, F_fp, drho, rho_i, (types,))
    # LAMMPS linearly extrapolates F beyond the table (pair_eam.cpp:
    # "if (rho > rhomax) phi += fp * (rho - rhomax)")
    rho_max = (F_rho.shape[-1] - 1) * drho
    F_i = jnp.where(rho_i > rho_max, F_i + dF_i * (rho_i - rho_max), F_i)

    # pass 2: pair + forces
    disp = pos[j] - pos[:, None, :]
    frac = disp @ inv
    frac = frac - jnp.round(frac) * boundary
    disp = frac @ matrix
    rsafe = jnp.where(ok, dist, 1.0)
    z2, dz2 = spline_eval(z2r, z2r_fp, dr, dist0, (ti, tj))
    rinv = 1.0 / rsafe
    phi = z2 * rinv
    dphi = (dz2 - phi) * rinv
    _, drho_j = spline_eval(rho_r, rho_fp, dr, dist0, (tj,))
    _, drho_i = spline_eval(rho_r, rho_fp, dr, dist0, (ti * jnp.ones_like(j),))
    dF_j = dF_i[j]
    pair_force = (dphi + dF_i[:, None] * drho_j + dF_j * drho_i) * rinv
    fvec = pair_force[..., None] * disp
    fvec = jnp.where(ok[..., None], fvec, 0.0)
    force = jnp.sum(fvec, axis=1)
    e_pair = jnp.sum(jnp.where(ok, 0.5 * phi, 0.0), axis=1)
    energy = F_i + e_pair
    # virial: v_ab = -0.5 * sum_j disp_a * f_b
    v = -0.5 * jnp.einsum("ijm,ijn->imn", jnp.where(ok[..., None], disp, 0.0), fvec)
    return energy, force, v.reshape(n, 9)


class EAMAverage(EAM):
    """A-atom average potential for HEAs (reference eam.py:558)."""

    def __init__(self, filename: str, concentration):
        super().__init__(filename)
        conc = np.asarray(concentration, dtype=np.float64)
        assert len(conc) == self.Nelements and abs(conc.sum() - 1.0) < 1e-6
        self.concentration = conc
        # averaged single-element tables appended as element "A"
        F_avg = np.sum(conc[:, None] * self.F_rho, axis=0, keepdims=True)
        rho_avg = np.sum(conc[:, None] * self.rho_r, axis=0, keepdims=True)
        z2_avg = np.einsum("i,j,ijr->r", conc, conc, self._rphi_r)[None, None]
        ne = self.Nelements + 1
        newF = np.concatenate([self.F_rho, F_avg], axis=0)
        newrho = np.concatenate([self.rho_r, rho_avg], axis=0)
        newz2 = np.zeros((ne, ne, self.nr))
        newz2[: ne - 1, : ne - 1] = self._rphi_r
        newz2[ne - 1, ne - 1] = z2_avg[0, 0]
        for i in range(ne - 1):
            cross = np.sum(conc[:, None] * self._rphi_r[i], axis=0)
            newz2[i, ne - 1] = newz2[ne - 1, i] = cross
        self.F_rho, self.rho_r, self._rphi_r = newF, newrho, newz2
        self.Nelements = ne
        self.elements_list = self.elements_list + ["A"]
        self.phi_r = np.zeros_like(self._rphi_r)
        self.phi_r[:, :, 1:] = self._rphi_r[:, :, 1:] / self.r[1:]
        self.phi_r[:, :, 0] = self.phi_r[:, :, 1]
        self._F_fp = lammps_spline_coeffs(self.F_rho)
        self._rho_fp = lammps_spline_coeffs(self.rho_r)
        self._z2r_fp = lammps_spline_coeffs(self._rphi_r)


class EAMGenerator:
    """Generate eam.alloy files with the Zhou-Johnson-Wadley parameterisation.

    Parity: reference eam.py:697-1475 (EAMGenerator; functional forms of
    Zhou, Johnson & Wadley, PRB 69, 144113 (2004)). Profiles are evaluated
    on vectorised r/rho grids.
    """

    DEFAULT_NR = 2000
    DEFAULT_NRHO = 2000
    DEFAULT_RST = 0.5

    def __init__(self, elements_list, output_filename=None,
                 nr=DEFAULT_NR, nrho=DEFAULT_NRHO, rst=DEFAULT_RST):
        from ._zjw04_params import ZJW04_PARAMS

        for e in elements_list:
            if e not in ZJW04_PARAMS:
                raise ValueError(
                    f"Element '{e}' is not supported. Supported elements: "
                    f"{', '.join(ZJW04_PARAMS)}"
                )
        self.elements_list = list(elements_list)
        self.n_elements = len(elements_list)
        self.nr, self.nrho, self.rst = int(nr), int(nrho), float(rst)
        self.output_filename = output_filename or (
            "".join(elements_list) + ".eam.alloy"
        )
        p = np.array([ZJW04_PARAMS[e] for e in elements_list], dtype=np.float64)
        (self.re, self.fe, self.rhoe, self.rhos, self.alpha, self.beta,
         self.A, self.B, self.kappa, self.lam, self.Fi0, self.Fi1, self.Fi2,
         self.Fi3, self.Fm0, self.Fm1, self.Fm2, self.Fm3, self.eta, self.Fn,
         zahl, self.atomic_mass, self.Fm4, self.beta1, self.lam1,
         rhol, rhoh) = p.T
        self.atomic_number = zahl.astype(np.int32)
        self.lattice_constant = np.sqrt(2.0) * self.re
        self.rhoin = rhol * self.rhoe
        self.rhoout = rhoh * self.rhoe
        self.rc = np.sqrt(10.0) / 2.0 * self.lattice_constant.max()
        self.dr = self.rc / (self.nr - 1.0)
        self._tabulate()
        self._write()

    # ----- ZJW functional forms (vectorised over the r grid) -------------
    def _f_density(self, it, r):
        return (self.fe[it] * np.exp(-self.beta1[it] * (r / self.re[it] - 1.0))
                / (1.0 + (r / self.re[it] - self.lam1[it]) ** 20))

    def _phi_same(self, it, r):
        x = r / self.re[it]
        psi1 = self.A[it] * np.exp(-self.alpha[it] * (x - 1.0)) / (
            1.0 + (x - self.kappa[it]) ** 20)
        psi2 = self.B[it] * np.exp(-self.beta[it] * (x - 1.0)) / (
            1.0 + (x - self.lam[it]) ** 20)
        return psi1 - psi2

    def _phi(self, it1, it2, r):
        if it1 == it2:
            return self._phi_same(it1, r)
        fa, fb = self._f_density(it1, r), self._f_density(it2, r)
        pa, pb = self._phi_same(it1, r), self._phi_same(it2, r)
        return 0.5 * (fb / fa * pa + fa / fb * pb)

    def _embed(self, it, rho):
        Fm3 = np.where(rho < self.rhoe[it], self.Fm3[it], self.Fm4[it])
        xin = rho / self.rhoin[it] - 1.0
        xe = rho / self.rhoe[it] - 1.0
        xs = rho / np.maximum(self.rhos[it], 1e-300)
        inner = (self.Fi0[it] + self.Fi1[it] * xin + self.Fi2[it] * xin ** 2
                 + self.Fi3[it] * xin ** 3)
        mid = (self.Fm0[it] + self.Fm1[it] * xe + self.Fm2[it] * xe ** 2
               + Fm3 * xe ** 3)
        with np.errstate(divide="ignore", invalid="ignore"):
            outer = (self.Fn[it] * (1.0 - self.eta[it] * np.log(xs))
                     * xs ** self.eta[it])
        outer = np.where(np.isfinite(outer), outer, inner)
        return np.where(rho < self.rhoin[it], inner,
                        np.where(rho < self.rhoout[it], mid, outer))

    def _tabulate(self):
        nt = self.n_elements
        r = np.maximum(np.arange(self.nr) * self.dr, self.rst)
        self.rho_table = np.zeros((self.nr, nt))
        self.rphi_table = np.zeros((self.nr, nt, nt))
        for i1 in range(nt):
            self.rho_table[:, i1] = self._f_density(i1, r)
            for i2 in range(i1 + 1):
                rphi = r * self._phi(i1, i2, r)
                self.rphi_table[:, i1, i2] = rphi
                self.rphi_table[:, i2, i1] = rphi
        rhom = max(float(self.rho_table.max()), 2.0 * float(self.rhoe.max()),
                   100.0)
        self.drho = rhom / (self.nrho - 1.0)
        rho_grid = np.arange(self.nrho) * self.drho
        self.embedding = np.column_stack(
            [self._embed(it, rho_grid) for it in range(nt)]
        )

    def _write(self):
        import datetime

        def dump(f, arr):
            for idx, v in enumerate(arr):
                if idx % 5 == 0:
                    if idx > 0:
                        f.write("\n")
                    f.write(" ")
                f.write(f"{v:.16E} ")
            f.write("\n")

        with open(self.output_filename, "w") as f:
            f.write(f" eam/alloy {self.n_elements}")
            for e in self.elements_list:
                f.write(f" {e}")
            f.write("\n Generated by mdapy_tpu EAMGenerator "
                    f"({datetime.datetime.now():%Y-%m-%d %H:%M:%S})\n")
            f.write(" CITATION: X. W. Zhou, R. A. Johnson, H. N. G. Wadley, "
                    "Phys. Rev. B, 69, 144113 (2004)\n")
            f.write(f"    {self.n_elements} ")
            for e in self.elements_list:
                f.write(f"{e} ")
            f.write("\n")
            f.write(f" {self.nrho} {self.drho:.16E} {self.nr} "
                    f"{self.dr:.16E} {self.rc:.16E}\n")
            for i in range(self.n_elements):
                f.write(f" {self.atomic_number[i]} {self.atomic_mass[i]:.10f} "
                        f"{self.lattice_constant[i]:.6f} fcc\n")
                dump(f, self.embedding[:, i])
                dump(f, self.rho_table[:, i])
            for i in range(self.n_elements):
                for j in range(i + 1):
                    dump(f, self.rphi_table[:, i, j])
