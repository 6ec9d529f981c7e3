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
    def _packed_tables(self):
        """Spline node data packed so one row gather fetches the whole local
        cubic: row [y_m, y_{m+1}, fp_m, fp_{m+1}] per (table, node).

        The round-1 evaluator issued ~16 scalar table gathers per pair
        (spline_eval x 5 channels); on TPU gathers are latency-bound per
        *row*, so packing drops the gather count 4x and lets one fetch serve
        value + derivative."""
        cached = getattr(self, "_pack_cache", None)
        if cached is not None:
            return cached

        def pack(y, fp):
            # (..., ntab) -> (..., ntab-1, 4)
            return np.stack(
                [y[..., :-1], y[..., 1:], fp[..., :-1], fp[..., 1:]], axis=-1
            )

        nt = self.Nelements
        rho_pack = pack(self.rho_r, self._rho_fp).reshape(-1, 4)
        z2r_pack = pack(self._rphi_r, self._z2r_fp).reshape(-1, 4)
        F_pack = pack(self.F_rho, self._F_fp).reshape(-1, 4)
        self._pack_cache = (
            jnp.asarray(rho_pack), jnp.asarray(z2r_pack), jnp.asarray(F_pack)
        )
        return self._pack_cache

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
        from ..neighbor.neighbor import neighbor_search_device
        from .pairops import reverse_permutation_device

        # box already enlarged, so indices refer to the replicated atom set
        pos_d, verlet_d, cnt_d, _ = neighbor_search_device(pos, box, self.rc)
        rev_d, bad = reverse_permutation_device(verlet_d)
        if int(bad):  # pragma: no cover - guarded by the build contract
            raise RuntimeError("asymmetric neighbor list in EAM evaluation")
        rho_pack, z2r_pack, F_pack = self._packed_tables()
        energy, force, virial = _eam_force_fast(
            pos_d, jnp.asarray(types), verlet_d, rev_d,
            jnp.asarray(box.matrix, pos_d.dtype),
            jnp.asarray(box.inverse_box, pos_d.dtype),
            jnp.asarray(box.boundary.astype(np.float64), pos_d.dtype),
            rho_pack, z2r_pack, F_pack,
            self.drho, self.dr, self.rc,
            self.nr, self.nrho, self.Nelements,
            _eam_block(pos_d.shape[0], verlet_d.shape[1]),
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


def _eam_block(n: int, M: int) -> int:
    target = max(1, (1 << 23) // max(M, 1))
    b = 1 << max(0, (min(n, target) - 1)).bit_length()
    return max(128, min(b, 16384))


def _spline_rows(pack, idx):
    """Gather the 4 node values per evaluation point, one column at a time
    (a (B, M, 4) row-gather output pads its minor dim 32x on TPU)."""
    return tuple(pack[:, c][idx] for c in range(4))


def _spline_from_rows(rows, dx, h):
    """(f, df) of the LAMMPS cubic from packed node values
    (y_m, y_{m+1}, fp_m, fp_{m+1}) (same math as spline_eval)."""
    ym, yp, fm, fpp = rows
    a = ym
    b = fm / h
    c = (3.0 * (yp - ym) - 2.0 * fm - fpp) / (h * h)
    d = (fm + fpp - 2.0 * (yp - ym)) / (h * h * h)
    f = a + dx * (b + dx * (c + dx * d))
    df = b + dx * (2.0 * c + 3.0 * dx * d)
    return f, df


@functools.partial(
    jax.jit, static_argnames=("nr", "nrho", "nt", "block")
)
def _eam_force_fast(
    pos, types, verlet, rev, matrix, inv, boundary,
    rho_pack, z2r_pack, F_pack, drho, dr, rc,
    nr: int, nrho: int, nt: int, block: int,
):
    """TPU-fast EAM: chunked two-pass evaluation over packed spline rows.

    Parity: reference src/eam.cpp:40 (density pass -> embedding -> pair
    force pass with the dF_i + dF_j chain).  The dF_j term is not gathered —
    it arrives through the reverse-pair assembly (pairops): the per-pair
    gradient J carries only atom i's own-row terms and J - Jrev reproduces
    the full symmetric pair force exactly.
    """
    n, M = verlet.shape
    ok = verlet >= 0
    j = jnp.maximum(verlet, 0)
    dtype = pos.dtype
    px_all, py_all, pz_all = pos[:, 0], pos[:, 1], pos[:, 2]

    npad = -(-n // block) * block
    nblk = npad // block

    def pad_rows(a, pv):
        cfg = [(0, npad - n)] + [(0, 0)] * (a.ndim - 1)
        return jnp.pad(a, cfg, constant_values=pv).reshape(
            (nblk, block) + a.shape[1:]
        )

    pos_b = pad_rows(pos, 0.0)
    types_b = pad_rows(types, 0)
    verlet_b = pad_rows(verlet, -1)

    def pair_geom(args):
        """Per-block displacement/type/node data (recomputed per pass).

        Per-component gathers: a packed (B, M, 4) row-gather output pads its
        minor dim to 128 on TPU (32x HBM blowup)."""
        pos_blk, vb = args
        okb = vb >= 0
        jb = jnp.maximum(vb, 0)
        cx = px_all[jb] - pos_blk[:, 0, None]          # (B, M)
        cy = py_all[jb] - pos_blk[:, 1, None]
        cz = pz_all[jb] - pos_blk[:, 2, None]
        tjb = types[jb]
        fa = cx * inv[0, 0] + cy * inv[1, 0] + cz * inv[2, 0]
        fb = cx * inv[0, 1] + cy * inv[1, 1] + cz * inv[2, 1]
        fc = cx * inv[0, 2] + cy * inv[1, 2] + cz * inv[2, 2]
        fa = fa - jnp.round(fa) * boundary[0]
        fb = fb - jnp.round(fb) * boundary[1]
        fc = fc - jnp.round(fc) * boundary[2]
        ddx = fa * matrix[0, 0] + fb * matrix[1, 0] + fc * matrix[2, 0]
        ddy = fa * matrix[0, 1] + fb * matrix[1, 1] + fc * matrix[2, 1]
        ddz = fa * matrix[0, 2] + fb * matrix[1, 2] + fc * matrix[2, 2]
        disp = jnp.stack([ddx, ddy, ddz], axis=-1)
        d = jnp.sqrt(ddx * ddx + ddy * ddy + ddz * ddz)
        okb = okb & (d <= rc)
        d0 = jnp.where(okb, d, 0.0)
        m = jnp.clip(jnp.floor(d0 / dr).astype(jnp.int32), 0, nr - 2)
        dx = jnp.clip(d0 - m.astype(dtype) * dr, 0.0, dr)
        return disp, d0, okb, tjb, m, dx

    # ---- pass 1: density ------------------------------------------------
    def rho_block(args):
        _, d0, okb, tjb, m, dx = pair_geom(args)
        rows = _spline_rows(rho_pack, tjb * (nr - 1) + m)
        rho_ij, _ = _spline_from_rows(rows, dx, dr)
        return jnp.sum(jnp.where(okb, rho_ij, 0.0), axis=1)

    rho_i = jax.lax.map(rho_block, (pos_b, verlet_b)).reshape(npad)[:n]

    # embedding (per atom, tiny)
    mrho = jnp.clip(jnp.floor(rho_i / drho).astype(jnp.int32), 0, nrho - 2)
    dxr = jnp.clip(rho_i - mrho.astype(dtype) * drho, 0.0, drho)
    Frows = _spline_rows(F_pack, types * (nrho - 1) + mrho)
    F_i, dF_i = _spline_from_rows(Frows, dxr, drho)
    # LAMMPS linearly extrapolates F beyond the table (pair_eam.cpp:
    # "if (rho > rhomax) phi += fp * (rho - rhomax)")
    rho_max = (nrho - 1) * drho
    F_i = jnp.where(rho_i > rho_max, F_i + dF_i * (rho_i - rho_max), F_i)
    dF_b = pad_rows(dF_i, 0.0)

    # ---- pass 2: pair energies + own-row pair gradient J ---------------
    def pair_block(args):
        pos_blk, vb, dFb, tib = args
        disp, d0, okb, tjb, m, dx = pair_geom((pos_blk, vb))
        zrows = _spline_rows(z2r_pack, (tib[:, None] * nt + tjb) * (nr - 1) + m)
        z2, dz2 = _spline_from_rows(zrows, dx, dr)
        rrows = _spline_rows(rho_pack, tjb * (nr - 1) + m)
        _, drho_j = _spline_from_rows(rrows, dx, dr)
        rsafe = jnp.where(okb, d0, 1.0)
        rinv = 1.0 / rsafe
        phi = z2 * rinv
        dphi = (dz2 - phi) * rinv
        e_pair = jnp.sum(jnp.where(okb, 0.5 * phi, 0.0), axis=1)
        # dE_i/ddisp: the 0.5*phi pair half + atom i's own embedding chain
        gmag = (0.5 * dphi + dFb[:, None] * drho_j) * rinv
        Jb = jnp.where(okb[..., None], gmag[..., None] * disp, 0.0)
        return e_pair, Jb, jnp.where(okb[..., None], disp, 0.0), okb

    e_pair, J, disp, okd = jax.lax.map(
        pair_block, (pos_b, verlet_b, dF_b, types_b)
    )
    e_pair = e_pair.reshape(npad)[:n]
    J = J.reshape(npad, M, 3)[:n]
    disp = disp.reshape(npad, M, 3)[:n]
    okd = okd.reshape(npad, M)[:n]

    from .pairops import pair_forces_virials

    force, virial, _ = pair_forces_virials(disp, J, verlet, rev, okd)
    return F_i + e_pair, force, virial


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
