"""Bond stiffness vs bond length, modeled after ATAT *fitsvsl*.

Parity: reference bond_stiffness.py — probe forces with single-atom
displacements (central differences), build one global OLS system whose
unknowns are per-(element pair, distance shell) polynomial coefficients of
the longitudinal / transverse spring constants, and record per-bond
projection observations for the scatter table.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

import numpy as np

__all__ = ["BondStiffness"]


class BondStiffness:
    """Fit k_long(r), k_trans(r) per element pair and distance shell."""

    def __init__(
        self,
        system,
        calculator,
        rc_bond: Optional[float] = None,
        shell_tol: float = 0.1,
        delta: float = 0.05,
        poly_order: int = 1,
        n_lattice: int = 3,
        max_strain: float = 0.02,
        central_diff: bool = True,
        rcond: float = 1e-6,
    ):
        if "element" not in system.data.columns:
            raise ValueError("system must have an 'element' column")
        self._sys = system
        self._calc = calculator
        self.delta = float(delta)
        self.poly_order = int(poly_order)
        self.n_lattice = int(n_lattice)
        self.max_strain = float(max_strain)
        self.central_diff = bool(central_diff)
        self.rc_bond = float(rc_bond) if rc_bond is not None else None
        self.shell_tol = float(shell_tol)
        self.rcond = float(rcond)

        self.bond_table = None  # AtomFrame-like dict of columns
        self.shells: List[float] = []
        self.k_long: Dict[Tuple[str, str, int], np.ndarray] = {}
        self.k_trans: Dict[Tuple[str, str, int], np.ndarray] = {}

    # ----------------------------------------------------------------- helpers
    def _auto_cutoff(self, system) -> float:
        from ..neighbor.neighbor import neighbor_search

        rc_probe = min(5.0, 0.5 * float(np.min(system.box.get_thickness())))
        _, dist, _ = neighbor_search(system.pos, system.box, rc_probe)
        d = dist[dist > 0]
        return float(d.min()) * 1.05

    def _build_bonds(self, system, rc: float) -> np.ndarray:
        """Unique bonds as an array of rows (i, j, dx, dy, dz, r).

        Every (i, j, image) geometric instance appears once; the central
        image keeps only j > i."""
        from ..neighbor.neighbor import neighbor_search, replicate_for_small_box

        pos, box, n_images = replicate_for_small_box(system.pos, system.box, rc)
        verlet, dist, nn = neighbor_search(pos, box, rc)
        N = system.N
        n_rep = len(pos)
        rows = []
        inv = np.linalg.inv(box.matrix)
        for i in range(N):
            for k in range(int(nn[i])):
                j_rep = int(verlet[i, k])
                if j_rep < 0:
                    continue
                d = float(dist[i, k])
                if d > rc + 1e-9:
                    continue
                j = j_rep % N
                if j_rep < N and j <= i:
                    continue
                dr = pos[j_rep] - pos[i]
                f = dr @ inv
                f = f - np.round(f) * box.boundary
                dr = f @ box.matrix
                rows.append((i, j, dr[0], dr[1], dr[2], d))
        return rows

    def _scaled_system(self, factor: float):
        from ..core.system import System

        cols = {c: np.array(self._sys.data[c], copy=True)
                for c in self._sys.data.columns}
        for c in "xyz":
            cols[c] = cols[c] * factor
        return System(data=cols, box=self._sys.box.matrix * factor,
                      boundary=self._sys.box.boundary)

    def _displace_force(self, system, atom_idx: int, axis: int,
                        sign: int) -> np.ndarray:
        pos = system.pos
        pos[atom_idx, axis] += sign * self.delta
        system.update_pos(pos)
        try:
            return np.array(system.get_force())
        finally:
            pos[atom_idx, axis] -= sign * self.delta
            system.update_pos(pos)

    # ----------------------------------------------------------------- compute
    def compute(self) -> "BondStiffness":
        rc = self.rc_bond if self.rc_bond is not None else self._auto_cutoff(self._sys)
        self.rc_bond = rc
        if self.n_lattice <= 1:
            strains = [0.0]
        else:
            strains = list(np.linspace(-self.max_strain, self.max_strain,
                                       self.n_lattice))
        elements = list(np.asarray(self._sys.data["element"]).astype(str))

        pairs = sorted({tuple(sorted((a, b)))
                        for a in set(elements) for b in set(elements)})
        pair_idx = {p: k for k, p in enumerate(pairs)}
        ncoef = self.poly_order + 1

        # distance shells from the unstrained cell
        eq_bonds = self._build_bonds(self._scaled_system(1.0), rc)
        eq_lengths = sorted(b[5] for b in eq_bonds)
        centers: List[float] = []
        for L in eq_lengths:
            if not centers or abs(L - centers[-1]) > self.shell_tol:
                centers.append(L)
        members: List[List[float]] = [[] for _ in centers]
        for L in eq_lengths:
            for s, c in enumerate(centers):
                if abs(L - c) < self.shell_tol:
                    members[s].append(L)
                    break
        centers = [float(np.mean(m)) for m in members]
        self.shells = centers
        n_shells = len(centers)

        def shell_of(L: float) -> int:
            return int(np.argmin([abs(L - c) for c in centers]))

        cols_per_shell = 2 * ncoef
        cols_per_pair = n_shells * cols_per_shell
        n_cols = len(pairs) * cols_per_pair

        A_rows, y_rows, records = [], [], []
        for strain in strains:
            system = self._scaled_system(1.0 + strain)
            bonds = self._build_bonds(system, rc)
            system.calc = self._calc
            F_eq = np.array(system.get_force())
            N = system.N

            atom_bonds: List[List[int]] = [[] for _ in range(N)]
            bond_shells = []
            for b_idx, (i, j, _, _, _, L) in enumerate(bonds):
                atom_bonds[i].append(b_idx)
                atom_bonds[j].append(b_idx)
                bond_shells.append(shell_of(L / (1.0 + strain)))

            signs = (1, -1) if self.central_diff else (1,)
            kl_sum = np.zeros(len(bonds))
            kt_sum = np.zeros(len(bonds))
            kl_n = np.zeros(len(bonds), dtype=np.int64)
            kt_n = np.zeros(len(bonds), dtype=np.int64)

            for atom_idx in range(N):
                for axis in range(3):
                    for sign in signs:
                        F = self._displace_force(system, atom_idx, axis, sign)
                        dF = F - F_eq
                        block = np.zeros((3 * N, n_cols))
                        d_p = np.zeros(3)
                        d_p[axis] = sign * self.delta
                        for b_idx in atom_bonds[atom_idx]:
                            i, j, dx, dy, dz, L = bonds[b_idx]
                            sh = bond_shells[b_idx]
                            u = np.array([dx, dy, dz]) / L
                            d_rel = d_p if atom_idx == i else -d_p
                            q_atom = j if atom_idx == i else i
                            d_l = (d_rel @ u) * u
                            d_t = d_rel - d_l
                            a, b = sorted((elements[i], elements[j]))
                            base = (pair_idx[(a, b)] * cols_per_pair
                                    + sh * cols_per_shell)
                            for q in range(ncoef):
                                rq = L ** q
                                cl, ct = base + q, base + ncoef + q
                                block[3 * i : 3 * i + 3, cl] += -d_l * rq
                                block[3 * i : 3 * i + 3, ct] += -d_t * rq
                                block[3 * j : 3 * j + 3, cl] += d_l * rq
                                block[3 * j : 3 * j + 3, ct] += d_t * rq
                            # raw per-bond projection observation
                            d_lp = (d_p @ u) * u
                            d_tp = d_p - d_lp
                            F_q = dF[q_atom]
                            ldn = float(d_lp @ d_lp)
                            tdn = float(d_tp @ d_tp)
                            if ldn > 1e-12:
                                kl_sum[b_idx] += float(F_q @ d_lp) / ldn
                                kl_n[b_idx] += 1
                            if tdn > 1e-12:
                                kt_sum[b_idx] += float(F_q @ d_tp) / tdn
                                kt_n[b_idx] += 1
                        A_rows.append(block)
                        y_rows.append(dF.reshape(-1))

            for b_idx, (i, j, _, _, _, L) in enumerate(bonds):
                a, b = sorted((elements[i], elements[j]))
                records.append((
                    a, b, int(bond_shells[b_idx]), float(L), float(strain),
                    kl_sum[b_idx] / kl_n[b_idx] if kl_n[b_idx] else np.nan,
                    kt_sum[b_idx] / kt_n[b_idx] if kt_n[b_idx] else np.nan,
                ))

        A = np.concatenate(A_rows, axis=0)
        y = np.concatenate(y_rows, axis=0)
        beta, *_ = np.linalg.lstsq(A, y, rcond=self.rcond)

        self.k_long.clear()
        self.k_trans.clear()
        for pair, pid in pair_idx.items():
            for s in range(n_shells):
                base = pid * cols_per_pair + s * cols_per_shell
                key = (pair[0], pair[1], s)
                self.k_long[key] = beta[base : base + ncoef].copy()
                self.k_trans[key] = beta[base + ncoef : base + 2 * ncoef].copy()

        from ..core.frame import AtomFrame

        rec = list(zip(*records)) if records else [[]] * 7
        self.bond_table = AtomFrame({
            "element_a": np.array(rec[0], dtype=object),
            "element_b": np.array(rec[1], dtype=object),
            "shell": np.array(rec[2], dtype=np.int32),
            "r": np.array(rec[3], dtype=np.float64),
            "strain": np.array(rec[4], dtype=np.float64),
            "k_long": np.array(rec[5], dtype=np.float64),
            "k_trans": np.array(rec[6], dtype=np.float64),
        })
        return self

    # ----------------------------------------------------------------- outputs
    def write_slspring(self, path: str) -> None:
        """ATAT slspring.out format (multi-shell blocks annotated)."""
        if not self.k_long:
            raise RuntimeError("call compute() before write_slspring()")
        with open(path, "w") as f:
            for key in sorted(self.k_long):
                ea, eb, shell = key
                kl, kt = self.k_long[key], self.k_trans[key]
                if len(self.shells) > 1:
                    f.write(f"{ea} {eb}    # shell {shell} "
                            f"d={self.shells[shell]:.4f}\n")
                else:
                    f.write(f"{ea} {eb}\n")
                f.write(f"{len(kl)}\n")
                for c in kl:
                    f.write(f"{c:.5f}\n")
                f.write(f"{len(kt)}\n")
                for c in kt:
                    f.write(f"{c:.5f}\n")

    def generate_perturbed_structures(self, output_dir: str = "train"):
        """Write ATAT-format str_ideal.out / str_unpert.out / str.out files
        (one directory per single-atom perturbation) for fitsvsl -f."""
        os.makedirs(output_dir, exist_ok=True)
        system = self._scaled_system(1.0)
        elements = list(np.asarray(system.data["element"]).astype(str))
        signs = (1, -1) if self.central_diff else (1,)

        def write_atat(path, box, pos, elems):
            with open(path, "w") as f:
                for row in box:
                    f.write(f"{row[0]:.8f} {row[1]:.8f} {row[2]:.8f}\n")
                f.write("1 0 0\n0 1 0\n0 0 1\n")
                inv = np.linalg.inv(box)
                for p, e in zip(pos, elems):
                    fr = p @ inv
                    f.write(f"{fr[0]:.8f} {fr[1]:.8f} {fr[2]:.8f} {e}\n")

        perts = []
        idx = 0
        for atom_idx in range(system.N):
            for axis in range(3):
                for sign in signs:
                    sub = os.path.join(output_dir, f"p{idx:05d}")
                    os.makedirs(sub, exist_ok=True)
                    pos = system.pos
                    write_atat(os.path.join(sub, "str_ideal.out"),
                               system.box.matrix, pos, elements)
                    write_atat(os.path.join(sub, "str_unpert.out"),
                               system.box.matrix, pos, elements)
                    pert = pos.copy()
                    pert[atom_idx, axis] += sign * self.delta
                    write_atat(os.path.join(sub, "str.out"),
                               system.box.matrix, pert, elements)
                    perts.append((atom_idx, axis, sign))
                    idx += 1
        return perts

    def plot(self, which: str = "both", ax=None, ncol: Optional[int] = None):
        """Stiffness-vs-bond-length panels, one per element pair."""
        if self.bond_table is None:
            raise RuntimeError("call compute() before plot()")
        if which not in ("both", "long", "trans"):
            raise ValueError("which must be 'both', 'long' or 'trans'")
        import matplotlib.pyplot as plt

        ea = np.asarray(self.bond_table["element_a"]).astype(str)
        eb = np.asarray(self.bond_table["element_b"]).astype(str)
        r = np.asarray(self.bond_table["r"])
        kl = np.asarray(self.bond_table["k_long"])
        kt = np.asarray(self.bond_table["k_trans"])
        sh = np.asarray(self.bond_table["shell"])
        pairs = sorted(set(zip(ea, eb)))
        ncol = ncol if ncol is not None else min(3, len(pairs))
        nrow = int(np.ceil(len(pairs) / ncol))
        fig, axes = plt.subplots(nrow, ncol, squeeze=False,
                                 figsize=(4 * ncol, 3 * nrow))
        axes = axes.ravel()
        for k, (a, b) in enumerate(pairs):
            axp = axes[k]
            m = (ea == a) & (eb == b)
            for s in sorted(set(sh[m].tolist())):
                ms = m & (sh == s)
                if which in ("both", "long"):
                    axp.plot(r[ms], kl[ms], "o", ms=3, label=f"NN{s + 1} long")
                if which in ("both", "trans"):
                    axp.plot(r[ms], kt[ms], "s", ms=3, label=f"NN{s + 1} trans")
                rr = np.linspace(r[ms].min(), r[ms].max(), 50) if ms.any() else None
                if rr is not None:
                    for dic, sty in ((self.k_long, "-"), (self.k_trans, "--")):
                        if which == "long" and dic is self.k_trans:
                            continue
                        if which == "trans" and dic is self.k_long:
                            continue
                        coef = dic.get((a, b, int(s)))
                        if coef is not None:
                            yy = sum(c * rr ** q for q, c in enumerate(coef))
                            axp.plot(rr, yy, sty, lw=1)
            axp.set_xlabel(r"bond length ($\AA$)")
            axp.set_ylabel(r"stiffness (eV/$\AA^2$)")
            axp.set_title(f"{a}-{b}")
            axp.legend(fontsize=7)
        for k in range(len(pairs), len(axes)):
            axes[k].set_visible(False)
        return fig, axes
