"""FIRE2 / ABC-FIRE structural minimizer with optional cell relaxation.

Parity: reference minimizer.py:39-379 — velocity-Verlet-like stepping with
adaptive dt/alpha, the half-step backtrack on v.f <= 0, ABC bias correction
with per-direction capping, and ASE-UnitCellFilter-style cell optimization
(deformation gradient as 3 virtual atoms; Tadmor PRB 59, 235 formalism) with
mask / hydrostatic / constant-volume / scalar-pressure options.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

__all__ = ["FIRE"]


def _voigt6_to_full(v):
    v = np.asarray(v, dtype=float)
    return np.array(
        [[v[0], v[5], v[4]], [v[5], v[1], v[3]], [v[4], v[3], v[2]]]
    )


class FIRE:
    def __init__(
        self,
        system,
        dt: float = 0.1,
        maxstep: float = 0.2,
        dtmax: float = 1.0,
        dtmin: float = 2e-3,
        Nmin: int = 20,
        finc: float = 1.1,
        fdec: float = 0.5,
        astart: float = 0.25,
        fa: float = 0.99,
        use_abc: bool = False,
        optimize_cell: bool = False,
        mask=None,
        cell_factor: Optional[float] = None,
        hydrostatic_strain: bool = False,
        constant_volume: bool = False,
        scalar_pressure: float = 0.0,
    ):
        self.system = system
        self.dt = dt
        self.Nsteps = 0
        self.maxstep = maxstep
        self.dtmax = dtmax
        self.dtmin = dtmin
        self.Nmin = Nmin
        self.finc = finc
        self.fdec = fdec
        self.astart = astart
        self.fa = fa
        self.a = astart
        self.use_abc = use_abc
        self.optimize_cell = optimize_cell
        self.scalar_pressure = scalar_pressure
        self.hydrostatic_strain = hydrostatic_strain
        self.constant_volume = constant_volume
        self.N = system.N
        self.ndof = self.N if not optimize_cell else self.N + 3
        if optimize_cell:
            self.orig_box = system.box.matrix.copy()
            self.cell_factor = float(self.N) if cell_factor is None else cell_factor
            if mask is None:
                mask = np.ones((3, 3))
            else:
                mask = np.asarray(mask, dtype=float)
                if mask.size == 6:
                    mask = _voigt6_to_full(mask)
            self.mask = mask
        else:
            self.orig_box = None
            self.cell_factor = None
            self.mask = None

    def get_forces(self) -> np.ndarray:
        atoms_forces = self.system.get_force()
        if not self.optimize_cell:
            return atoms_forces
        volume = abs(self.system.box.volume)
        virial = (
            -_voigt6_to_full(self.system.get_stress())
            - np.diag([self.scalar_pressure] * 3)
        ) * volume
        cur_deform_grad = np.linalg.solve(self.orig_box, self.system.box.matrix).T
        atoms_forces = atoms_forces @ cur_deform_grad
        virial = np.linalg.solve(cur_deform_grad, virial.T).T
        if self.hydrostatic_strain:
            virial = np.diag([virial.trace() / 3.0] * 3)
        if (self.mask != 1.0).any():
            virial = virial * self.mask
        if self.constant_volume:
            vtr = virial.trace()
            virial = virial - np.diag([vtr / 3.0] * 3)
        cell_forces = virial / self.cell_factor
        return np.vstack((atoms_forces, cell_forces))

    def update_data_box(self, extended_dr: np.ndarray) -> None:
        if self.optimize_cell:
            cur_positions = self.system.pos
            cur_deform_grad = np.linalg.solve(self.orig_box, self.system.box.matrix).T
            cur_unstrained = np.linalg.solve(cur_deform_grad, cur_positions.T).T
            dr_atoms = extended_dr[: self.N]
            dr_cell = extended_dr[self.N :]
            new_unstrained = cur_unstrained + dr_atoms
            new_deform_grad = cur_deform_grad + dr_cell / self.cell_factor
            deform = (new_deform_grad - np.eye(3)).T * self.mask
            new_box = self.orig_box @ (np.eye(3) + deform)
            self.system.update_box(new_box)
            self.system.update_pos(new_unstrained @ (np.eye(3) + deform))
        else:
            self.system.update_pos(self.system.pos + extended_dr)

    def run(self, steps: int, fmax: float = 1e-4, show_process: bool = False) -> bool:
        self.v = None
        if show_process:
            print(f"{'Step':>6} {'Energy':>15} {'fmax':>15} {'pressure':>15}")
        for step in range(steps):
            extended_f = self.get_forces()
            cfmax = np.sqrt((extended_f**2).sum(axis=1).max())
            if show_process:
                energy = self.system.get_energy()
                if self.optimize_cell:
                    energy += self.scalar_pressure * abs(self.system.box.volume)
                press = -self.system.get_stress()[:3].mean()
                print(f"{step:6d} {energy:15.6f} {cfmax:15.6f} {press:15.6f}")
            if cfmax < fmax:
                if show_process:
                    print("Converged!")
                return True
            if self.v is None:
                self.v = np.zeros((self.ndof, 3))
            else:
                vf = np.vdot(extended_f, self.v)
                if vf > 0.0:
                    self.Nsteps += 1
                    if self.Nsteps > self.Nmin:
                        self.dt = min(self.dt * self.finc, self.dtmax)
                        self.a *= self.fa
                else:
                    self.Nsteps = 0
                    self.dt = max(self.dt * self.fdec, self.dtmin)
                    self.a = self.astart
                    self.update_data_box(-0.5 * self.dt * self.v)
                    extended_f = self.get_forces()
                    self.v *= 0.0
            self.v += self.dt * extended_f
            if self.use_abc:
                self.a = max(self.a, 1e-10)
                abc_multiplier = 1.0 / (1.0 - (1.0 - self.a) ** (self.Nsteps + 1))
                v_mix = (1.0 - self.a) * self.v + self.a * extended_f / np.sqrt(
                    np.vdot(extended_f, extended_f)
                ) * np.sqrt(np.vdot(self.v, self.v))
                self.v = abc_multiplier * v_mix
                if np.all(self.v):
                    capped = []
                    for k in range(3):
                        av = np.abs(self.v[:, k])
                        capped.append(
                            np.where(
                                av * self.dt > self.maxstep,
                                (self.maxstep / self.dt) * (self.v[:, k] / av),
                                self.v[:, k],
                            )
                        )
                    self.v = np.array(capped).T
            else:
                self.v = (1.0 - self.a) * self.v + self.a * extended_f / np.sqrt(
                    np.vdot(extended_f, extended_f)
                ) * np.sqrt(np.vdot(self.v, self.v))
            dr = self.dt * self.v
            if not self.use_abc:
                normdr = np.sqrt(np.vdot(dr, dr))
                if normdr > self.maxstep:
                    dr = self.maxstep * dr / normdr
            self.update_data_box(dr)
        self.system.calc.results = {}
        if show_process:
            print("Not converged! Try decrease the fmax or increase steps.")
        return False
