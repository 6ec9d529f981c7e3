"""Cheap analytic Lennard-Jones CalculatorMP for logic-level tests.

Lets the fast tier exercise calculator-driven pipelines (BondStiffness table
assembly, md_elastic Cij assembly, qha_elastic strain modes, FIRE) without a
NEP evaluation or external LAMMPS/phonopy, mirroring the intent of the
reference's own calculator-backed tests (reference tests/test_md_elastic.py,
tests/test_bond_stiffness.py) at toy cost.  O(N^2) min-image pair loop —
fine for the <=few-hundred-atom systems tests use.
"""

import numpy as np

from mdapy_tpu.potentials.calculator import CalculatorMP


class LJCalculator(CalculatorMP):
    """Shifted-force 12-6 Lennard-Jones, single species.

    Force-shifted (u' and u both continuous at rc) so FIRE/cell
    minimization converges to tight fmax."""

    def __init__(self, epsilon=0.4, sigma=2.3, rc=6.0):
        super().__init__()
        self.epsilon = float(epsilon)
        self.sigma = float(sigma)
        self.rc = float(rc)

    def calculate(self, system) -> None:
        pos = np.asarray(system.pos, np.float64)
        N = pos.shape[0]
        mat = np.asarray(system.box.matrix, np.float64)
        inv = np.linalg.inv(mat)
        # explicit image sum (rc may exceed half the cell for tiny test
        # systems); shifts cover ceil(rc / perpendicular thickness) images
        vol = abs(np.linalg.det(mat))
        thick = np.array([
            vol / np.linalg.norm(np.cross(mat[1], mat[2])),
            vol / np.linalg.norm(np.cross(mat[2], mat[0])),
            vol / np.linalg.norm(np.cross(mat[0], mat[1])),
        ])
        reps = [
            (int(np.ceil(self.rc / thick[a])) if system.box.boundary[a] else 0)
            for a in range(3)
        ]
        shifts = np.array([
            i * mat[0] + j * mat[1] + k * mat[2]
            for i in range(-reps[0], reps[0] + 1)
            for j in range(-reps[1], reps[1] + 1)
            for k in range(-reps[2], reps[2] + 1)
        ])
        # (S, N_j, N_i, 3) displacement pos_j + shift - pos_i, flattened on
        # the (S, j) axis so the pair machinery below stays 2-D
        rij = (pos[None, :, None, :] + shifts[:, None, None, :]
               - pos[None, None, :, :])
        rij = rij.reshape(-1, N, 3).transpose(1, 0, 2)  # (N_i, S*N_j, 3)
        r2 = (rij**2).sum(-1)
        r2[r2 < 1e-12] = np.inf  # self (zero-shift diagonal)
        mask = r2 < self.rc**2
        r = np.sqrt(np.where(mask, r2, 1.0))
        sr2 = np.where(mask, self.sigma**2 / np.where(mask, r2, 1.0), 0.0)
        sr6 = sr2**3
        sr12 = sr6**2
        eps4 = 4 * self.epsilon
        src = self.sigma / self.rc
        u_rc = eps4 * (src**12 - src**6)
        # du/dr at rc (analytic): -(24 eps / rc)(2 src^12 - src^6)
        dudr_rc = -(24 * self.epsilon / self.rc) * (2 * src**12 - src**6)
        e_pair = np.where(
            mask,
            eps4 * (sr12 - sr6) - u_rc - (r - self.rc) * dudr_rc,
            0.0,
        )
        # du_sf/dr = du/dr - du/dr|rc; pair force on i is
        # f_ij = u'(r) rhat_ij  (rij = pos_j - pos_i, pairops.py:8)
        dudr = -(24 * self.epsilon / r) * (2 * sr12 - sr6)
        w = np.where(mask, -(dudr - dudr_rc) / r, 0.0)
        fij = -w[:, :, None] * rij
        forces = fij.sum(axis=1)
        energies = 0.5 * e_pair.sum(axis=1)
        # per-atom virial convention of pairops.py:26: v_i = -0.5 sum disp (x) f
        virials = -0.5 * np.einsum("ija,ijb->iab", rij, fij).reshape(N, 9)
        volume = abs(np.linalg.det(mat))
        self.results = {
            "energies": energies,
            "forces": forces,
            "virials": virials,
            "stress": self.stress_from_virials(virials, volume),
        }
