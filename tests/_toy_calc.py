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
    """Truncated-and-shifted 12-6 Lennard-Jones, single species."""

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
        rij = pos[None, :, :] - pos[:, None, :]
        frac = rij @ inv
        frac -= np.round(frac)
        rij = frac @ mat
        r2 = (rij**2).sum(-1)
        np.fill_diagonal(r2, np.inf)
        mask = r2 < self.rc**2
        sr2 = np.where(mask, self.sigma**2 / np.where(mask, r2, 1.0), 0.0)
        sr6 = sr2**3
        sr12 = sr6**2
        e_rc = 4 * self.epsilon * (
            (self.sigma / self.rc) ** 12 - (self.sigma / self.rc) ** 6
        )
        e_pair = np.where(mask, 4 * self.epsilon * (sr12 - sr6) - e_rc, 0.0)
        # u'(r)/r = -24 eps (2 sr12 - sr6)/r^2; pair force on i is
        # f_ij = u'(r) rhat_ij = -w r_ij (rij = pos_j - pos_i, pairops.py:8)
        w = np.where(mask, 24 * self.epsilon * (2 * sr12 - sr6) / np.where(mask, r2, 1.0), 0.0)
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
