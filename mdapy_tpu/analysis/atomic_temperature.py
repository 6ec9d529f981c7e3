"""Atomic temperature from neighborhood-averaged kinetic energy.

Parity: reference src/atomic_temperature.cpp:12-118 — per atom: mass-weighted
COM velocity of {i + neighbors}, kinetic energy of relative velocities,
T = 2 KE / (3 n kB).  Velocities in A/ps, masses in g/mol.
"""

from __future__ import annotations

import numpy as np

__all__ = ["AtomicTemperature"]

KB = 1.380649e-23
AVOGADRO = 6.022140857e23
MASS_FACTOR = 1.0 / AVOGADRO / 1000.0  # g/mol -> kg
VEL_CONV = 1e4  # (A/ps)^2 -> (m/s)^2


class AtomicTemperature:
    def __init__(self, amass, vel, verlet_list, neighbor_number, rc=None, distance_list=None):
        self.amass = np.asarray(amass, dtype=np.float64)
        self.vel = np.asarray(vel, dtype=np.float64)
        self.verlet_list = np.asarray(verlet_list)
        self.neighbor_number = np.asarray(neighbor_number)
        self.rc = rc
        self.distance_list = distance_list
        self.T = None

    def compute(self):
        n, M = self.verlet_list.shape
        valid = self.verlet_list >= 0
        if self.rc is not None and self.distance_list is not None:
            valid = valid & (self.distance_list <= self.rc)
        j = np.where(valid, self.verlet_list, 0)
        mj = np.where(valid, self.amass[j], 0.0)                     # (n, M)
        vj = np.where(valid[..., None], self.vel[j], 0.0)            # (n, M, 3)
        msum = self.amass + mj.sum(axis=1)
        momentum = self.amass[:, None] * self.vel + (mj[..., None] * vj).sum(axis=1)
        vmean = momentum / msum[:, None]
        nn = 1 + valid.sum(axis=1)
        dv_i = self.vel - vmean
        ke = 0.5 * self.amass * MASS_FACTOR * np.sum(dv_i * dv_i, axis=1) * VEL_CONV
        dv_j = vj - vmean[:, None, :]
        ke_j = 0.5 * mj * MASS_FACTOR * np.sum(dv_j * dv_j, axis=2) * VEL_CONV
        ke = ke + np.where(valid, ke_j, 0.0).sum(axis=1)
        self.T = ke * 2.0 / (3.0 * nn * KB)
        return self
