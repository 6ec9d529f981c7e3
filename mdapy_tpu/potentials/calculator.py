"""Calculator contract (parity: reference calculator.py:23-174).

A calculator computes per-atom energies, forces, per-atom virials, and the
Voigt stress for a System.  Implementations cache results per configuration.
"""

from __future__ import annotations

from abc import ABC, abstractmethod

import numpy as np

__all__ = ["CalculatorMP"]


class CalculatorMP(ABC):
    def __init__(self):
        self.results = {}
        self._cache_token = None

    def _token(self, system):
        return (
            system.pos.tobytes(),
            system.box.matrix.tobytes(),
            tuple(system.box.boundary.tolist()),
        )

    def _ensure(self, system):
        tok = hash(self._token(system))
        if tok != self._cache_token or not self.results:
            self.results = {}
            self.calculate(system)
            self._cache_token = tok

    @abstractmethod
    def calculate(self, system) -> None:
        """Fill self.results with energies/forces/virials/stress."""

    def get_energies(self, system) -> np.ndarray:
        self._ensure(system)
        return self.results["energies"]

    def get_energy(self, system) -> float:
        return float(self.get_energies(system).sum())

    def get_forces(self, system) -> np.ndarray:
        self._ensure(system)
        return self.results["forces"]

    def get_stress(self, system) -> np.ndarray:
        self._ensure(system)
        return self.results["stress"]

    def get_virials(self, system) -> np.ndarray:
        self._ensure(system)
        return self.results["virials"]

    @staticmethod
    def stress_from_virials(virials: np.ndarray, volume: float) -> np.ndarray:
        """Voigt [xx, yy, zz, yz, xz, xy] = -(V + V^T)/2 / volume."""
        v = virials.sum(axis=0).reshape(3, 3)
        stress = (-0.5 * (v + v.T) / volume).ravel()
        return stress[[0, 4, 8, 5, 2, 1]]
