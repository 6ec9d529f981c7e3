"""Element data: symbols, masses, vdW radii, colors, display radii.

Array-first layout (indexed by atomic number) so device code can gather
per-atom properties with a single take; dict views are provided for host-side
convenience and API parity with the reference
(reference: src/mdapy/data.py:59,189,193,303,2800,2891,3003).
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np

from ._element_tables import (
    ATOMIC_MASSES,
    DISPLAY_DIAMETER,
    JMOL_RGB,
    SPECIAL_RGB,
    SYMBOLS,
    TYPE_RGB,
    VDW_RADII,
)

__all__ = [
    "chemical_symbols",
    "atomic_numbers",
    "atomic_masses",
    "vdw_radii",
    "ele_rgb",
    "ele_radius",
    "type_rgb",
    "mass_of",
    "number_of",
    "symbols_to_numbers",
    "numbers_to_symbols",
    "colors_for_numbers",
    "display_radius_for_numbers",
    "colors_for_types",
]

chemical_symbols: List[str] = list(SYMBOLS)
atomic_numbers: Dict[str, int] = {s: i for i, s in enumerate(chemical_symbols)}
atomic_masses: np.ndarray = ATOMIC_MASSES
vdw_radii: np.ndarray = VDW_RADII

# dict views (0-255 ints for rgb, diameters in Angstrom), matching the
# reference's ele_rgb / ele_radius / type_rgb surface.
ele_rgb: Dict[str, List[int]] = {
    s: [int(round(c * 255)) for c in JMOL_RGB[i]] for i, s in enumerate(chemical_symbols)
}
ele_rgb.update({k: [int(round(c * 255)) for c in v] for k, v in SPECIAL_RGB.items()})
ele_radius: Dict[str, float] = {
    s: float(DISPLAY_DIAMETER[i]) for i, s in enumerate(chemical_symbols)
}
type_rgb: Dict[int, List[int]] = {
    t: [int(round(c * 255)) for c in TYPE_RGB[t]] for t in range(1, len(TYPE_RGB))
}


def number_of(symbol: str) -> int:
    """Atomic number for an element symbol (case-normalized)."""
    if symbol in atomic_numbers:
        return atomic_numbers[symbol]
    cap = symbol.capitalize()
    if cap in atomic_numbers:
        return atomic_numbers[cap]
    raise KeyError(f"Unknown element symbol: {symbol!r}")


def mass_of(symbol: str) -> float:
    return float(ATOMIC_MASSES[number_of(symbol)])


def symbols_to_numbers(symbols) -> np.ndarray:
    """Vector map of element symbols -> atomic numbers (int32)."""
    return np.array([number_of(s) for s in symbols], dtype=np.int32)


def numbers_to_symbols(numbers) -> List[str]:
    return [chemical_symbols[int(z)] for z in np.asarray(numbers)]


def colors_for_numbers(numbers: np.ndarray) -> np.ndarray:
    """(N,3) float RGB in [0,1] by atomic number (Jmol palette)."""
    return JMOL_RGB[np.asarray(numbers, dtype=np.int64)]


def display_radius_for_numbers(numbers: np.ndarray) -> np.ndarray:
    """(N,) display radius in Angstrom (= OVITO diameter / 2), by atomic number.

    Parity: render.py:478-495 uses ele_radius[e]/2 as the sphere radius.
    """
    return DISPLAY_DIAMETER[np.asarray(numbers, dtype=np.int64)] * 0.5


def colors_for_types(types: np.ndarray) -> np.ndarray:
    """(N,3) float RGB in [0,1] from the integer-type palette (cycled)."""
    t = np.asarray(types, dtype=np.int64)
    ncolor = len(TYPE_RGB) - 1  # palette is 1-based
    idx = (t - 1) % ncolor + 1
    return TYPE_RGB[idx]


def infer_element_from_mass(mass: float, tol: float = 0.1) -> str:
    """Closest element by atomic mass (for LAMMPS data 'Masses' sections).

    Parity: load_save.py:276-311 element inference.
    """
    diff = np.abs(ATOMIC_MASSES[1:] - mass)
    i = int(np.argmin(diff)) + 1
    return chemical_symbols[i]
