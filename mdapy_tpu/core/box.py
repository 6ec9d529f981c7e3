"""Simulation box: host-side container + device-side pure PBC math.

TPU-first design: ``Box`` is an immutable host object holding the cell matrix
(rows = cell vectors a/b/c), origin, and periodic-boundary flags.  All hot-path
math (minimum image, wrapping, fractional transforms) lives in pure functions
that accept plain arrays so they can be traced/jitted and used inside Pallas
kernels with either numpy or jax.numpy.

Capability parity with the reference Box (reference: src/mdapy/box.py:93-502):
flexible constructor formats (scalar, (3,), (3,3), (4,3) legacy, (3,4) OVITO),
triclinic detection, volume/inverse caching, ``pbc`` minimum image,
``get_thickness``, ``check_small_box`` replication counts, and
``align_to_lammps_box`` lower-triangular rotation.
"""

from __future__ import annotations

from typing import Iterable, Optional, Tuple, Union

import numpy as np

__all__ = ["Box", "init_box", "min_image", "wrap_positions", "frac_coords"]

BoxLike = Union[int, float, Iterable[float], np.ndarray, "Box"]


def _parse_origin(origin) -> np.ndarray:
    if origin is None:
        return np.zeros(3, dtype=np.float64)
    origin = np.array(origin, dtype=np.float64)
    if origin.shape != (3,):
        raise ValueError(f"Origin must be a 3-element array, got shape {origin.shape}")
    return origin


def _parse_boundary(boundary) -> np.ndarray:
    if boundary is None:
        return np.ones(3, dtype=np.int32)
    boundary = np.array(boundary, dtype=np.int32)
    if boundary.shape != (3,):
        raise ValueError(
            f"Boundary must be a 3-element array, got shape {boundary.shape}"
        )
    return np.where(boundary != 0, 1, 0).astype(np.int32)


def _parse_box(box, origin) -> tuple:
    """Accept scalar, (3,), (3,3), legacy (4,3) [last row origin], OVITO (3,4)
    [last column origin].  Parity: reference box.py:149-197."""
    if isinstance(box, (int, float, np.integer, np.floating)):
        matrix = np.eye(3, dtype=np.float64) * float(box)
    else:
        matrix = np.array(box, dtype=np.float64)
        if matrix.shape == (3,):
            matrix = np.diag(matrix)
        elif matrix.shape == (3, 3):
            pass
        elif matrix.shape == (4, 3):
            origin = matrix[-1] if origin is None else origin
            matrix = np.ascontiguousarray(matrix[:-1])
        elif matrix.shape == (3, 4):
            origin = matrix[:, -1] if origin is None else origin
            matrix = np.ascontiguousarray(matrix[:, :-1])
        else:
            raise ValueError(f"Invalid box shape: {matrix.shape}")
    return matrix, _parse_origin(origin)


class Box:
    """Immutable simulation cell.

    Attributes
    ----------
    matrix : (3,3) float64 ndarray — rows are the cell vectors a, b, c.
    origin : (3,) float64 ndarray.
    boundary : (3,) int32 ndarray — 1 = periodic, 0 = free.
    """

    __slots__ = ("_matrix", "_origin", "_boundary", "_inv", "_volume", "_triclinic")

    def __init__(
        self,
        box: BoxLike,
        boundary: Optional[Iterable[int]] = None,
        origin: Optional[Iterable[float]] = None,
    ) -> None:
        if isinstance(box, Box):
            matrix, org = box.matrix.copy(), box.origin.copy()
            if boundary is None:
                boundary = box.boundary.copy()
            if origin is not None:
                org = _parse_origin(origin)
        else:
            matrix, org = _parse_box(box, origin)
        self._matrix = matrix
        self._matrix.setflags(write=False)
        self._origin = org
        self._origin.setflags(write=False)
        self._boundary = _parse_boundary(boundary)
        self._boundary.setflags(write=False)
        self._volume = float(np.linalg.det(matrix))
        self._inv = np.linalg.inv(matrix)
        self._inv.setflags(write=False)
        off = matrix - np.diag(np.diag(matrix))
        self._triclinic = bool(
            np.any(np.abs(off) > 1e-10) or np.any(np.diag(matrix) < 0)
        )

    # ---- properties --------------------------------------------------------
    @property
    def matrix(self) -> np.ndarray:
        return self._matrix

    # parity alias with the reference's ``box.box``
    @property
    def box(self) -> np.ndarray:
        return self._matrix

    @property
    def origin(self) -> np.ndarray:
        return self._origin

    @property
    def boundary(self) -> np.ndarray:
        return self._boundary

    @property
    def inverse_box(self) -> np.ndarray:
        return self._inv

    @property
    def volume(self) -> float:
        return self._volume

    @property
    def triclinic(self) -> bool:
        return self._triclinic

    @property
    def lengths(self) -> np.ndarray:
        """Norms of the three cell vectors."""
        return np.linalg.norm(self._matrix, axis=1)

    @property
    def angles(self) -> np.ndarray:
        """Cell angles (alpha, beta, gamma) in degrees."""
        a, b, c = self._matrix
        na, nb, nc = self.lengths
        alpha = np.degrees(np.arccos(np.dot(b, c) / (nb * nc)))
        beta = np.degrees(np.arccos(np.dot(a, c) / (na * nc)))
        gamma = np.degrees(np.arccos(np.dot(a, b) / (na * nb)))
        return np.array([alpha, beta, gamma])

    def __repr__(self) -> str:
        return (
            f"Box information:\n{self._matrix}\nOrigin: {self._origin}\n"
            f"Triclinic: {self._triclinic}\nBoundary: {self._boundary}"
        )

    def __eq__(self, other) -> bool:
        if not isinstance(other, Box):
            return NotImplemented
        return (
            np.allclose(self._matrix, other._matrix)
            and np.allclose(self._origin, other._origin)
            and np.array_equal(self._boundary, other._boundary)
        )

    # ---- derived geometry --------------------------------------------------
    def get_thickness(self) -> np.ndarray:
        """Perpendicular distance between opposite box faces per direction.

        Parity: reference box.py:465-481.
        """
        m = self._matrix
        v = abs(self._volume)
        return np.array(
            [
                v / np.linalg.norm(np.cross(m[1], m[2])),
                v / np.linalg.norm(np.cross(m[0], m[2])),
                v / np.linalg.norm(np.cross(m[0], m[1])),
            ]
        )

    def check_small_box(self, rc: float) -> np.ndarray:
        """Replications needed per periodic direction so that thickness >= 2*rc.

        Parity: reference box.py:483-502.
        """
        thickness = self.get_thickness()
        repeat = np.ones(3, dtype=np.int32)
        for i in range(3):
            if self._boundary[i] == 1 and thickness[i] < 2 * rc:
                repeat[i] = int(np.ceil(2.0 * rc / thickness[i]))
        return repeat

    def is_general_box(self, tol: float = 1e-6) -> bool:
        """True if the cell is not in LAMMPS lower-triangular form.

        Parity: reference box.py:390-423.
        """
        m = self._matrix
        return bool(
            m[0, 0] <= tol
            or m[1, 1] <= tol
            or m[2, 2] <= tol
            or abs(m[0, 1]) > tol
            or abs(m[0, 2]) > tol
            or abs(m[1, 2]) > tol
        )

    def align_to_lammps_box(self) -> Tuple["Box", np.ndarray]:
        """Rotate the cell into LAMMPS lower-triangular convention.

        Returns the aligned Box and the 3x3 rotation R with
        ``aligned_matrix = matrix @ R``.  Parity: reference box.py:425-443.
        """
        m = self._matrix
        ax = np.linalg.norm(m[0])
        ahat = m[0] / ax
        bx = m[1] @ ahat
        by = np.sqrt(np.linalg.norm(m[1]) ** 2 - bx**2)
        cx = m[2] @ ahat
        cy = (m[1] @ m[2] - bx * cx) / by
        cz = np.sqrt(np.linalg.norm(m[2]) ** 2 - cx**2 - cy**2)
        aligned = np.array([[ax, 0, 0], [bx, by, 0], [cx, cy, cz]], dtype=np.float64)
        rotation = np.linalg.solve(m, aligned)
        return Box(aligned, self._boundary, self._origin), rotation

    # ---- PBC math (host convenience; device path uses the free functions) --
    def pbc(self, rij: np.ndarray) -> np.ndarray:
        """Minimum-image a displacement vector (or array of them).

        Parity: reference box.py:445-463.
        """
        return min_image(np.asarray(rij, dtype=np.float64), self._matrix, self._inv, self._boundary)

    def wrap(self, pos: np.ndarray) -> np.ndarray:
        """Wrap absolute positions into the primary cell."""
        return wrap_positions(
            np.asarray(pos, dtype=np.float64),
            self._matrix,
            self._inv,
            self._origin,
            self._boundary,
        )

    def replicate(self, nx: int, ny: int, nz: int) -> "Box":
        rep = np.array([nx, ny, nz], dtype=np.float64)
        return Box(self._matrix * rep[:, None], self._boundary, self._origin)

    def to_dict(self) -> dict:
        return {
            "matrix": self._matrix.tolist(),
            "origin": self._origin.tolist(),
            "boundary": self._boundary.tolist(),
        }


def init_box(
    box: BoxLike,
    boundary: Optional[Iterable[int]] = None,
    origin: Optional[Iterable[float]] = None,
) -> Box:
    """Coerce any accepted box description into a Box (idempotent for Box)."""
    if isinstance(box, Box) and boundary is None and origin is None:
        return box
    return Box(box, boundary, origin)


# ---------------------------------------------------------------------------
# Pure array functions: work with numpy or jax.numpy inputs (traceable).
# ---------------------------------------------------------------------------


def frac_coords(pos, inv_matrix, origin=None):
    """Cartesian -> fractional coordinates. pos: (..., 3)."""
    if origin is not None:
        pos = pos - origin
    return pos @ inv_matrix


def min_image(rij, matrix, inv_matrix, boundary):
    """Minimum-image displacement(s). rij: (..., 3); works under jit.

    Free directions (boundary==0) are left untouched.
    """
    frac = rij @ inv_matrix
    shift = np.floor(frac + 0.5) if isinstance(frac, np.ndarray) else None
    if shift is None:  # traced / jax array
        import jax.numpy as jnp

        shift = jnp.floor(frac + 0.5)
        frac = frac - shift * boundary
        return frac @ matrix
    frac = frac - shift * np.asarray(boundary)
    return frac @ matrix


def wrap_positions(pos, matrix, inv_matrix, origin, boundary):
    """Wrap absolute positions into [origin, origin + cell)."""
    frac = (pos - origin) @ inv_matrix
    if isinstance(frac, np.ndarray):
        shift = np.floor(frac)
        frac = frac - shift * np.asarray(boundary)
    else:
        import jax.numpy as jnp

        shift = jnp.floor(frac)
        frac = frac - shift * boundary
    return frac @ matrix + origin
