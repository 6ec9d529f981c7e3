"""Scene geometry passes: cell-edge segments and PBC-aware bond cylinders.

Parity with the reference's pure-python passes:
  - _box_edges (render.py:800-851): 12 cell-edge segments
  - _bond_edges (render.py:854-1030): minimum-image bonds split into
    fractional-space pieces at periodic boundaries, trimmed at atom-sphere
    surfaces (embed factor 1.15*bond_radius), optional per-atom half-bond
    coloring
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

__all__ = ["box_edges", "bond_edges"]


def box_edges(box) -> np.ndarray:
    """12 edges of the simulation cell as (12,2,3) segments."""
    m = np.asarray(box.matrix, dtype=np.float64)
    o = np.asarray(box.origin, dtype=np.float64)
    a, b, c = m[0], m[1], m[2]
    v = np.array(
        [o, o + a, o + b, o + a + b, o + c, o + a + c, o + b + c, o + a + b + c]
    )
    idx = [
        (0, 1), (2, 3), (4, 5), (6, 7),   # along a
        (0, 2), (1, 3), (4, 6), (5, 7),   # along b
        (0, 4), (1, 5), (2, 6), (3, 7),   # along c
    ]
    edges = np.empty((12, 2, 3), dtype=np.float64)
    for k, (i, j) in enumerate(idx):
        edges[k, 0] = v[i]
        edges[k, 1] = v[j]
    return edges


def bond_edges(
    pos: np.ndarray,
    box,
    bond: np.ndarray,
    atom_colors: np.ndarray,
    atom_radii: Optional[np.ndarray] = None,
    bond_radius: float = 0.1,
    color_mode: str = "uniform",
) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """Bond cylinder segments (K,2,3) [+ (K,4) colors in 'atom' mode]."""
    color_mode = color_mode.lower().strip()
    if color_mode not in {"uniform", "atom"}:
        raise ValueError(
            f"bond_color_mode must be 'uniform' or 'atom', got {color_mode!r}"
        )
    bond = np.ascontiguousarray(bond, dtype=np.int32)
    if bond.ndim != 2 or bond.shape[1] != 2:
        raise ValueError(f"bond must be (Nbond,2), got {bond.shape}")
    if bond.shape[0] == 0:
        return np.empty((0, 2, 3), dtype=np.float64), None

    pos = np.asarray(pos, dtype=np.float64)
    origin = np.asarray(box.origin, dtype=np.float64)
    matrix = np.asarray(box.matrix, dtype=np.float64)
    inv = np.asarray(box.inverse_box, dtype=np.float64)
    boundary = np.asarray(box.boundary, dtype=np.int32)
    n = pos.shape[0]
    if atom_radii is None:
        atom_radii = np.zeros(n, dtype=np.float64)
    else:
        atom_radii = np.ascontiguousarray(atom_radii, dtype=np.float64)

    edge_list = []
    color_list = []

    def split_fractional(s0, ds):
        """Split fractional segment s0 -> s0+ds at periodic cell faces.

        Mirrors render.py:889-933 exactly (simultaneous-face handling)."""
        pieces = []
        current = s0.copy()
        remaining = ds.copy()
        while np.linalg.norm(remaining) > 1e-12:
            target = current + remaining
            t_hit = 1.0
            hit_dims = []
            for dim in range(3):
                if boundary[dim] != 1 or abs(remaining[dim]) < 1e-12:
                    continue
                if target[dim] < 0.0:
                    t = (0.0 - current[dim]) / remaining[dim]
                elif target[dim] >= 1.0:
                    t = (1.0 - current[dim]) / remaining[dim]
                else:
                    continue
                if t < 1e-12 or t > 1.0 + 1e-12:
                    continue
                if t < t_hit - 1e-12:
                    t_hit = t
                    hit_dims = [dim]
                elif abs(t - t_hit) < 1e-12:
                    hit_dims.append(dim)
            if not hit_dims:
                pieces.append((current.copy(), target.copy()))
                break
            hit_point = current + t_hit * remaining
            inside = hit_point.copy()
            for dim in hit_dims:
                inside[dim] = 0.0 if remaining[dim] < 0.0 else 1.0
            pieces.append((current.copy(), inside))
            remaining = (1.0 - t_hit) * remaining
            current = hit_point.copy()
            for dim in hit_dims:
                if remaining[dim] < 0.0:
                    current[dim] += 1.0
                else:
                    current[dim] -= 1.0
        return pieces

    def crosses_boundary(start, disp):
        s0 = (start - origin) @ inv
        s0 = s0 - np.floor(s0)
        target = s0 + disp @ inv
        for dim in range(3):
            if boundary[dim] != 1:
                continue
            if target[dim] < -1e-12 or target[dim] >= 1.0 + 1e-12:
                return True
        return False

    def append_segment(start, disp, color=None):
        if np.linalg.norm(disp) < 1e-12:
            return
        s0 = (start - origin) @ inv
        ds = disp @ inv
        s0 = s0 - np.floor(s0)
        for s_a, s_b in split_fractional(s0, ds):
            a = origin + s_a @ matrix
            b = origin + s_b @ matrix
            if np.linalg.norm(b - a) < 1e-12:
                continue
            edge_list.append(np.stack((a, b), axis=0))
            if color is not None:
                color_list.append(color)

    for i, j in bond:
        p0 = pos[i]
        rij = box.pbc(pos[j] - pos[i])
        total_len = float(np.linalg.norm(rij))
        if total_len < 1e-12:
            continue
        unit = rij / total_len
        ri = max(0.0, float(atom_radii[i]))
        rj = max(0.0, float(atom_radii[j]))
        # embed slightly into the spheres (render.py:986-989)
        trim_i = max(0.0, ri - 1.15 * bond_radius)
        trim_j = max(0.0, rj - 1.15 * bond_radius)
        visible_len = total_len - trim_i - trim_j
        if visible_len <= 1e-12:
            continue
        if crosses_boundary(p0, rij):
            half_len = total_len * 0.5
            seg0 = half_len - trim_i
            seg1 = half_len - trim_j
            if seg0 > 1e-12:
                append_segment(
                    p0 + unit * trim_i, unit * seg0,
                    atom_colors[i] if color_mode == "atom" else None,
                )
            if seg1 > 1e-12:
                append_segment(
                    pos[j] - unit * trim_j, -unit * seg1,
                    atom_colors[j] if color_mode == "atom" else None,
                )
        elif color_mode == "atom":
            half_visible = visible_len * 0.5
            append_segment(p0 + unit * trim_i, unit * half_visible, atom_colors[i])
            append_segment(pos[j] - unit * trim_j, -unit * half_visible, atom_colors[j])
        else:
            append_segment(p0 + unit * trim_i, unit * visible_len, None)

    if not edge_list:
        return np.empty((0, 2, 3), dtype=np.float64), None
    edges = np.asarray(edge_list, dtype=np.float64)
    if color_mode == "uniform":
        return edges, None
    return edges, np.asarray(color_list, dtype=np.float32)
