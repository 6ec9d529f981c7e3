"""Scene assembly: world-space primitives -> flipped, padded device arrays.

Primitives mirror the reference renderer's scene content
(tachyon_render.h:302-355): spheres (atoms), finite cylinders (bonds & box
edges) and ring end-caps.  All coordinates are z-flipped into Tachyon space
(tvec, tachyon_render.h:58) at assembly time so the tracer reproduces the
reference geometry bit-for-bit by construction.

Arrays are padded to a multiple of ``pad`` so jit caches stay warm across
frames with slightly different primitive counts; padded slots carry
radius/rout = -1 which no ray can hit.
"""

from __future__ import annotations

from dataclasses import dataclass, fields

import jax
from typing import Optional

import numpy as np

__all__ = ["Scene", "build_scene"]

FLIP = np.array([1.0, 1.0, -1.0])


def _pad_to(arr: np.ndarray, n: int, fill: float = 0.0) -> np.ndarray:
    if arr.shape[0] == n:
        return arr
    pad = np.full((n - arr.shape[0],) + arr.shape[1:], fill, dtype=arr.dtype)
    return np.concatenate([arr, pad], axis=0)


def _round_up(x: int, m: int) -> int:
    return max(m, -(-x // m) * m)


@jax.tree_util.register_dataclass
@dataclass
class Scene:
    """Padded primitive arrays in flipped (Tachyon) space. float32/64 numpy.

    Registered as a JAX pytree (all fields are array leaves) so a Scene can
    flow straight through jit/grad/shard_map."""

    sph_center: np.ndarray  # (Ns,3)
    sph_radius: np.ndarray  # (Ns,)   (-1 padding)
    sph_color: np.ndarray   # (Ns,4)
    cyl_base: np.ndarray    # (Nc,3)
    cyl_axis: np.ndarray    # (Nc,3)  unnormalized, |axis| = length
    cyl_radius: np.ndarray  # (Nc,)   (-1 padding)
    cyl_color: np.ndarray   # (Nc,4)
    ring_center: np.ndarray # (Nr,3)
    ring_normal: np.ndarray # (Nr,3)  unit
    ring_rout: np.ndarray   # (Nr,)   (-1 padding)
    ring_color: np.ndarray  # (Nr,4)

    @property
    def n_spheres(self) -> int:
        return int(np.sum(self.sph_radius > 0))

    @property
    def n_cylinders(self) -> int:
        return int(np.sum(self.cyl_radius > 0))

    @property
    def n_rings(self) -> int:
        return int(np.sum(self.ring_rout > 0))

    def bounds(self):
        """Conservative world-space (flipped) AABB over live primitives."""
        pts = []
        if self.n_spheres:
            m = self.sph_radius > 0
            pts.append(self.sph_center[m] - self.sph_radius[m, None])
            pts.append(self.sph_center[m] + self.sph_radius[m, None])
        if self.n_cylinders:
            m = self.cyl_radius > 0
            a = self.cyl_base[m]
            b = a + self.cyl_axis[m]
            r = self.cyl_radius[m, None]
            pts += [a - r, a + r, b - r, b + r]
        if self.n_rings:
            m = self.ring_rout > 0
            c = self.ring_center[m]
            r = self.ring_rout[m, None]
            pts += [c - r, c + r]
        if not pts:
            z = np.zeros(3)
            return z, z
        allp = np.concatenate(pts, axis=0)
        return allp.min(axis=0), allp.max(axis=0)


def build_scene(
    positions: np.ndarray,
    colors: np.ndarray,
    radii: np.ndarray,
    bond_edges: Optional[np.ndarray] = None,
    bond_colors: Optional[np.ndarray] = None,
    bond_radius: float = 0.1,
    box_edges: Optional[np.ndarray] = None,
    box_edge_radius: float = 0.05,
    box_color=(1.0, 1.0, 1.0, 1.0),
    dtype=np.float32,
    pad: int = 256,
) -> Scene:
    """Assemble the scene exactly as TachyonRenderer::render does
    (tachyon_render.h:302-355): one sphere per particle, an fcylinder plus two
    ring caps per bond/box edge (caps at both endpoints, normal along +-axis,
    inner radius 0)."""
    positions = np.asarray(positions, dtype=np.float64) * FLIP
    colors = np.asarray(colors, dtype=np.float64)
    radii = np.asarray(radii, dtype=np.float64)

    # zero-alpha particles are skipped by the reference (tachyon_render.h:305)
    keep = colors[:, 3] > 0.0
    sph_center = positions[keep]
    sph_radius = radii[keep]
    sph_color = colors[keep]

    cyl_base = np.zeros((0, 3))
    cyl_axis = np.zeros((0, 3))
    cyl_radius = np.zeros((0,))
    cyl_color = np.zeros((0, 4))
    ring_center = np.zeros((0, 3))
    ring_normal = np.zeros((0, 3))
    ring_rout = np.zeros((0,))
    ring_color = np.zeros((0, 4))

    def add_edges(edges, ecolors, radius):
        nonlocal cyl_base, cyl_axis, cyl_radius, cyl_color
        nonlocal ring_center, ring_normal, ring_rout, ring_color
        edges = np.asarray(edges, dtype=np.float64) * FLIP
        a = edges[:, 0]
        b = edges[:, 1]
        axis = b - a
        length = np.linalg.norm(axis, axis=1)
        ok = length > 1e-12
        a, b, axis, ecolors = a[ok], b[ok], axis[ok], ecolors[ok]
        unit = axis / np.linalg.norm(axis, axis=1)[:, None]
        k = a.shape[0]
        cyl_base = np.concatenate([cyl_base, a], axis=0)
        cyl_axis = np.concatenate([cyl_axis, axis], axis=0)
        cyl_radius = np.concatenate([cyl_radius, np.full(k, radius)], axis=0)
        cyl_color = np.concatenate([cyl_color, ecolors], axis=0)
        # ring caps: at a with normal -axis, at b with normal +axis
        ring_center = np.concatenate([ring_center, a, b], axis=0)
        ring_normal = np.concatenate([ring_normal, -unit, unit], axis=0)
        ring_rout = np.concatenate([ring_rout, np.full(2 * k, radius)], axis=0)
        ring_color = np.concatenate([ring_color, ecolors, ecolors], axis=0)

    if bond_edges is not None and len(bond_edges):
        k = len(bond_edges)
        if bond_colors is None:
            bond_colors = np.tile(np.array([0.8, 0.8, 0.8, 1.0]), (k, 1))
        bc = np.asarray(bond_colors, dtype=np.float64)
        sel = bc[:, 3] > 0.0
        add_edges(np.asarray(bond_edges)[sel], bc[sel], float(bond_radius))
    if box_edges is not None and len(box_edges):
        k = len(box_edges)
        col = np.tile(np.asarray(box_color, dtype=np.float64), (k, 1))
        add_edges(np.asarray(box_edges), col, float(box_edge_radius))

    ns = _round_up(len(sph_center), pad)
    nc = _round_up(len(cyl_base), pad) if len(cyl_base) else pad
    nr = _round_up(len(ring_center), pad) if len(ring_center) else pad

    return Scene(
        sph_center=_pad_to(sph_center, ns).astype(dtype),
        sph_radius=_pad_to(sph_radius, ns, fill=-1.0).astype(dtype),
        sph_color=_pad_to(sph_color, ns).astype(dtype),
        cyl_base=_pad_to(cyl_base, nc).astype(dtype),
        cyl_axis=_pad_to(cyl_axis, nc, fill=1.0).astype(dtype),
        cyl_radius=_pad_to(cyl_radius, nc, fill=-1.0).astype(dtype),
        cyl_color=_pad_to(cyl_color, nc).astype(dtype),
        ring_center=_pad_to(ring_center, nr).astype(dtype),
        ring_normal=_pad_to(ring_normal, nr, fill=1.0).astype(dtype),
        ring_rout=_pad_to(ring_rout, nr, fill=-1.0).astype(dtype),
        ring_color=_pad_to(ring_color, nr).astype(dtype),
    )


def scene_from_arrays(positions, colors, radii, dtype=None) -> Scene:
    """Traceable sphere-only Scene for the differentiable path.

    Unlike :func:`build_scene` (host numpy, filtering + padding), this uses
    jnp ops end to end so ``jax.grad`` flows from pixels back to positions,
    radii and colors.  Cylinder/ring slots are dummy (-1 radius) rows."""
    import jax.numpy as jnp

    pos = jnp.asarray(positions)
    if dtype is not None:
        pos = pos.astype(dtype)
    dt = pos.dtype
    pos = pos * jnp.asarray(FLIP, dt)
    col = jnp.asarray(colors, dt)
    rad = jnp.asarray(radii, dt)
    k = 8
    return Scene(
        sph_center=pos,
        sph_radius=rad,
        sph_color=col,
        cyl_base=jnp.zeros((k, 3), dt),
        cyl_axis=jnp.ones((k, 3), dt),
        cyl_radius=jnp.full((k,), -1.0, dt),
        cyl_color=jnp.zeros((k, 4), dt),
        ring_center=jnp.zeros((k, 3), dt),
        ring_normal=jnp.ones((k, 3), dt),
        ring_rout=jnp.full((k,), -1.0, dt),
        ring_color=jnp.zeros((k, 4), dt),
    )
