"""Voronoi tessellation: per-atom cell volume, neighbor faces, cavity radius.

Parity: reference src/voronoi.cpp (voro++ wrapper) + voronoi.py — outputs
volume, neighbor_number (faces), cavity_radius = max vertex distance, and the
face-area-filtered Voronoi neighbor lists used by Steinhardt's Voronoi
weighting.

Implementation: scipy's Qhull with explicit periodic ghost images — the
branch-heavy polytope clipping stays on the host (SURVEY.md §7 marks Voronoi
as the one justified host-geometry fallback); everything downstream consumes
plain arrays.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..core.box import init_box

__all__ = ["VoronoiAnalysis"]


class VoronoiAnalysis:
    def __init__(self, pos, box):
        self.pos = np.ascontiguousarray(pos, dtype=np.float64)
        self.box = init_box(box)
        self.volume = None
        self.neighbor_number = None
        self.cavity_radius = None
        self.verlet_list = None
        self.distance_list = None
        self.face_areas = None

    # ------------------------------------------------------------------
    def _ghosted(self):
        """Original atoms + periodic ghost images within a margin."""
        box = self.box
        n = len(self.pos)
        # margin: a few typical interatomic spacings bounds the cell extent
        vol = abs(box.volume)
        margin = 4.0 * (vol / max(n, 1)) ** (1.0 / 3.0)
        frac_margin = margin / box.get_thickness()
        frac = (self.pos - box.origin) @ box.inverse_box
        per = box.boundary.astype(bool)
        frac = np.where(per, frac - np.floor(frac), frac)
        pts = [frac]
        ids = [np.arange(n)]
        shifts = []
        for sx in (-1, 0, 1):
            for sy in (-1, 0, 1):
                for sz in (-1, 0, 1):
                    if (sx, sy, sz) == (0, 0, 0):
                        continue
                    s = np.array([sx, sy, sz])
                    if np.any((s != 0) & ~per):
                        continue
                    shifts.append(s)
        for s in shifts:
            g = frac + s
            keep = np.ones(n, dtype=bool)
            for d in range(3):
                keep &= (g[:, d] > -frac_margin[d]) & (g[:, d] < 1 + frac_margin[d])
            if keep.any():
                pts.append(g[keep])
                ids.append(np.nonzero(keep)[0])
        allfrac = np.concatenate(pts, axis=0)
        allids = np.concatenate(ids, axis=0)
        cart = allfrac @ box.matrix + box.origin
        return cart, allids

    def compute(self):
        from scipy.spatial import ConvexHull, Voronoi

        cart, ids = self._ghosted()
        n = len(self.pos)
        box = self.box
        per = box.boundary.astype(bool)
        vor = Voronoi(cart)
        volume = np.zeros(n)
        cavity = np.zeros(n)
        nface = np.zeros(n, dtype=np.int32)
        # partners per original atom (bisector planes).  scipy omits ridges
        # of unbounded regions, so with free walls use a kd-tree ball instead.
        if per.all():
            partners = [[] for _ in range(n)]
            for (a, b) in vor.ridge_points:
                if a < n:
                    partners[a].append(b)
                if b < n:
                    partners[b].append(a)
        else:
            from scipy.spatial import cKDTree

            vol = abs(box.volume)
            r_ball = 8.0 * (vol / max(n, 1)) ** (1.0 / 3.0)
            tree = cKDTree(cart)
            balls = tree.query_ball_point(cart[:n], r_ball)
            partners = [[p for p in ball if p != i] for i, ball in enumerate(balls)]
        # wall half-spaces for free dims (container clipping, voro++ parity)
        walls = []
        for d in range(3):
            if per[d]:
                continue
            nvec = box.matrix[d] / np.linalg.norm(box.matrix[d])
            lo = float(nvec @ box.origin)
            hi = float(nvec @ (box.origin + box.matrix[d]))
            walls.append((-nvec, lo))    # n.x >= lo  ->  -n.x + lo <= 0
            walls.append((nvec, -hi))    # n.x <= hi  ->   n.x - hi <= 0
        for i in range(n):
            verts, nplanes = self._cell(cart, i, partners[i], walls)
            if verts is None:
                continue
            try:
                hull = ConvexHull(verts)
            except Exception:
                continue
            volume[i] = hull.volume
            cavity[i] = np.max(np.linalg.norm(verts - cart[i], axis=1))
            nface[i] = nplanes
        self.volume = volume
        self.neighbor_number = nface
        self.cavity_radius = cavity
        return self

    @staticmethod
    def _cell(cart, i, partner_ids, walls):
        """Exact cell polytope: bisector half-spaces + wall half-spaces."""
        from scipy.spatial import HalfspaceIntersection

        x = cart[i]
        A = []
        b = []
        for p in partner_ids:
            nvec = cart[p] - x
            mid = 0.5 * (cart[p] + x)
            A.append(nvec)
            b.append(-float(nvec @ mid))
        for nvec, off in walls:
            A.append(nvec)
            b.append(off)
        if not A:
            return None, 0
        A = np.asarray(A)
        b = np.asarray(b)
        # interior point: Chebyshev center (robust for on-wall atoms)
        norms = np.linalg.norm(A, axis=1)
        interior = x
        slack = A @ x + b
        if np.any(slack >= -1e-12):
            from scipy.optimize import linprog

            res = linprog(
                c=np.r_[np.zeros(3), -1.0],
                A_ub=np.c_[A, norms],
                b_ub=-b,
                bounds=[(None, None)] * 3 + [(1e-12, None)],
                method="highs",
            )
            if not res.success:
                return None, 0
            interior = res.x[:3]
        hs = HalfspaceIntersection(np.c_[A, b], interior)
        verts = hs.intersections
        # faces = planes carrying a finite-area facet (wall facets included,
        # voro++ parity; degenerate vertex-touching planes excluded — in
        # perfect lattices second-shell bisectors pass through cell vertices)
        n_partner = len(partner_ids)
        dist = np.abs(verts @ A.T + b) / np.linalg.norm(A, axis=1)
        nface = 0
        for p in range(A.shape[0]):
            onp = verts[dist[:, p] < 1e-7]
            if len(onp) < 3:
                continue
            c0 = onp.mean(axis=0)
            rel = onp - c0
            # polygon area via cross-product magnitude of the spanning fan
            cross = np.zeros(3)
            for k in range(len(rel)):
                cross = cross + np.cross(rel[k], rel[(k + 1) % len(rel)])
            # fan order is arbitrary; use singular values as a robust area proxy
            s = np.linalg.svd(rel, compute_uv=False)
            if len(s) >= 2 and s[0] * s[1] > 1e-10:
                nface += 1
        return verts, nface

    def compute_neighbors(self, face_area_threshold: float = -1.0):
        """Voronoi neighbor lists with face areas (voronoi.py:71)."""
        from scipy.spatial import Voronoi

        cart, ids = self._ghosted()
        n = len(self.pos)
        vor = Voronoi(cart)
        neigh = [[] for _ in range(n)]
        for ridge, (a, b) in zip(vor.ridge_vertices, vor.ridge_points):
            if -1 in ridge:
                continue
            verts = vor.vertices[ridge]
            # polygon area via fan triangulation
            c0 = verts.mean(axis=0)
            area = 0.0
            for k in range(len(verts)):
                v1 = verts[k] - c0
                v2 = verts[(k + 1) % len(verts)] - c0
                area += 0.5 * np.linalg.norm(np.cross(v1, v2))
            if face_area_threshold > 0 and area <= face_area_threshold:
                continue
            if a < n:
                neigh[a].append((ids[b], np.linalg.norm(cart[b] - cart[a]), area))
            if b < n:
                neigh[b].append((ids[a], np.linalg.norm(cart[b] - cart[a]), area))
        M = max(1, max(len(v) for v in neigh))
        verlet = np.full((n, M), -1, dtype=np.int32)
        dist = np.zeros((n, M))
        areas = np.zeros((n, M))
        nn = np.zeros(n, dtype=np.int32)
        for i, lst in enumerate(neigh):
            lst.sort(key=lambda t: t[1])
            nn[i] = len(lst)
            for k, (j, dd, ar) in enumerate(lst):
                verlet[i, k] = j
                dist[i, k] = dd
                areas[i, k] = ar
        self.verlet_list = verlet
        self.distance_list = dist
        self.face_areas = areas
        self.neighbor_number = nn
        return self
