"""Voronoi tessellation: per-atom cell volume, neighbor faces, cavity radius.

Parity: reference src/voronoi.cpp (voro++ wrapper) + src/mdapy/voronoi.py —
outputs volume, neighbor_number (faces), cavity_radius = max vertex distance,
the face-area-filtered Voronoi neighbor lists used by Steinhardt's Voronoi
weighting (voronoi.py:71, voronoi.cpp:246-299: keep faces with
area > max(a_threshold, cell_total_area * r_threshold)), the detailed
per-cell geometry of get_cell_info (voronoi.py:184), and the Cell/Container
wrappers (voronoi.py:331, 372).

Implementation: scipy's Qhull with explicit periodic ghost images — the
branch-heavy polytope clipping stays on the host (SURVEY.md §7 marks Voronoi
as the one justified host-geometry fallback); everything downstream consumes
plain arrays.  Small periodic systems get extra ghost shells instead of the
reference's explicit replication (voronoi.py:116-135) — indices then already
map back to original atoms.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional

import numpy as np

from ..core.box import init_box

__all__ = ["VoronoiAnalysis", "Cell", "Container"]


class VoronoiAnalysis:
    def __init__(self, pos, box):
        pos = getattr(pos, "pos", pos)
        self.pos = np.ascontiguousarray(np.asarray(pos, dtype=np.float64))
        self.box = init_box(box)
        self.volume = None
        self.neighbor_number = None
        self.cavity_radius = None
        self.verlet_list = None
        self.distance_list = None
        self.face_areas = None

    # ------------------------------------------------------------------
    def _ghosted(self):
        """Original atoms + periodic ghost images within a margin.

        Small systems need ghosts beyond the first image shell (the
        reference replicates the box until N >= 50, voronoi.py:116-127);
        here the shell count per axis grows with the fractional margin.
        """
        box = self.box
        n = len(self.pos)
        # margin: a few typical interatomic spacings bounds the cell extent
        vol = abs(box.volume)
        margin = 4.0 * (vol / max(n, 1)) ** (1.0 / 3.0)
        frac_margin = margin / box.get_thickness()
        frac = (self.pos - box.origin) @ box.inverse_box
        per = box.boundary.astype(bool)
        frac = np.where(per, frac - np.floor(frac), frac)
        shells = [int(np.ceil(frac_margin[d])) if per[d] else 0 for d in range(3)]
        pts = [frac]
        ids = [np.arange(n)]
        for sx in range(-shells[0], shells[0] + 1):
            for sy in range(-shells[1], shells[1] + 1):
                for sz in range(-shells[2], shells[2] + 1):
                    if (sx, sy, sz) == (0, 0, 0):
                        continue
                    g = frac + np.array([sx, sy, sz])
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

    def _engine_run(self, max_nei: int = 64):
        """Run the native clipping engine (native/voro_engine.cpp).

        The engine builds its own fractional-space cell grid and walks
        candidate cells outward with the security-radius termination
        (image-aware — no Python-side neighbor list or replication), the
        voro++ growing-block-search idea (reference voronoi.cpp:45-60 /
        v_compute_3d.cc) re-designed around the face-loop clipping cell.
        ``max_ring`` escalates for atoms whose walk was exhausted unclosed
        (sparse/void-heavy systems).

        Returns (volume, cavity, nface, nei_idx, nei_area, nei_dist) for the
        original atoms; neighbor indices are original ids."""
        import ctypes

        from ..native import load_library

        lib = load_library("voro_engine")
        fn = lib.voro_compute_grid
        fn.restype = None

        n = len(self.pos)
        box = self.box
        diam = float(np.linalg.norm(box.matrix.sum(axis=0)))
        walls = self._walls()
        wall_rows = (
            np.array([[w[0][0], w[0][1], w[0][2], w[1]] for w in walls])
            if walls else np.zeros((0, 4))
        )
        # start the seed cube at a few typical spacings — tiny polygons make
        # the early clips cheap; any atom whose cell still touches the cube
        # raises its flag and the loop escalates both cube and ring
        vol_per = abs(box.volume) / max(n, 1)
        h0 = min(4.0 * vol_per ** (1.0 / 3.0), 1.05 * diam)
        pos64 = np.ascontiguousarray(self.pos, np.float64)
        for max_ring in (3, 6, 12, 24, 48, 96):
            volume = np.zeros(n)
            cavity = np.zeros(n)
            nface = np.zeros(n, np.int32)
            flags = np.zeros(n, np.int32)
            nei_idx = np.full((n, max_nei), -1, np.int32)
            nei_area = np.zeros((n, max_nei))
            nei_dist = np.zeros((n, max_nei))
            fn(
                pos64.ctypes.data_as(ctypes.c_void_p),
                ctypes.c_int64(n),
                np.ascontiguousarray(box.matrix).ctypes.data_as(ctypes.c_void_p),
                np.ascontiguousarray(box.inverse_box).ctypes.data_as(ctypes.c_void_p),
                np.ascontiguousarray(box.origin).ctypes.data_as(ctypes.c_void_p),
                np.ascontiguousarray(box.boundary, np.int32).ctypes.data_as(ctypes.c_void_p),
                np.ascontiguousarray(wall_rows).ctypes.data_as(ctypes.c_void_p),
                ctypes.c_int64(len(wall_rows)), ctypes.c_double(h0),
                ctypes.c_int32(max_ring),
                volume.ctypes.data_as(ctypes.c_void_p),
                cavity.ctypes.data_as(ctypes.c_void_p),
                nface.ctypes.data_as(ctypes.c_void_p),
                flags.ctypes.data_as(ctypes.c_void_p),
                nei_idx.ctypes.data_as(ctypes.c_void_p),
                nei_area.ctypes.data_as(ctypes.c_void_p),
                nei_dist.ctypes.data_as(ctypes.c_void_p),
                ctypes.c_int64(max_nei),
                ctypes.c_int32(0),
            )
            if not flags.any():
                break
            h0 = min(4.0 * h0, 1.05 * diam)
        return volume, cavity, nface, nei_idx, nei_area, nei_dist

    def compute(self, backend: str = "native"):
        """Per-atom volume / face count / cavity radius.

        ``backend='native'`` uses the OpenMP C++ clipping engine (fast path,
        1M-atom capable); ``'qhull'`` keeps the scipy reference path."""
        if backend == "native":
            try:
                out = self._engine_run()
            except Exception as exc:  # pragma: no cover - toolchain missing
                import warnings

                warnings.warn(
                    f"native voro engine unavailable ({exc!r}); "
                    "falling back to the scipy path", RuntimeWarning,
                )
                return self.compute(backend="qhull")
            self.volume, self.cavity_radius, self.neighbor_number = out[:3]
            return self

        from scipy.spatial import ConvexHull

        cart, ids = self._ghosted()
        n = len(self.pos)
        box = self.box
        per = box.boundary.astype(bool)
        volume = np.zeros(n)
        cavity = np.zeros(n)
        nface = np.zeros(n, dtype=np.int32)
        partners = self._partners(cart, n, per)
        walls = self._walls()
        for i in range(n):
            verts, faces, areas = self._cell_geometry(cart, i, partners[i], walls)
            hull = None
            if verts is not None:
                try:
                    hull = ConvexHull(verts)
                except Exception:
                    hull = None
            if hull is None:
                import warnings

                warnings.warn(
                    f"Voronoi cell construction failed for atom {i}; "
                    "its volume is reported as 0", RuntimeWarning,
                )
                continue
            volume[i] = hull.volume
            cavity[i] = np.max(np.linalg.norm(verts - cart[i], axis=1))
            nface[i] = len(faces)
        self.volume = volume
        self.neighbor_number = nface
        self.cavity_radius = cavity
        return self

    # ------------------------------------------------------------------
    def _partners(self, cart, n, per):
        """Candidate bisector partners per original atom."""
        if per.all():
            from scipy.spatial import Voronoi

            vor = Voronoi(cart)
            partners = [[] for _ in range(n)]
            for (a, b) in vor.ridge_points:
                if a < n:
                    partners[a].append(b)
                if b < n:
                    partners[b].append(a)
            return partners
        from scipy.spatial import cKDTree

        vol = abs(self.box.volume)
        r_ball = 8.0 * (vol / max(n, 1)) ** (1.0 / 3.0)
        tree = cKDTree(cart)
        balls = tree.query_ball_point(cart[:n], r_ball)
        return [[p for p in ball if p != i] for i, ball in enumerate(balls)]

    def _walls(self):
        """Wall half-spaces for free dims (container clipping, voro++ parity)."""
        box = self.box
        per = box.boundary.astype(bool)
        walls = []
        for d in range(3):
            if per[d]:
                continue
            nvec = box.matrix[d] / np.linalg.norm(box.matrix[d])
            lo = float(nvec @ box.origin)
            hi = float(nvec @ (box.origin + box.matrix[d]))
            walls.append((-nvec, lo))    # n.x >= lo  ->  -n.x + lo <= 0
            walls.append((nvec, -hi))    # n.x <= hi  ->   n.x - hi <= 0
        return walls

    @staticmethod
    def _cell_geometry(cart, i, partner_ids, walls):
        """Exact cell polytope and its finite-area faces.

        Returns (vertices (M,3), faces [list of ordered vertex-index lists],
        face_info [(plane_row, area)]).  Planes carrying a finite-area facet
        count as faces (wall facets included, voro++ parity; degenerate
        vertex-touching planes excluded — in perfect lattices second-shell
        bisectors pass through cell vertices).
        """
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
            return None, [], []
        A = np.asarray(A)
        b = np.asarray(b)
        norms = np.linalg.norm(A, axis=1)
        interior = x
        slack = A @ x + b
        if np.any(slack >= -1e-12):
            # interior point via Chebyshev center (robust for on-wall atoms)
            from scipy.optimize import linprog

            res = linprog(
                c=np.r_[np.zeros(3), -1.0],
                A_ub=np.c_[A, norms],
                b_ub=-b,
                bounds=[(None, None)] * 3 + [(1e-12, None)],
                method="highs",
            )
            if not res.success:
                return None, [], []
            interior = res.x[:3]
        try:
            hs = HalfspaceIntersection(np.c_[A, b], interior)
        except Exception:
            return None, [], []
        verts = hs.intersections
        dist = np.abs(verts @ A.T + b) / norms
        faces = []
        face_info = []
        for p in range(A.shape[0]):
            on_idx = np.nonzero(dist[:, p] < 1e-7)[0]
            if len(on_idx) < 3:
                continue
            onp = verts[on_idx]
            c0 = onp.mean(axis=0)
            rel = onp - c0
            # order vertices by angle in the face plane
            nrm = A[p] / norms[p]
            u = rel[0] - (rel[0] @ nrm) * nrm
            un = np.linalg.norm(u)
            if un < 1e-12:
                continue
            u /= un
            v = np.cross(nrm, u)
            ang = np.arctan2(rel @ v, rel @ u)
            order = np.argsort(ang)
            poly = onp[order]
            area = 0.0
            for k in range(len(poly)):
                v1 = poly[k] - c0
                v2 = poly[(k + 1) % len(poly)] - c0
                area += 0.5 * np.linalg.norm(np.cross(v1, v2))
            if area < 1e-10:
                continue
            faces.append([int(on_idx[o]) for o in order])
            face_info.append((p, area))
        return verts, faces, face_info

    # ------------------------------------------------------------------
    def compute_neighbors(
        self,
        a_face_area_threshold: float = -1.0,
        r_face_area_threshold: float = -1.0,
    ):
        """Voronoi neighbor lists with face areas (reference voronoi.py:71).

        Keeps faces with area > max(a_threshold, total_cell_area * r_threshold)
        (voronoi.cpp:252-265).  Rows are compacted and distance-sorted; -1
        pads unfilled slots.
        """
        try:
            vol, cav, nf, nei_idx, nei_area, nei_dist = self._engine_run()
        except Exception:  # pragma: no cover - toolchain missing
            nei_idx = None
        if nei_idx is not None:
            n, Mn = nei_idx.shape
            ok = nei_idx >= 0
            area_min = np.full(n, max(a_face_area_threshold, 0.0))
            if r_face_area_threshold > 0:
                total = np.sum(np.where(ok, nei_area, 0.0), axis=1)
                area_min = np.maximum(area_min, total * r_face_area_threshold)
            keep = ok & (nei_area > area_min[:, None])
            big = np.where(keep, nei_dist, np.inf)
            order = np.argsort(big, axis=1, kind="stable")
            verlet = np.take_along_axis(
                np.where(keep, nei_idx, -1), order, axis=1
            )
            dist = np.take_along_axis(
                np.where(keep, nei_dist, 0.0), order, axis=1
            )
            areas = np.take_along_axis(
                np.where(keep, nei_area, 0.0), order, axis=1
            )
            nn = keep.sum(axis=1).astype(np.int32)
            Mc = max(1, int(nn.max()) if n else 1)
            self.verlet_list = verlet[:, :Mc]
            self.distance_list = dist[:, :Mc]
            self.face_areas = areas[:, :Mc]
            self.neighbor_number = nn
            self.volume = vol
            self.cavity_radius = cav
            return self

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
            if a < n:
                neigh[a].append((ids[b], np.linalg.norm(cart[b] - cart[a]), area))
            if b < n:
                neigh[b].append((ids[a], np.linalg.norm(cart[b] - cart[a]), area))
        # face-area filtering: larger of the absolute and relative thresholds
        if a_face_area_threshold > 0 or r_face_area_threshold > 0:
            for i, lst in enumerate(neigh):
                area_min = max(a_face_area_threshold, 0.0)
                if r_face_area_threshold > 0:
                    total = sum(t[2] for t in lst)
                    area_min = max(area_min, total * r_face_area_threshold)
                neigh[i] = [t for t in lst if t[2] > area_min]
        M = max(1, max((len(v) for v in neigh), default=1))
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

    # ------------------------------------------------------------------
    def get_cell_info(self):
        """Detailed per-cell geometry (reference voronoi.py:184).

        Returns (face_vertices_indices, face_vertices_positions, volume,
        radius, face_areas) — per atom: faces as vertex-index lists into the
        atom's unique vertex array (voronoi.cpp:499-531 layout), that vertex
        array as (M, 3) coordinates, cell volume, cavity radius (farthest
        vertex), and per-face areas.  Orthogonal boxes only (reference
        asserts the same, voronoi.py:234).
        """
        assert not self.box.triclinic, "Only support orthogonal box."
        assert len(self.pos) > 1, "At least has one atom."
        from scipy.spatial import ConvexHull

        cart, ids = self._ghosted()
        n = len(self.pos)
        per = self.box.boundary.astype(bool)
        partners = self._partners(cart, n, per)
        walls = self._walls()
        fvi: List[List[List[int]]] = []
        fvp: List[List[List[float]]] = []
        volume: List[float] = []
        radius: List[float] = []
        fareas: List[List[float]] = []
        for i in range(n):
            verts, faces, face_info = self._cell_geometry(cart, i, partners[i], walls)
            if verts is None:
                fvi.append([])
                fvp.append([])
                volume.append(0.0)
                radius.append(0.0)
                fareas.append([])
                continue
            try:
                vol = float(ConvexHull(verts).volume)
            except Exception:
                vol = 0.0
            fvi.append(faces)
            fvp.append([list(map(float, v)) for v in verts])
            volume.append(vol)
            radius.append(float(np.max(np.linalg.norm(verts - cart[i], axis=1))))
            fareas.append([float(a) for (_, a) in face_info])
        return fvi, fvp, volume, radius, fareas


@dataclass
class Cell:
    """Geometry of one Voronoi cell (reference voronoi.py:331-369)."""

    face_vertices: List[List[int]]
    vertices: np.ndarray
    volume: float
    cavity_radius: float
    face_areas: np.ndarray
    pos: np.ndarray


class Container:
    """List-like access to every atom's Voronoi Cell (reference voronoi.py:372).

    Accepts an (N, 3) position array or any object with a ``pos`` attribute
    (e.g. System / AtomFrame).
    """

    def __init__(self, data, box):
        pos = np.asarray(getattr(data, "pos", data), dtype=np.float64)
        assert pos.ndim == 2 and pos.shape[1] == 3
        vor = VoronoiAnalysis(pos, box)
        fvi, fvp, volume, radius, fareas = vor.get_cell_info()
        self._data: List[Cell] = []
        for i in range(len(pos)):
            self._data.append(
                Cell(
                    fvi[i],
                    np.asarray(fvp[i], np.float64).reshape(-1, 3),
                    volume[i],
                    radius[i],
                    np.asarray(fareas[i], np.float64),
                    pos[i].copy(),
                )
            )

    def __getitem__(self, index: int):
        return self._data[index]

    def __len__(self):
        return len(self._data)

    def __iter__(self):
        return iter(self._data)
