"""Interactive 3D visualization in Jupyter via k3d (optional dependency).

Parity: reference visualize.py (View class). Requires ``k3d``; raises a
clear ImportError otherwise. For offline/batch rendering use
:class:`mdapy_tpu.TachyonRender` instead (the Pallas path).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

__all__ = ["View"]


def _require_k3d():
    try:
        import k3d
    except ImportError as err:  # pragma: no cover - optional dep
        raise ImportError(
            "View requires the optional dependency 'k3d' "
            "(https://k3d-jupyter.org). For offline rendering use "
            "mdapy_tpu.TachyonRender."
        ) from err
    return k3d


class View:
    """k3d scatter view of a System: atoms colored by element/type/field,
    box edges, colorbar label."""

    def __init__(self, system):
        _require_k3d()
        self.system = system
        self.label = None
        self.init_plot()

    def _box2lines(self) -> Tuple[np.ndarray, np.ndarray]:
        m = self.system.box.matrix
        o = self.system.box.origin
        corners = np.array([
            o, o + m[0], o + m[1], o + m[2], o + m[0] + m[1],
            o + m[0] + m[2], o + m[1] + m[2], o + m[0] + m[1] + m[2],
        ], dtype=np.float32)
        edges = np.array([
            [0, 1], [0, 2], [0, 3], [1, 4], [1, 5], [2, 4], [2, 6],
            [3, 5], [3, 6], [4, 7], [5, 7], [6, 7],
        ], dtype=np.uint32)
        return corners, edges

    def _radii(self) -> np.ndarray:
        from ..core.elements import display_radius_for_numbers, symbols_to_numbers

        data = self.system.data
        if "element" in data:
            nums = symbols_to_numbers(np.asarray(data["element"]).astype(str))
            return (display_radius_for_numbers(nums) / 2).astype(np.float32)
        return np.full(self.system.N, 0.6, dtype=np.float32)

    def _colors_by_element(self) -> np.ndarray:
        from ..core.elements import colors_for_numbers, symbols_to_numbers

        data = self.system.data
        if "element" in data:
            nums = symbols_to_numbers(np.asarray(data["element"]).astype(str))
            rgb = colors_for_numbers(nums)
        else:
            rgb = np.full((self.system.N, 3), 0.7)
        rgb = (np.clip(rgb, 0, 1) * 255).astype(np.uint32)
        return (rgb[:, 0] << 16) | (rgb[:, 1] << 8) | rgb[:, 2]

    def _colors_by_type(self) -> np.ndarray:
        from ..core.elements import colors_for_types

        types = np.asarray(self.system.data["type"], dtype=int)
        rgb = colors_for_types(types)
        rgb = (np.clip(rgb, 0, 1) * 255).astype(np.uint32)
        return (rgb[:, 0] << 16) | (rgb[:, 1] << 8) | rgb[:, 2]

    def init_plot(self) -> None:
        k3d = _require_k3d()
        self.plot = k3d.plot()
        verts, idx = self._box2lines()
        self.box = k3d.lines(verts, idx, indices_type="segment",
                             color=0x000000, width=0.1)
        self.atoms = k3d.points(
            self.system.pos.astype(np.float32),
            point_sizes=2 * self._radii(),
            colors=self._colors_by_element(),
            shader="mesh",
        )
        self.plot += self.box
        self.plot += self.atoms

    def colored_by_element(self) -> None:
        self.atoms.colors = self._colors_by_element()
        self._clear_label()

    def colored_by_type(self) -> None:
        self.atoms.colors = self._colors_by_type()
        self._clear_label()

    def colored_by(self, column: str, cmap: str = "viridis",
                   vmin: Optional[float] = None,
                   vmax: Optional[float] = None) -> None:
        """Color atoms by a per-atom scalar column with a colormap."""
        k3d = _require_k3d()
        import matplotlib.cm as cm

        vals = np.asarray(self.system.data[column], dtype=float)
        lo = vals.min() if vmin is None else vmin
        hi = vals.max() if vmax is None else vmax
        t = np.clip((vals - lo) / max(hi - lo, 1e-30), 0, 1)
        rgb = (np.array(cm.get_cmap(cmap)(t))[:, :3] * 255).astype(np.uint32)
        self.atoms.colors = (rgb[:, 0] << 16) | (rgb[:, 1] << 8) | rgb[:, 2]
        self._clear_label()
        self.label = k3d.text2d(
            f"{column}: [{lo:.4g}, {hi:.4g}] ({cmap})",
            position=(0.01, 0.01), color=0x000000, size=0.8,
        )
        self.plot += self.label

    def _clear_label(self) -> None:
        if self.label is not None:
            self.plot -= self.label
            self.label = None

    def display(self):
        return self.plot.display()

    def close(self) -> None:
        self.plot.close()
