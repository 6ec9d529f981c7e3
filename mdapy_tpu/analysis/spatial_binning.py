"""N-dimensional spatial binning of per-atom properties.

Parity: reference spatial_binning.py:10-236 — bin atoms along x/y/z (or any
combination) with a fixed bin width (orthogonal boxes only) and aggregate
named columns with mean/sum/min/max/sum-per-volume/count.
"""

from __future__ import annotations

from typing import List, Union

import numpy as np

__all__ = ["SpatialBinning"]

_AXES = {"x": 0, "y": 1, "z": 2}


class SpatialBinning:
    def __init__(self, data, box, direction: str = "x", bin_width: float = 5.0):
        # data: AtomFrame or dict of columns (must include x,y,z)
        self.data = data
        self.box = box
        if box.triclinic:
            raise ValueError("SpatialBinning supports orthogonal boxes only")
        direction = direction.lower()
        if not set(direction) <= set("xyz") or len(direction) == 0:
            raise ValueError("direction must combine 'x','y','z'")
        self.direction = direction
        self.axes = [_AXES[c] for c in direction]
        self.bin_width = float(bin_width)
        self.result = {}
        self.coor = None

    def compute(self, names: Union[str, List[str]], operations: Union[str, List[str]] = "mean"):
        if isinstance(names, str):
            names = [names]
        if isinstance(operations, str):
            operations = [operations] * len(names)
        pos = np.column_stack([self.data["x"], self.data["y"], self.data["z"]])
        lengths = np.diag(self.box.matrix)
        origin = self.box.origin
        nbins = [max(1, int(np.ceil(lengths[a] / self.bin_width))) for a in self.axes]
        idx = []
        for a, nb in zip(self.axes, nbins):
            k = np.clip(((pos[:, a] - origin[a]) / self.bin_width).astype(int), 0, nb - 1)
            idx.append(k)
        flat = np.zeros(len(pos), dtype=np.int64)
        for k, nb in zip(idx, nbins):
            flat = flat * nb + k
        total = int(np.prod(nbins))
        binvol = self.bin_width ** len(self.axes) * np.prod(
            [lengths[a] for a in range(3) if a not in self.axes]
        )
        self.coor = [
            origin[a] + (np.arange(nb) + 0.5) * self.bin_width
            for a, nb in zip(self.axes, nbins)
        ]
        counts = np.bincount(flat, minlength=total).astype(np.float64)
        for name, op in zip(names, operations):
            v = np.asarray(self.data[name], dtype=np.float64)
            if op == "count":
                out = counts
            elif op in ("sum", "mean", "sum/binvol"):
                s = np.bincount(flat, weights=v, minlength=total)
                if op == "sum":
                    out = s
                elif op == "mean":
                    with np.errstate(invalid="ignore"):
                        out = s / counts
                    out[counts == 0] = 0.0
                else:
                    out = s / binvol
            elif op in ("min", "max"):
                fill = np.inf if op == "min" else -np.inf
                out = np.full(total, fill)
                ufunc = np.minimum if op == "min" else np.maximum
                ufunc.at(out, flat, v)
                out[~np.isfinite(out)] = 0.0
            else:
                raise ValueError(f"Unknown operation {op!r}")
            self.result[f"{name}_{op}"] = out.reshape(nbins)
        return self
