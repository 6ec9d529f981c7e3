"""Render a polycrystal with grain coloring, bonds off, AO on.

Run: python examples/02_render_polycrystal.py  (writes /tmp/poly.png)
On a TPU host the megakernel path renders ~1M atoms at 1080p in tens of
milliseconds per frame (AO adds one occlusion pass per sky direction).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

import mdapy_tpu as mp

# 10-grain polycrystal, ~100k atoms
unitcell = mp.build_crystal("Cu", "fcc", 3.615)
poly = mp.CreatePolycrystal(unitcell, box=[120.0, 120.0, 120.0],
                            seed_number=10, randomseed=1)
system = poly.compute(verbose=False)
print("atoms:", system.N)

# color by grain id
grain = np.asarray(system.data["grain_id"], dtype=np.int64) - 1
palette = np.array(
    [[0.88, 0.34, 0.29], [0.35, 0.62, 0.84], [0.47, 0.76, 0.42],
     [0.93, 0.69, 0.25], [0.64, 0.46, 0.78], [0.36, 0.74, 0.72],
     [0.85, 0.55, 0.72], [0.75, 0.72, 0.39], [0.53, 0.57, 0.92],
     [0.80, 0.45, 0.35]], dtype=np.float32,
)
colors = np.c_[palette[grain % len(palette)], np.ones(system.N, np.float32)]

ren = mp.TachyonRender(backend="tpu", ao=True, ao_samples=12)
ren.render_system(
    system,
    colors=colors.astype(np.float32),
    width=960,
    height=540,
    output_figure="/tmp/poly.png",
)
print("wrote /tmp/poly.png; phase timings:", {
    k: round(v, 3) for k, v in ren.last_timings.items()
})
