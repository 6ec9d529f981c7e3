"""Structural-analysis pipeline: build a crystal, damage it, classify it.

Run: python examples/01_analysis_pipeline.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

import mdapy_tpu as mp

# 32k-atom FCC copper with thermal rattle
rng = np.random.default_rng(0)
system = mp.build_crystal("Cu", "fcc", 3.615, nx=20, ny=20, nz=20)
system.update_data(
    system.data.with_columns(
        x=np.asarray(system.data["x"]) + rng.normal(0, 0.05, system.N),
        y=np.asarray(system.data["y"]) + rng.normal(0, 0.05, system.N),
        z=np.asarray(system.data["z"]) + rng.normal(0, 0.05, system.N),
    )
)

# neighbor list once; analyses reuse it when the cutoff fits
system.build_neighbor(rc=5.0)
print(f"N = {system.N}, mean neighbors = {system.neighbor_number.mean():.1f}")

# structure classification
cna = system.cal_common_neighbor_analysis()          # adaptive CNA
ptm = system.cal_polyhedral_template_matching()
csp = system.cal_centro_symmetry_parameter(12)
print("CNA fcc fraction:", float((np.asarray(cna) == 1).mean()))
print("PTM fcc fraction:", float((np.asarray(ptm) == 1).mean()))
print("CSP mean:", float(np.mean(csp)))

# pair statistics
rdf = system.cal_radial_distribution_function(6.0, 150)
peak = rdf.r[np.argmax(rdf.g_total)]
print(f"g(r) first peak at {peak:.3f} A (ideal 12-coord shell ~2.556 A)")

sk = system.cal_structure_factor(1.0, 10.0, 120, mode="debye")
print(f"S(k) max {float(np.max(sk.Sk)):.1f} at k = {sk.k[np.argmax(sk.Sk)]:.2f} 1/A")

# per-atom energetics/ordering
entropy = system.cal_structure_entropy(rc=5.0, sigma=0.2)
print("entropy mean:", float(np.mean(entropy)))

# persist everything (positions + computed columns) losslessly
system.write_mp("/tmp/rattled_cu.mp")
back = mp.System("/tmp/rattled_cu.mp")
assert "cna" in back.data.columns
print("round-tripped columns:", back.data.columns)
