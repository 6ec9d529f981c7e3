"""EAM potential evaluation + FIRE minimization.

Run: python examples/04_potentials_minimize.py
(uses the reference repo's committed EAM file if present)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import os

import numpy as np

import mdapy_tpu as mp

EAM_FILE = "/root/reference/tests/input_files/NiCoCr.lammps.eam"
if not os.path.exists(EAM_FILE):
    raise SystemExit("example needs an eam.alloy file; edit EAM_FILE")

# small rattled Ni block
rng = np.random.default_rng(1)
system = mp.build_crystal("Ni", "fcc", 3.52, nx=4, ny=4, nz=4)
system.update_data(
    system.data.with_columns(
        x=np.asarray(system.data["x"]) + rng.normal(0, 0.08, system.N),
        y=np.asarray(system.data["y"]) + rng.normal(0, 0.08, system.N),
        z=np.asarray(system.data["z"]) + rng.normal(0, 0.08, system.N),
    )
)
system.calc = mp.EAM(EAM_FILE)
print(f"E0 = {system.get_energy():.4f} eV, "
      f"max|F| = {np.abs(system.get_force()).max():.3f} eV/A")

fire = mp.FIRE(system)
fire.run(200, fmax=0.02)
print(f"after FIRE: E = {system.get_energy():.4f} eV, "
      f"max|F| = {np.abs(system.get_force()).max():.4f} eV/A")

# elastic constants of the relaxed lattice
perfect = mp.build_crystal("Ni", "fcc", 3.52, nx=3, ny=3, nz=3)
et = mp.get_elastic_constant(perfect, mp.EAM(EAM_FILE))
print("C11/C12/C44 (GPa):",
      round(et.voigt[0, 0], 1), round(et.voigt[0, 1], 1), round(et.voigt[3, 3], 1))
