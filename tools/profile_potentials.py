"""Profile EAM/NEP force calls on the real TPU at various N."""
import os, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np

import mdapy_tpu as mp
from mdapy_tpu.potentials.eam import EAM, EAMGenerator
from mdapy_tpu.potentials.nep import NEP
from mdapy_tpu.neighbor.neighbor import neighbor_search

import jax
print("devices:", jax.devices())

def build_cu(nrep):
    s = mp.build_crystal("Cu", "fcc", 3.615, nx=nrep, ny=nrep, nz=nrep)
    return s

def timeit(fn, n=3):
    fn()  # warm (compile)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter(); fn(); ts.append(time.perf_counter() - t0)
    return min(ts)

for nrep, label in [(20, "32k"), (40, "256k")]:
    s = build_cu(nrep)
    print(f"--- N={s.N} ({label}) ---")
    # neighbor timing
    t0 = time.perf_counter()
    verlet, dist, nn = neighbor_search(s.pos, s.box, 5.8)
    t1 = time.perf_counter()
    print(f"neighbor rc=5.8 first: {t1-t0:.3f}s M={verlet.shape[1]}")
    tN = timeit(lambda: neighbor_search(s.pos, s.box, 5.8))
    print(f"neighbor steady: {tN:.3f}s")

    gen = EAMGenerator(["Cu"], output_filename="/tmp/Cu.eam.alloy")
    eam = EAM("/tmp/Cu.eam.alloy")
    def eam_call():
        eam.calculate(s)
    t0 = time.perf_counter(); eam_call(); t1 = time.perf_counter()
    print(f"EAM first(compile): {t1-t0:.3f}s")
    tE = timeit(eam_call)
    print(f"EAM steady: {tE:.3f}s")

    nep = NEP(os.path.join("/root/reference/tests/input_files", "UNEP-v1.txt"))
    def nep_call():
        nep.calculate(s)
    t0 = time.perf_counter(); nep_call(); t1 = time.perf_counter()
    print(f"NEP first(compile): {t1-t0:.3f}s")
    tP = timeit(nep_call, n=2)
    print(f"NEP steady: {tP:.3f}s")
