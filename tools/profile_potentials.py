"""Profile EAM/NEP force calls on the real TPU at various N."""
import os, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np

import mdapy_tpu as mp
from mdapy_tpu.potentials.eam import EAM, EAMGenerator
from mdapy_tpu.potentials.nep import NEP

import jax
print("devices:", jax.devices(), flush=True)

def timeit(fn, n=3):
    fn()
    ts = []
    for _ in range(n):
        t0 = time.perf_counter(); fn(); ts.append(time.perf_counter() - t0)
    return min(ts)

gen = EAMGenerator(["Cu"], output_filename="/tmp/Cu.eam.alloy")
nep_path = "/root/reference/tests/input_files/UNEP-v1.txt"

for nrep, label in [(20, "32k"), (40, "256k")]:
    s = mp.build_crystal("Cu", "fcc", 3.615, nx=nrep, ny=nrep, nz=nrep)
    print(f"--- N={s.N} ({label}) ---", flush=True)
    eam = EAM("/tmp/Cu.eam.alloy")
    t0 = time.perf_counter(); eam.calculate(s); t1 = time.perf_counter()
    print(f"EAM first(compile): {t1-t0:.3f}s", flush=True)
    print(f"EAM steady: {timeit(lambda: eam.calculate(s)):.3f}s", flush=True)

    nep = NEP(nep_path)
    t0 = time.perf_counter(); nep.calculate(s); t1 = time.perf_counter()
    print(f"NEP first(compile): {t1-t0:.3f}s", flush=True)
    print(f"NEP steady: {timeit(lambda: nep.calculate(s), n=2):.3f}s", flush=True)
