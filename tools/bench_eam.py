"""EAM 256k force-call timing (round-5 work driver).  Run SOLO on the TPU."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    import jax.numpy as jnp

    import mdapy_tpu as mp
    from mdapy_tpu.potentials.eam import EAM, EAMGenerator

    s = mp.build_crystal("Cu", "fcc", 3.615, nx=40, ny=40, nz=40)
    EAMGenerator(["Cu"], output_filename="/tmp/Cu.eam.alloy")
    eam = EAM("/tmp/Cu.eam.alloy")

    def t(reps=4):
        eam.results = {}
        eam.calculate(s)
        float(jnp.sum(eam.results["forces"]))
        t0 = time.time()
        acc = None
        for _ in range(reps):
            eam.results = {}
            eam.calculate(s)
            m = jnp.sum(eam.results["forces"])
            acc = m if acc is None else acc + m
        float(acc)
        return (time.time() - t0) / reps

    print("warm batch:", round(t(), 3), flush=True)
    print("eam_force_256k_s:", round(t(), 3), flush=True)
    eam._cache_token = hash(eam._token(s))  # no hidden recalc in host_extra
    t0 = time.time()
    _ = eam.get_forces(s), eam.get_energies(s), eam.get_virials(s)
    print("host_extra_s:", round(time.time() - t0, 3), flush=True)


if __name__ == "__main__":
    main()
