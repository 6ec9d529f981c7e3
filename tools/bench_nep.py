"""NEP 256k force-call phase breakdown (round-5: localize the r4 regression).

Phases: neighbor build / reverse permutation (+ its blocking scalar fetch) /
force kernel.  Timing per CLAUDE.md: dispatch reps, one scalar fetch.
Run SOLO on the TPU.
"""

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
    from mdapy_tpu.neighbor.neighbor import neighbor_search_device
    from mdapy_tpu.potentials.nep import NEP
    from mdapy_tpu.potentials.pairops import reverse_permutation_device

    s = mp.build_crystal("Cu", "fcc", 3.615, nx=40, ny=40, nz=40)
    nep = NEP("/root/reference/tests/input_files/UNEP-v1.txt")

    def timed(fn, reps=4):
        fn()  # warm
        t0 = time.time()
        accs = [fn() for _ in range(reps)]
        acc = None
        for a in accs:
            m = jnp.sum(a[0].astype(jnp.float32) if isinstance(a, tuple)
                        else a.astype(jnp.float32))
            acc = m if acc is None else acc + m
        float(acc)
        return (time.time() - t0) / reps

    rc = max(nep.rc_radial, nep.rc_angular)
    print("rc:", rc, flush=True)

    def nbr():
        pos_d, verlet_d, cnt_d, _ = neighbor_search_device(s.pos, s.box, rc)
        return verlet_d

    # warm twice for capacity caches
    float(jnp.sum(nbr()))
    float(jnp.sum(nbr()))
    t_n = timed(nbr)
    print("neighbor_s:", round(t_n, 3), flush=True)

    pos_d, verlet_d, cnt_d, _ = neighbor_search_device(s.pos, s.box, rc)
    float(jnp.sum(verlet_d))

    def rev():
        rev_d, bad = reverse_permutation_device(verlet_d)
        if int(bad):
            raise RuntimeError
        return rev_d

    t_r = timed(rev)
    print("revperm_s (incl blocking bad-fetch):", round(t_r, 3), flush=True)

    def full():
        nep.results = {}
        nep.calculate(s)
        return nep.results["forces"]

    full()
    t_f = timed(full)
    print("nep_force_256k_s:", round(t_f, 3), flush=True)
    print("kernel-only estimate:", round(t_f - t_n - t_r, 3), flush=True)


if __name__ == "__main__":
    main()
