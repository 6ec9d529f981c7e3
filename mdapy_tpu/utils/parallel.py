"""Unified host-side parallelism knob (reference: src/mdapy/parallel.py:44-53).

The reference drives OpenMP / Polars / multiprocessing / Tachyon pthreads from
one env var, ``MDAPY_NUM_THREADS``.  In this framework the device compute path
is scheduled by XLA (per-chip parallelism is the compiler's job and multi-chip
parallelism is expressed with `jax.sharding`), so this knob only governs the
host-side pieces that still use CPU threads or processes: parallel gzip
(`utils.pigz`), multi-frame trajectory parsing, and native C++ helpers
(PTM / SQS engines), each of which receives the count explicitly.  We never
mutate ``OMP_NUM_THREADS`` — other OpenMP users (torch, scipy) in the same
process must be unaffected.
"""

from __future__ import annotations

import os
import warnings

__all__ = ["get_num_threads"]


def get_num_threads() -> int:
    """Resolve the thread count for any host-side parallel region.

    Reads ``MDAPY_NUM_THREADS``; must be a positive integer if set. Warns on
    oversubscription. Falls back to ``os.cpu_count()`` when unset.
    """
    env = os.environ.get("MDAPY_NUM_THREADS")
    ncpu = os.cpu_count() or 1
    if env is not None:
        try:
            n = int(env)
        except ValueError:
            raise ValueError(
                f"MDAPY_NUM_THREADS must be a positive integer, got {env!r}"
            ) from None
        if n <= 0:
            raise ValueError(f"MDAPY_NUM_THREADS must be > 0, got {n}")
        if n > ncpu:
            warnings.warn(
                f"MDAPY_NUM_THREADS={n} exceeds cpu_count()={ncpu}; "
                "oversubscription usually hurts performance.",
                stacklevel=2,
            )
        return n
    return ncpu
