"""Native (C++) runtime components, compiled on demand and cached.

The TPU compute path lives in jax/pallas; these are the sequential/branchy
runtime pieces (combinatorial optimizers, schedulers) where a compiled
scalar loop is the right tool. Loaded through ctypes — no pybind11.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile

_HERE = os.path.dirname(os.path.abspath(__file__))
_BUILD = os.path.join(tempfile.gettempdir(), "mdapy_tpu_native")

_cache = {}


def load_library(name: str, extra_flags=()) -> ctypes.CDLL:
    """Compile ``<name>.cpp`` (if stale) into a cached .so and dlopen it."""
    if name in _cache:
        return _cache[name]
    src = os.path.join(_HERE, name + ".cpp")
    os.makedirs(_BUILD, exist_ok=True)
    out = os.path.join(_BUILD, name + ".so")
    if not os.path.exists(out) or os.path.getmtime(out) < os.path.getmtime(src):
        cmd = [
            "g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-fopenmp",
            "-march=native", src, "-o", out + ".tmp",
        ] + list(extra_flags)
        try:
            subprocess.run(cmd, check=True, capture_output=True, text=True)
        except subprocess.CalledProcessError as err:  # pragma: no cover
            raise RuntimeError(
                f"native build of {name} failed:\n{err.stderr}"
            ) from err
        os.replace(out + ".tmp", out)
    lib = ctypes.CDLL(out)
    _cache[name] = lib
    return lib
