"""Test config: force CPU backend with 8 virtual devices (sharding tests) and
enable x64 so golden-fixture comparisons run at reference precision."""

import os

# MDAPY_TPU_TEST_REAL=1 keeps the session's real accelerator platform (and
# f32) for the hardware-gated tests (e.g. the sharded-megakernel
# compile-on-device test); the default tier runs CPU/x64 for golden parity.
_REAL = os.environ.get("MDAPY_TPU_TEST_REAL", "0") == "1"
if not _REAL:
    os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if not _REAL and "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# jax may already be imported (and pointed at a TPU platform) by the
# interpreter's sitecustomize; the config update still wins as long as no
# backend has been initialized yet.
if not _REAL:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import numpy as np
import pytest

REF_FIXTURES = "/root/reference/tests/fixtures"
REF_INPUTS = "/root/reference/tests/input_files"


def fixture_path(*parts):
    return os.path.join(REF_FIXTURES, *parts)


def input_path(*parts):
    return os.path.join(REF_INPUTS, *parts)


def load_fixture(category: str, name: str):
    path = fixture_path(category, name + ".npz")
    if not os.path.exists(path):
        pytest.skip(f"reference fixture not available: {path}")
    return np.load(path, allow_pickle=True)


def structure_fixtures_with(key: str):
    """Yield (name, npz) for every structure_analysis fixture containing key."""
    base = fixture_path("structure_analysis")
    if not os.path.isdir(base):
        pytest.skip("reference fixtures not available")
    out = []
    for fn in sorted(os.listdir(base)):
        d = np.load(os.path.join(base, fn), allow_pickle=True)
        if key in d:
            out.append((fn[:-4], d))
    return out


@pytest.fixture
def ref_inputs():
    if not os.path.isdir(REF_INPUTS):
        pytest.skip("reference input files not available")
    return REF_INPUTS
