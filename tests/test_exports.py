"""Export-surface test: every name in ``mdapy_tpu.__all__`` must resolve.

The reference makes its whole surface importable from the top level
(reference: src/mdapy/__init__.py:34-85).  Round 3 shipped two lazy-map
entries pointing at nonexistent modules/classes, which nothing caught because
no test walked the table — this test closes that hole permanently.
"""

import importlib
import warnings

import pytest

import mdapy_tpu


def test_every_export_resolves():
    failed = {}
    for name in mdapy_tpu.__all__:
        try:
            with warnings.catch_warnings():
                warnings.simplefilter("ignore")
                obj = getattr(mdapy_tpu, name)
        except Exception as exc:  # noqa: BLE001 — collect all failures at once
            failed[name] = repr(exc)
            continue
        assert obj is not None, name
    assert not failed, f"dead top-level exports: {failed}"


def test_dir_covers_all():
    listing = dir(mdapy_tpu)
    for name in mdapy_tpu.__all__:
        assert name in listing


def test_planar_faults_spellings_are_same_class():
    # Reference class name (src/mdapy/identify_fcc_planar_faults.py:9) plus
    # the historical all-caps alias must both resolve to one class.
    assert mdapy_tpu.IdentifyFCCPlanarFaults is mdapy_tpu.IdentifyFccPlanarFaults


def test_lazy_table_targets_exist():
    # Stronger than getattr: verify each (module, attr) pair directly so a
    # future rename fails with a precise message.
    for name, (mod, attr) in mdapy_tpu._LAZY.items():
        module = importlib.import_module(mod, "mdapy_tpu")
        assert hasattr(module, attr), f"{name} -> {mod}:{attr} missing"
