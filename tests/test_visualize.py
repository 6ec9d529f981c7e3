"""View (k3d notebook viewer) — structural smoke tests behind the k3d gate.

k3d is an optional dependency (absent in CI); these tests verify the
import-level contract (clear ImportError) and the pure-numpy helpers that
don't need a live widget."""

import numpy as np
import pytest

import mdapy_tpu as mp


def test_view_requires_k3d_cleanly():
    try:
        import k3d  # noqa: F401

        has_k3d = True
    except ImportError:
        has_k3d = False
    s = mp.build_crystal("Cu", "fcc", 3.615, nx=2, ny=2, nz=2)
    from mdapy_tpu.render.visualize import View

    if not has_k3d:
        with pytest.raises(ImportError, match="k3d"):
            View(s)
    else:  # pragma: no cover - k3d present
        v = View(s)
        v.colored_by_element()
        v.colored_by("x")
        v.close()


def test_structure_scheme_tables():
    from mdapy_tpu.render.visualize import View

    for col in ("cna", "ptm", "aja", "ids"):
        scheme = View._STRUCTURE_SCHEMES[col]
        assert 0 in scheme and scheme[0][0] == "Other"
        # colors must be valid 24-bit RGB
        for _, (_, rgb) in scheme.items():
            assert 0 <= rgb <= 0xFFFFFF
