"""Spline: cross-validate against scipy.interpolate.CubicSpline for every
boundary condition the reference exposes (reference: src/mdapy/spline.py,
tests/test_spline.py)."""

import numpy as np
import pytest
from scipy.interpolate import CubicSpline as SciSpline

from mdapy_tpu import Spline, get_num_threads


@pytest.mark.parametrize("bc", ["not-a-knot", "natural", "clamped"])
@pytest.mark.parametrize("uniform", [True, False])
def test_spline_matches_scipy(bc, uniform):
    rng = np.random.default_rng(0)
    if uniform:
        x = np.linspace(0, 2 * np.pi, 13)
    else:
        x = np.sort(rng.uniform(0, 2 * np.pi, 13))
        x[0], x[-1] = 0.0, 2 * np.pi
    y = np.sin(x)
    if bc == "clamped":
        sp = Spline(x, y, bc_type=bc, dy0=1.0, dyn=1.0)
        ref = SciSpline(x, y, bc_type=((1, 1.0), (1, 1.0)))
    else:
        sp = Spline(x, y, bc_type=bc)
        ref = SciSpline(x, y, bc_type=bc)
    xq = np.linspace(0, 2 * np.pi, 257)
    assert np.allclose(sp(xq), ref(xq), atol=1e-12)
    assert np.allclose(sp.derivative(xq), ref(xq, 1), atol=1e-10)
    assert np.allclose(sp.second_derivative(xq), ref(xq, 2), atol=1e-9)


def test_spline_clamped_estimated_slopes():
    x = np.linspace(0, 1, 7)
    y = x**2
    sp = Spline(x, y, bc_type="clamped")  # quadratic end-slope estimate is exact here
    assert abs(sp.derivative(0.0) - 0.0) < 1e-12
    assert abs(sp.derivative(1.0) - 2.0) < 1e-12


def test_spline_out_of_range_contract():
    x = np.linspace(0, 1, 5)
    sp = Spline(x, x**3)
    with pytest.raises(IndexError):
        sp.evaluate(1.5)
    with pytest.raises(IndexError):
        sp.derivative(-0.1)
    out = sp(np.array([-0.5, 0.5, 2.0]))
    assert np.isnan(out[0]) and np.isnan(out[2]) and np.isfinite(out[1])


def test_spline_interpolates_knots_exactly():
    rng = np.random.default_rng(3)
    x = np.sort(rng.uniform(-5, 5, 20))
    y = rng.normal(size=20)
    for bc in ["not-a-knot", "natural", "clamped"]:
        sp = Spline(x, y, bc_type=bc)
        assert np.allclose(sp(x), y, atol=1e-12)


def test_spline_small_n():
    # n=2 -> linear; n=3 not-a-knot -> the single quadratic through the points
    sp = Spline([0.0, 1.0], [1.0, 3.0])
    assert abs(sp(0.5) - 2.0) < 1e-14
    x = np.array([0.0, 1.0, 2.0])
    y = x**2
    sp3 = Spline(x, y)
    assert abs(sp3(0.5) - 0.25) < 1e-12


def test_spline_validation_errors():
    with pytest.raises(ValueError):
        Spline([0.0], [1.0])
    with pytest.raises(ValueError):
        Spline([0, 1, 1], [0, 1, 2])  # not strictly increasing
    with pytest.raises(ValueError):
        Spline([0, 1], [0, 1], bc_type="bogus")
    with pytest.raises(ValueError):
        Spline([0, 1], [0, 1], bc_type="clamped", dy0=1.0)  # dyn missing
    with pytest.raises(TypeError):
        Spline([0, 1, 2], [0, 1, 4]).evaluate("hello")


def test_spline_jax_eval_matches_numpy():
    import jax.numpy as jnp

    x = np.linspace(0, 3, 9)
    y = np.cos(x)
    sp = Spline(x, y)
    xq = np.linspace(0, 3, 41)
    assert np.allclose(np.asarray(sp.evaluate_jax(jnp.asarray(xq))), sp(xq), atol=1e-12)


def test_get_num_threads():
    n = get_num_threads()
    assert isinstance(n, int) and n >= 1
