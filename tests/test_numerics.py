import numpy as np
import jax.numpy as jnp
import pytest

from transit_tpu.numerics import (
    simpson_weights_np, simpson_weights_jnp, suffix_simpson_matrix_np,
    splinterp_np, splinterp_jnp, nearest_index_np, nearest_index_jnp,
)


def simps_direct(x, y):
    """Literal transcription of the reference simps() control flow
    (numerical.c:454-481), used as the ground truth for the weight form."""
    n = len(x)
    if n == 1:
        return 0.0
    h = np.diff(x)
    if n == 2:
        return h[0] * (y[0] + y[1]) / 2.0
    even = n % 2 == 0
    res = 0.0
    for i in range((n - 1) // 2):
        j = 2 * i + (1 if even else 0)
        hsum = h[j] + h[j + 1]
        hratio = h[j + 1] / h[j]
        hfactor = hsum * hsum / (h[j] * h[j + 1])
        res += (y[j] * (2.0 - hratio) + y[j + 1] * hfactor +
                y[j + 2] * (2.0 - 1.0 / hratio)) * hsum
    res /= 6.0
    if even:
        res += h[0] * (y[0] + y[1]) / 2.0
    return res


@pytest.mark.parametrize("n", [1, 2, 3, 4, 5, 8, 9, 100, 101])
def test_simpson_weights_match_reference(n):
    rng = np.random.default_rng(n)
    x = np.sort(rng.uniform(0, 10, n))
    y = rng.normal(size=n)
    w = simpson_weights_np(x)
    assert np.allclose(w @ y, simps_direct(x, y), rtol=1e-14, atol=1e-14)


@pytest.mark.parametrize("n", [2, 3, 4, 5, 9, 100, 101])
def test_simpson_weights_jnp_matches_np(n):
    rng = np.random.default_rng(n + 1000)
    x = np.sort(rng.uniform(0, 10, n))
    w_np = simpson_weights_np(x)
    w_j = np.asarray(simpson_weights_jnp(jnp.asarray(x)))
    assert np.allclose(w_j, w_np, rtol=1e-12, atol=1e-13)


def test_simpson_weights_jnp_padded():
    rng = np.random.default_rng(7)
    x = np.sort(rng.uniform(0, 10, 12))
    for m in [2, 3, 5, 8, 12]:
        w_ref = simpson_weights_np(x[:m])
        xp = x.copy()
        w_j = np.asarray(simpson_weights_jnp(jnp.asarray(xp), n_valid=m))
        assert np.allclose(w_j[:m], w_ref, rtol=1e-13, atol=1e-15), m
        assert np.all(w_j[m:] == 0.0)


def test_simpson_exactness_on_parabola():
    # Simpson is exact for quadratics on any (odd-sample) grid:
    x = np.sort(np.random.default_rng(0).uniform(0, 4, 11))
    y = 3 * x**2 - 2 * x + 1
    exact = (x[-1]**3 - x[0]**3) - (x[-1]**2 - x[0]**2) + (x[-1] - x[0])
    assert np.allclose(simpson_weights_np(x) @ y, exact, rtol=1e-12)


def test_suffix_matrix():
    x = np.sort(np.random.default_rng(3).uniform(0, 5, 17))
    y = np.cos(x)
    W = suffix_simpson_matrix_np(x)
    for s in range(17):
        assert np.allclose(W[s] @ y, simps_direct(x[s:], y[s:]),
                           rtol=1e-13, atol=1e-15)


def test_nearest_index():
    arr = np.array([0.0, 1.0, 3.0, 7.0, 10.0])
    vals = np.array([-5.0, 0.0, 0.4, 0.5, 0.6, 2.0, 2.1, 3.0, 9.0, 10.0, 12])
    expect = np.array([0, 0, 0, 0, 1, 1, 2, 2, 4, 4, 4])
    assert np.array_equal(nearest_index_np(arr, vals), expect)
    assert np.array_equal(np.asarray(nearest_index_jnp(arr, vals)), expect)


def test_spline_reproduces_nodes_and_smooth():
    rng = np.random.default_rng(11)
    x = np.sort(rng.uniform(0, 10, 20))
    y = np.sin(x)
    out = splinterp_np(x, y, x)
    assert np.allclose(out, y, rtol=1e-12)
    xf = np.linspace(x[0], x[-1], 500)
    out = splinterp_np(x, y, xf)
    assert np.max(np.abs(out - np.sin(xf))) < 2e-2
    out_j = np.asarray(splinterp_jnp(jnp.asarray(x), jnp.asarray(y),
                                     jnp.asarray(xf)))
    assert np.allclose(out_j, out, rtol=1e-12, atol=1e-14)


def test_spline_matches_scipy_natural():
    from scipy.interpolate import CubicSpline
    rng = np.random.default_rng(5)
    x = np.sort(rng.uniform(0, 10, 30))
    y = rng.normal(size=30)
    xf = np.linspace(x[0], x[-1], 333)
    ours = splinterp_np(x, y, xf)
    scip = CubicSpline(x, y, bc_type="natural")(xf)
    assert np.allclose(ours, scip, rtol=1e-9, atol=1e-11)
