"""Analytic optical-depth checks.

Revives the intent of the reference's disabled integration suite
(transit/test/test_slantpath.c:54-120): slant-path and vertical optical
depths for known extinction profiles against closed forms.
"""

import numpy as np
from scipy.integrate import quad

from transit_tpu.rt import tau as rt_tau


def test_transit_tau_constant_extinction():
    # tau(b) = 2 * e0 * sqrt(R^2 - b^2) for constant extinction:
    n = 400
    rad = np.linspace(70000.0, 80000.0, n)
    W = rt_tau.transit_weights(rad, rad[::-1].copy())
    e0 = 1e-4
    tau = W @ np.full(n, e0)
    for k in (40, 150, 300):
        b = rad[::-1][k]
        expect = 2.0 * e0 * np.sqrt(rad[-1] ** 2 - b ** 2)
        assert abs(tau[k] / expect - 1.0) < 2e-3, k


def test_transit_tau_linear_extinction():
    n = 600
    rad = np.linspace(70000.0, 80000.0, n)
    W = rt_tau.transit_weights(rad, rad[::-1].copy())
    a, c = 5e-4, -4e-9
    ex = a + c * rad
    tau = W @ ex

    def integrand(r, b):
        return (a + c * r) * r / np.sqrt(r * r - b * b)

    for k in (60, 200, 400):
        b = rad[::-1][k]
        val, _ = quad(integrand, b, rad[-1], args=(b,), limit=200,
                      points=[b])
        expect = 2.0 * val
        assert abs(tau[k] / expect - 1.0) < 5e-3, k


def test_eclipse_tau_is_vertical_integral():
    n = 500
    rad = np.linspace(70000.0, 80000.0, n)
    W = rt_tau.eclipse_weights(rad)
    # Exponential extinction with scale height H:
    H = 1500.0
    ex = 1e-3 * np.exp(-(rad - rad[0]) / H)
    tau = W @ ex
    for ri in (80, 250, 480):
        rs = n - 1 - ri
        expect = 1e-3 * H * (np.exp(-(rad[rs] - rad[0]) / H) -
                             np.exp(-(rad[-1] - rad[0]) / H))
        assert abs(tau[ri] / expect - 1.0) < 1e-3, ri


def test_tau_zero_at_top_and_grows():
    rad = np.sort(np.random.default_rng(0).uniform(70000, 80000, 80))
    W = rt_tau.eclipse_weights(rad)
    ex = np.random.default_rng(1).uniform(1e-6, 1e-3, 80)
    tau = W @ ex
    assert tau[0] == 0.0
    assert np.all(tau[1:] > 0)
    # Depth accumulates overall (strict monotonicity is not guaranteed by
    # the reference's parabolic tangent-point scheme on irregular data):
    assert tau[-1] > tau[10] > tau[1]
