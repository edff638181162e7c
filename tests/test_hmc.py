"""HMC posterior sampler (transit_tpu/retrieval.py).

The capability the reference's BART loop cannot touch: gradient-based
posterior sampling through the differentiable forward
(/root/reference/transit/src/transit.c:118-122 drives gradient-free
MCMC at one spectrum per sample per process)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from transit_tpu.retrieval import (hmc_sample, ess, gaussian_logprob,
                                   knot_profile)


def test_hmc_recovers_correlated_gaussian():
    """Analytic pin: sampling a correlated 3-D Gaussian must recover
    its mean and covariance, with healthy acceptance and ESS."""
    cov = np.array([[1.0, 0.6, 0.2],
                    [0.6, 2.0, -0.3],
                    [0.2, -0.3, 0.5]])
    mu = np.array([1.0, -2.0, 0.5])
    prec = jnp.asarray(np.linalg.inv(cov))
    mu_j = jnp.asarray(mu)

    def logprob(x):
        d = x - mu_j
        return -0.5 * d @ prec @ d

    key = jax.random.PRNGKey(0)
    x0 = jnp.zeros((16, 3)) + mu_j + 0.1
    samples, accept, _ = hmc_sample(logprob, x0, key, step_size=0.4,
                                    n_leapfrog=8, n_samples=600)
    acc = float(np.asarray(accept, dtype=np.float64).mean())
    assert 0.6 < acc <= 1.0, acc
    s = np.asarray(samples[100:]).reshape(-1, 3)     # drop warmup
    np.testing.assert_allclose(s.mean(axis=0), mu, atol=0.15)
    np.testing.assert_allclose(np.cov(s.T), cov, atol=0.4)
    e = ess(np.asarray(samples[100:]))
    assert np.all(e > 200), e                        # of 8000 draws


def test_ess_iid_vs_sticky():
    """ESS sanity: iid draws score ~n, a nearly-constant (sticky) chain
    scores far less."""
    rng = np.random.default_rng(3)
    iid = rng.normal(size=(500, 4, 1))
    e_iid = ess(iid)[0]
    ar = np.empty((500, 4, 1))
    ar[0] = rng.normal(size=(4, 1))
    for i in range(1, 500):
        ar[i] = 0.98 * ar[i - 1] + 0.02 * rng.normal(size=(4, 1))
    e_ar = ess(ar)[0]
    assert e_iid > 1000.0
    assert e_ar < 0.2 * e_iid


def test_knot_profile():
    p = np.asarray(knot_profile(jnp.asarray([1.0, 3.0, 2.0]), 5))
    np.testing.assert_allclose(p, [1.0, 2.0, 3.0, 2.5, 2.0])


def test_hmc_model_posterior_recovery():
    """End-to-end: sample a 4-knot temperature parametrization of the
    fixture atmosphere through the differentiable fast forward; the
    posterior must concentrate on the injected truth (each knot's
    credible interval covers it) with healthy acceptance."""
    from tests.test_conformance import make_config
    from transit_tpu.model import TransitModel

    cfg = make_config("eclipse", 1e30)
    cfg.wnhigh = 2030.0                 # keep the CPU test small
    m = TransitModel(cfg, mode="fast", bands=0)
    nl = m.atm.nlayers
    t_true = jnp.asarray(m.atm.temp, m.dtype)
    q = jnp.asarray(m.atm.q, m.dtype)
    nk = 4

    def fwd(z):
        # z = log of the knot temperatures:
        return m.forward(knot_profile(jnp.exp(z), nl), q)

    # Truth = the knot model evaluated at the layer-mean temperature
    # (so the posterior mode is exactly representable):
    z_true = jnp.log(jnp.full((nk,), float(np.mean(np.asarray(t_true)))))
    obs = fwd(z_true)
    sigma = 1e-3 * float(np.abs(np.asarray(obs)).mean())
    logprob = gaussian_logprob(fwd, obs, sigma, prior_mean=z_true * 0 +
                               float(z_true[0]), prior_sigma=0.5)

    key = jax.random.PRNGKey(1)
    x0 = z_true[None, :] + 0.02 * jax.random.normal(key, (6, nk))
    samples, accept, _ = hmc_sample(logprob, x0, key, step_size=2e-4,
                                    n_leapfrog=4, n_samples=50)
    acc = float(np.asarray(accept, dtype=np.float64).mean())
    assert acc > 0.4, acc
    s = np.asarray(samples[10:]).reshape(-1, nk)
    zt = np.asarray(z_true)
    mean, std = s.mean(axis=0), s.std(axis=0) + 1e-12
    # Posterior concentrates on the truth (tight likelihood):
    assert np.all(np.abs(mean - zt) < 0.02), (mean, zt)
    # and covers it:
    assert np.all(np.abs(mean - zt) < 4.0 * std + 5e-4)
