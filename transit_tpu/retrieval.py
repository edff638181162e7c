"""Gradient-based posterior sampling for atmospheric retrieval.

The reference's entire purpose is Bayesian retrieval: BART drives
thousands of gradient-free MCMC iterations through run_transit
(/root/reference/transit/src/transit.c:118-122), one spectrum per sample
per process.  This framework's differentiator is that the whole forward
model is differentiable (model.forward), which unlocks gradient-based
samplers: Hamiltonian Monte Carlo moves whole-profile proposals with
O(1) autocorrelation instead of a random walk.

The sampler here is deliberately minimal and jit-native: vectorized
chains (vmap), a lax.scan over samples, static leapfrog length, jointly
accepted Metropolis corrections.  Plug in any differentiable log
posterior over a flat parameter vector — e.g. spline-knot temperature
profiles + log abundances through ``TransitModel.forward`` — or supply
``vg_fn`` to source value-and-gradient elsewhere (the multi-host path's
``MultihostForward.value_and_grad`` drop-in).

ESS is estimated host-side with the standard multi-chain initial
positive sequence estimator (Geyer 1992), the number the reference's
MCMC would report per wall-clock unit.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def hmc_sample(logprob, x0, key, step_size, n_leapfrog: int,
               n_samples: int, vg_fn=None):
    """Vectorized-chain HMC.

    logprob: callable x(ndim,) -> scalar log posterior (jit/grad-able).
    x0: (nchain, ndim) initial states.
    step_size: scalar or (ndim,) leapfrog step (per-dimension mass
        scaling folded in).
    vg_fn: optional batched (nchain, ndim) -> ((nchain,), (nchain, ndim))
        value-and-gradient override (defaults to
        vmap(value_and_grad(logprob))).

    Returns (samples, accept, state): samples (n_samples, nchain, ndim);
    accept (n_samples, nchain) 0/1; state = final (x, logp).
    """
    if vg_fn is None:
        vg_fn = jax.vmap(jax.value_and_grad(logprob))
    x0 = jnp.asarray(x0)
    eps = jnp.asarray(step_size, dtype=x0.dtype)
    nl = int(n_leapfrog)

    def one_step(carry, k):
        x, lp, g = carry
        kp, ka = jax.random.split(k)
        p0 = jax.random.normal(kp, x.shape, x.dtype)

        # Leapfrog: initial half momentum step, nl position/momentum
        # steps with a trailing half step (folded into the scan body):
        p = p0 + 0.5 * eps * g

        def leap(c, i):
            xx, pp, _lp, _g = c
            xx = xx + eps * pp
            lp_i, g_i = vg_fn(xx)
            pp = pp + jnp.where(i == nl - 1, 0.5, 1.0) * eps * g_i
            return (xx, pp, lp_i, g_i), None

        (xn, pn, lpn, gn), _ = jax.lax.scan(
            leap, (x, p, lp, g), jnp.arange(nl))

        dh = (lpn - 0.5 * jnp.sum(pn * pn, axis=1)) - \
             (lp - 0.5 * jnp.sum(p0 * p0, axis=1))
        u = jax.random.uniform(ka, (x.shape[0],), x.dtype)
        # NaN-safe rejection: a divergent leapfrog yields dh = NaN,
        # which compares False (reject).  Selection must be jnp.where,
        # NOT an arithmetic blend — 0 * NaN would poison the kept
        # state of every rejected chain:
        acc = (jnp.log(u) < dh)
        accb = acc[:, None]
        x = jnp.where(accb, xn, x)
        lp = jnp.where(acc, lpn, lp)
        g = jnp.where(accb, gn, g)
        return (x, lp, g), (x, acc)

    lp0, g0 = vg_fn(x0)
    keys = jax.random.split(key, n_samples)
    (xf, lpf, _), (samples, accept) = jax.lax.scan(
        one_step, (x0, lp0, g0), keys)
    return samples, accept, (xf, lpf)


def ess(samples) -> np.ndarray:
    """Per-dimension effective sample size over all chains.

    samples: (n_samples, nchain, ndim).  Multi-chain autocorrelation
    with Geyer's initial positive sequence truncation: rho averaged
    across chains (each demeaned by its own mean, variance pooled),
    summed over consecutive even-odd pairs while the pair sum stays
    positive.
    """
    s = np.asarray(samples, dtype=np.float64)
    n, c, d = s.shape
    out = np.empty(d)
    for j in range(d):
        x = s[:, :, j] - s[:, :, j].mean(axis=0, keepdims=True)
        var = (x * x).mean()
        if var == 0.0:
            out[j] = float(n * c)
            continue
        # FFT autocovariance per chain, averaged:
        nfft = 1
        while nfft < 2 * n:
            nfft *= 2
        f = np.fft.rfft(x, nfft, axis=0)
        acov = np.fft.irfft(f * np.conj(f), nfft, axis=0)[:n].mean(axis=1)
        rho = acov / acov[0]
        # Initial positive sequence over pair sums rho[2t+1] + rho[2t+2]:
        tau = 1.0
        t = 1
        while t + 1 < n:
            pair = rho[t] + rho[t + 1]
            if pair <= 0.0:
                break
            tau += 2.0 * pair
            t += 2
        out[j] = n * c / tau
    return out


def gaussian_logprob(batched_forward, obs, sigma, prior_mean,
                     prior_sigma):
    """Standard retrieval posterior builder: Gaussian likelihood over a
    synthetic/observed spectrum plus an independent Gaussian prior on
    the (transformed) parameters.

    batched_forward: x(ndim,) -> spectrum (the differentiable model
    step, typically closing over TransitModel.forward and a parameter
    unpacking).  Returns a logprob suitable for :func:`hmc_sample`.
    """
    obs = jnp.asarray(obs)
    pm = jnp.asarray(prior_mean)
    ps = jnp.asarray(prior_sigma)

    def logprob(x):
        r = (batched_forward(x) - obs) / sigma
        pr = (x - pm) / ps
        return -0.5 * (jnp.sum(r * r) + jnp.sum(pr * pr))

    return logprob


def knot_profile(knots, nlayer: int):
    """Monotone-x linear interpolation of ``knots`` (K,) onto nlayer
    layers (the usual low-dimensional temperature parametrization:
    retrieval samples K knot values, the atmosphere gets a smooth
    profile).  Differentiable; endpoints pinned to the first/last
    knot."""
    k = jnp.asarray(knots)
    xk = jnp.linspace(0.0, float(nlayer - 1), k.shape[0])
    return jnp.interp(jnp.arange(nlayer, dtype=k.dtype), xk, k)
