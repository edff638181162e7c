"""End-to-end differentiable retrieval (VERDICT r3 item 1c).

The reference's production loop is BART driving run_transit once per
MCMC sample (transit/src/transit.c:118-122) — gradient-free, one
spectrum per process.  The TPU-native replacement is a differentiable
forward: an optimizer (or HMC sampler) recovers atmospheric parameters
from a spectrum via autodiff.  These tests inject a known T profile /
abundance scaling, perturb it, and require optax Adam on the jitted
forward to recover it.
"""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from tests.test_conformance import make_config
from transit_tpu.model import TransitModel


@pytest.fixture(scope="module")
def model():
    return TransitModel(make_config("eclipse", 1e30), mode="fast",
                        bands=4)


def _fit(loss, x0, steps=300, lr=2e-2):
    opt = optax.adam(lr)

    @jax.jit
    def update(x, state):
        val, g = jax.value_and_grad(loss)(x)
        up, state = opt.update(g, state)
        return optax.apply_updates(x, up), state, val

    state = opt.init(x0)
    x = x0
    l0 = None
    for _ in range(steps):
        x, state, val = update(x, state)
        if l0 is None:
            l0 = float(val)
    return x, l0, float(val)


def test_adam_recovers_temperature_profile(model):
    """Inject T*, start from a profile 8% off, recover via gradient
    descent on the emission spectrum: loss must collapse by >=1e4 and
    the photospherically constrained layers must come back within 1%."""
    t_true = jnp.asarray(model.atm.temp, model.dtype)
    q = jnp.asarray(model.atm.q, model.dtype)
    fwd = model.make_forward()
    target = fwd(t_true, q)
    norm = jnp.mean(target ** 2)

    def loss(logt):
        spec = fwd(jnp.exp(logt), q)
        return jnp.mean((spec - target) ** 2) / norm

    x0 = jnp.log(t_true * 1.08)
    x, l_init, l_final = _fit(loss, x0)
    assert l_final < 1e-4 * l_init, (l_init, l_final)
    rel = np.abs(np.asarray(jnp.exp(x)) / np.asarray(t_true) - 1.0)
    # Deep/low-sensitivity layers converge slowest; require the bulk of
    # the profile recovered to 1% and the median much tighter:
    assert np.mean(rel < 0.01) >= 0.8, rel
    assert np.median(rel) < 3e-3, np.median(rel)


def test_adam_recovers_abundance_scale(model):
    """Retrieval of a log-abundance scaling (the qscale analogue,
    argum.c:883-891) of the line-bearing molecule, starting a factor 3
    off.  (A JOINT T-offset + abundance fit on a single eclipse band is
    physically degenerate — hotter+more-absorber mimics the target — so
    the joint problem converges along a valley far too slowly for a
    test; the degeneracy is a property of the inference problem, not of
    the gradients, which test_sharded_grad_matches_single and
    test_batched_retrieval_grad pin independently.)"""
    t_true = jnp.asarray(model.atm.temp, model.dtype)
    q_true = jnp.asarray(model.atm.q, model.dtype)
    fwd = model.make_forward()
    target = fwd(t_true, q_true)
    norm = jnp.mean(target ** 2)
    imol = model.atm.species.index(model.tli.databases[0].molecule)

    def loss(logs):
        q = q_true.at[imol].mul(jnp.exp(logs))
        spec = fwd(t_true, q)
        return jnp.mean((spec - target) ** 2) / norm

    x0 = jnp.asarray(np.log(3.0), model.dtype)
    x, l_init, l_final = _fit(loss, x0, steps=300, lr=5e-2)
    assert l_final < 1e-6 * l_init, (l_init, l_final)
    assert abs(np.exp(float(x)) - 1.0) < 1e-2, np.exp(float(x))


def test_batched_retrieval_grad(model):
    """vmap x grad compose over the forward (the BART batched-sampler
    shape: one device program evaluates a whole batch of profiles and
    their gradients)."""
    t0 = jnp.asarray(model.atm.temp, model.dtype)
    q = jnp.asarray(model.atm.q, model.dtype)
    fwd = model.make_forward()
    target = fwd(t0, q)

    def loss(t):
        return jnp.mean((fwd(t, q) - target) ** 2)

    batch = jnp.stack([t0 * (1.0 + 0.02 * i) for i in range(4)])
    vals, grads = jax.vmap(jax.value_and_grad(loss))(batch)
    assert vals.shape == (4,) and grads.shape == batch.shape
    assert float(vals[0]) < 1e-12          # exact profile: zero loss
    assert np.all(np.isfinite(np.asarray(grads)))
    assert float(jnp.abs(grads[1]).max()) > 0.0
