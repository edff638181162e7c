import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from tests.test_conformance import make_config
from transit_tpu.model import TransitModel
from transit_tpu.parallel.sharded import make_sharded_forward


@pytest.mark.parametrize("solution", ["eclipse", "transit"])
def test_sharded_matches_single(solution):
    ndev = len(jax.devices())
    assert ndev >= 8, "conftest requests 8 virtual CPU devices"
    mesh = Mesh(np.array(jax.devices()[:4]).reshape(1, 4), ("batch", "wn"))

    model = TransitModel(make_config(solution, 1e30), mode="fast")
    step = make_sharded_forward(model, mesh)
    temps = jnp.asarray(model.atm.temp, dtype=model.dtype)
    q = jnp.asarray(model.atm.q, dtype=model.dtype)

    sharded = np.asarray(step(temps, q))
    single = np.asarray(model.forward(temps, q))
    np.testing.assert_allclose(sharded, single, rtol=1e-11, atol=0)


def test_graft_entry_runs():
    import __graft_entry__ as ge
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert np.all(np.isfinite(np.asarray(out)))
    ge.dryrun_multichip(8)


@pytest.mark.parametrize("solution", ["eclipse", "transit"])
def test_sharded_banded_matches_single(solution):
    """Banded model through the sharded path: per-band power-of-two tile
    widths align on the per-device block, results match single-device."""
    mesh = Mesh(np.array(jax.devices()[:4]).reshape(1, 4), ("batch", "wn"))
    model = TransitModel(make_config(solution, 1e30), mode="fast", bands=6)
    assert model.bplan is not None
    step = make_sharded_forward(model, mesh)
    temps = jnp.asarray(model.atm.temp, dtype=model.dtype)
    q = jnp.asarray(model.atm.q, dtype=model.dtype)
    sharded = np.asarray(step(temps, q))
    single = np.asarray(jax.jit(model.forward)(temps, q))
    np.testing.assert_allclose(sharded, single, rtol=1e-10, atol=0)
