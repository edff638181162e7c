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


@pytest.mark.parametrize("bands", [0, 4])
def test_sharded_grad_matches_single(bands):
    """Autodiff through the shard_map step (VERDICT r3 item 1a): the
    gradient of a spectrum functional wrt (T, q) must match the
    single-device forward's gradient."""
    mesh = Mesh(np.array(jax.devices()[:4]).reshape(1, 4), ("batch", "wn"))
    model = TransitModel(make_config("eclipse", 1e30), mode="fast",
                         bands=bands)
    step = make_sharded_forward(model, mesh)
    temps = jnp.asarray(model.atm.temp, dtype=model.dtype)
    q = jnp.asarray(model.atm.q, dtype=model.dtype)
    w = jnp.linspace(0.5, 2.0, model.wns.n)

    def loss(f):
        return lambda t, qq: jnp.vdot(w, f(t, qq))

    gt_s, gq_s = jax.grad(loss(step), argnums=(0, 1))(temps, q)
    gt_1, gq_1 = jax.grad(loss(jax.jit(model.forward)),
                          argnums=(0, 1))(temps, q)
    np.testing.assert_allclose(np.asarray(gt_s), np.asarray(gt_1),
                               rtol=1e-7, atol=abs(np.asarray(gt_1)).max()
                               * 1e-9)
    np.testing.assert_allclose(np.asarray(gq_s), np.asarray(gq_1),
                               rtol=1e-7, atol=abs(np.asarray(gq_1)).max()
                               * 1e-9)


def test_balanced_blocks_clustered_lines():
    """Synthetic clustered line distribution (VERDICT r3 item 2): the
    LPT assignment must land per-device actual line-eval counts within
    15% of each other where contiguous spans would be ~4x apart."""
    from transit_tpu.parallel.sharded import (_balance_blocks,
                                              _block_costs)
    import dataclasses

    @dataclasses.dataclass
    class FakePlan:
        tw: int
        ntiles: int
        tile_count: np.ndarray

    rng = np.random.default_rng(7)
    ntiles = 256
    # 80% of the lines in the first quarter of the spectrum:
    count = np.where(np.arange(ntiles) < 64,
                     rng.integers(200, 400, ntiles),
                     rng.integers(10, 60, ntiles)).astype(np.int64)
    sp = FakePlan(tw=8, ntiles=ntiles, tile_count=count)
    ndev = 8
    costs = _block_costs([(sp, 100.0)], ntiles, 8)
    blocks, loads = _balance_blocks(costs, ndev)
    assert blocks.shape == (ndev, ntiles // ndev)
    assert sorted(blocks.reshape(-1).tolist()) == list(range(ntiles))
    assert loads.max() <= 1.15 * loads.min(), loads
    contiguous = costs.reshape(ndev, -1).sum(axis=1)
    assert contiguous.max() > 3.0 * contiguous.min()


def test_sharded_step_reports_eval_stats():
    """make_sharded_forward exposes per-device actual eval counts and
    the block assignment (consumed by dryrun_multichip's report)."""
    mesh = Mesh(np.array(jax.devices()[:4]).reshape(1, 4), ("batch", "wn"))
    model = TransitModel(make_config("eclipse", 1e30), mode="fast",
                         bands=4)
    step = make_sharded_forward(model, mesh)
    st = step.eval_stats
    assert st is not None
    assert st["actual_evals"].shape == (4,)
    assert st["actual_evals"].sum() > 0
    # The assignment is a permutation of all blocks:
    assert sorted(st["blocks"].reshape(-1).tolist()) == \
        list(range(st["block_costs"].shape[0]))


def test_sharded_decimated_shells_match_single():
    """The sharded step must reproduce the single-device banded result
    on a fine grid where the far shells DECIMATE (strides >= 4,
    bins-on-lanes layouts, per-line halo weights, asymptotic kernel) —
    the production wide-workload configuration."""
    import jax.numpy as jnp
    from tests.test_fast_and_forward import _fine_grid_config
    from transit_tpu.model import TransitModel
    from transit_tpu.parallel.sharded import make_sharded_forward

    mesh = Mesh(np.array(jax.devices()[:4]).reshape(1, 4),
                ("batch", "wn"))
    model = TransitModel(_fine_grid_config(), mode="fast", bands=6)
    strides = [s for far in (model.bplan.far_plans or []) if far
               for (_l, _r, s) in far]
    assert strides and max(strides) >= 4
    step = make_sharded_forward(model, mesh)
    t = jnp.asarray(model.atm.temp, model.dtype)
    q = jnp.asarray(model.atm.q, model.dtype)
    ref = np.asarray(jax.jit(model.forward)(t, q))
    got = np.asarray(step(t, q))
    np.testing.assert_allclose(got, ref, rtol=2e-6, atol=0)
