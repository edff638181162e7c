import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tests.test_conformance import make_config
from transit_tpu.model import TransitModel
from transit_tpu.opacities import fast
from transit_tpu.opacities.pallas_lbl import pallas_extinction


@pytest.fixture(scope="module")
def setup():
    cfg = make_config("eclipse", 1e30)
    m = TransitModel(cfg, dtype=jnp.float32, mode="fast")
    temps = jnp.asarray(m.atm.temp * m.atm.tfct, jnp.float32)
    dens = jnp.asarray(m.atm.d, jnp.float32)
    Z = jnp.asarray(m.Z_layers, jnp.float32)
    mm = jnp.asarray(m.mol.mass, jnp.float32)
    mr = jnp.asarray(m.mol.radius, jnp.float32)
    kw = dict(wn_i=m.wns.i, dwn=m.wns.d, ethresh=cfg.ethreshold,
              nwidth=cfg.nwidth)
    return m, temps, dens, Z, mm, mr, kw


def test_pallas_matches_fast_interpret(setup):
    """The Pallas kernel computes the same math as the jnp fast path
    (interpret mode on CPU; compiled equivalence is exercised on TPU)."""
    m, temps, dens, Z, mm, mr, kw = setup
    a = np.asarray(fast.fast_extinction(m.fplan, m.fdev, temps, dens, Z,
                                        mm, mr, **kw))
    b = np.asarray(pallas_extinction(m.fplan, m.fdev, temps, dens, Z,
                                     mm, mr, interpret=True, **kw))
    rel = np.abs(a - b) / (np.abs(a) + 1e-6 * a.max())
    assert rel.max() < 1e-5


def test_pallas_layer_padding(setup):
    """Layer counts not divisible by 8 pad correctly (no contamination)."""
    m, temps, dens, Z, mm, mr, kw = setup
    # 20-layer fixture -> nl_pad 24; check the unpadded result only:
    b = np.asarray(pallas_extinction(m.fplan, m.fdev, temps, dens, Z,
                                     mm, mr, interpret=True, **kw))
    assert b.shape == (temps.shape[0], m.wns.n)
    assert np.all(np.isfinite(b))
    assert np.all(b >= 0)
