"""Config validation (acceptgenhints parity) and option-wiring tests.

Reference: transit/src/argum.c:773-911 (acceptgenhints range/consistency
checks), makesample.c:308-400 (wavenumber-range diagnostics),
argum.c:636-718 (--cloud syntax), argum.c:720-726 (standalone --cloudtop).
Every invalid config must produce a specific ConfigError naming the
option, not a downstream numpy/JAX traceback.
"""

import numpy as np
import pytest

from tests.test_conformance import make_config
from transit_tpu.config import ConfigError, TransitConfig, validate
from transit_tpu.model import TransitModel


def good():
    return make_config("eclipse", 1e30)


def check_rejects(cfg, match):
    with pytest.raises(ConfigError, match=match):
        validate(cfg)


def test_valid_config_passes():
    assert validate(good()) is not None


def test_missing_wn_range():
    cfg = good()
    cfg.wnlow = cfg.wnhigh = 0.0
    cfg.wllow = cfg.wlhigh = 0.0
    check_rejects(cfg, "initial wavenumber")


def test_negative_wn_factor():
    cfg = good()
    cfg.wnfct = -1.0
    check_rejects(cfg, "wavenumber factor is negative")


def test_bad_wn_spacing():
    cfg = good()
    cfg.wndelt = 0.0
    check_rejects(cfg, "wavenumber spacing")


def test_empty_wn_range():
    cfg = good()
    cfg.wnlow, cfg.wnhigh = 2100.0, 2000.0
    check_rejects(cfg, "range is empty")


def test_unknown_solution():
    cfg = good()
    cfg.solution = "emission"
    check_rejects(cfg, "Currently accepted")


def test_taulevel2_stub_rejected():
    cfg = good()
    cfg.taulevel = 2
    check_rejects(cfg, "slantpath.c:135")


def test_nwidth_below_one():
    cfg = good()
    cfg.nwidth = 0.5
    check_rejects(cfg, "maximum width")


def test_nonpositive_ethresh():
    cfg = good()
    cfg.ethreshold = 0.0
    check_rejects(cfg, "has to be positive")


def test_voigt_table_bounds():
    cfg = good()
    cfg.dmin, cfg.dmax = 0.5, 0.1
    check_rejects(cfg, "dmin/dmax")
    cfg = good()
    cfg.lmin, cfg.lmax = -1.0, 1.0
    check_rejects(cfg, "lmin/lmax")


def test_negative_reference_levels():
    for name, msg in (("refradius", "radius level"),
                      ("refpress", "pressure level"),
                      ("gsurf", "gravity")):
        cfg = good()
        setattr(cfg, name, -1.0)
        check_rejects(cfg, msg)


def test_raygrid_not_increasing():
    cfg = make_config("eclipse", 1e30, raygrid="0 40 20")
    check_rejects(cfg, "strictly increasing")


def test_raygrid_out_of_range():
    cfg = make_config("eclipse", 1e30, raygrid="0 45 90")
    check_rejects(cfg, r"\[0, 90\)")


def test_raygrid_unparseable():
    cfg = make_config("eclipse", 1e30, raygrid="0 twenty 40")
    check_rejects(cfg, "could not parse")


def test_qscale_qmol_mismatch():
    cfg = good()
    cfg.qmol = "CH4,H2O"
    cfg.qscale = "0.5"
    check_rejects(cfg, "same\n?\\s*number of elements")


def test_cloud_too_few_params():
    cfg = good()
    cfg.cloud = "F18,1.0,-2.0,1.0"     # F18 needs gamma,Q,r extras
    check_rejects(cfg, "gamma,Q,r")


def test_cloud_top_below_bottom():
    cfg = good()
    cfg.cloud = "ext,1.0,1.5,-2.0"
    check_rejects(cfg, "cloud top")


def test_cloud_unknown_type():
    cfg = good()
    cfg.cloud = "fog,1.0,-2.0,1.0"
    check_rejects(cfg, "unknown cloud type")


def test_bad_raddelt():
    cfg = good()
    cfg.raddelt = -2.0
    check_rejects(cfg, "raddelt")


def test_bad_opacity_temperature_grid():
    cfg = good()
    cfg.justOpacity = True
    cfg.tlow, cfg.thigh = 3000.0, 500.0
    check_rejects(cfg, "temperature sampling")


def test_model_init_runs_validation():
    cfg = good()
    cfg.toomuch = -1.0
    with pytest.raises(ConfigError, match="toomuch"):
        TransitModel(cfg)


# ---------------------------------------------------------------------------
# Option wiring (VERDICT round-2 items 5 and 7)
# ---------------------------------------------------------------------------

def test_standalone_cloudtop_wires_opaque_deck():
    """argum.c:720-726: --cloudtop alone builds an opaque flag-1 deck
    cloudtop..cloudtop+10 dex with extinction 100."""
    cfg = good()
    cfg.cloudtop = -1.5
    m = TransitModel(cfg)
    cl = m._cloud
    assert cl.flag == 1
    assert cl.cloudext == 100.0
    assert cl.cloudtop == -1.5
    assert cl.cloudbot == 8.5
    # And it actually changes the spectrum vs the cloud-free model:
    clean = TransitModel(good()).compute()
    cloudy = m.compute()
    assert not np.allclose(np.asarray(cloudy.spectrum),
                           np.asarray(clean.spectrum))


def test_explicit_cloud_overrides_cloudtop():
    cfg = good()
    cfg.cloudtop = -1.5
    cfg.cloud = "ext,3e-7,-1.0,1.0"
    m = TransitModel(cfg)
    assert m._cloud.cloudext == 3e-7


def test_forward_supports_raddelt_resampling():
    """reloadatm + makeradsample semantics (readatm.c:722-784): with
    raddelt > 0, forward() takes T/q on the *original* atmosphere layers
    and re-splines in-graph; feeding the file profiles must reproduce
    compute() on the resampled grid."""
    import jax
    cfg = make_config("eclipse", 1e30, raygrid="0 40 80")
    cfg.raddelt = 25.0
    m = TransitModel(cfg)
    ref = np.asarray(m.compute().spectrum)
    atm0 = m._atm0
    nl0 = atm0["radius"].shape[0]
    assert nl0 != m.atm.nlayers or True     # grids may differ in length
    # Original-file T/q: reread the atmosphere without resampling:
    cfg2 = make_config("eclipse", 1e30, raygrid="0 40 80")
    m2 = TransitModel(cfg2)
    t0 = np.asarray(m2.atm.temp)
    q0 = np.asarray(m2.atm.q)
    assert t0.shape[0] == nl0
    got = np.asarray(m.forward(t0, q0))
    np.testing.assert_allclose(got, ref, rtol=1e-8)
    # And it is differentiable end-to-end:
    g = jax.grad(lambda t: m.forward(t, q0).sum())(t0)
    assert np.all(np.isfinite(np.asarray(g)))


def test_forward_rejects_raddelt_plus_hydrostatic():
    cfg = make_config("eclipse", 1e30)
    cfg.raddelt = 25.0
    cfg.gsurf, cfg.refpress, cfg.refradius = 2200.0, 1.0, 7.0e9
    with pytest.raises(ConfigError, match="raddelt"):
        TransitModel(cfg)


def test_share_opacity_warns(caplog):
    """shareOpacity (argum.c:304-306) has no TPU-native meaning (the SysV
    shm segment is replaced by HBM + per-process band loads); accepting
    it silently would mislead users porting reference cfgs."""
    import logging
    cfg = good()
    cfg.shareOpacity = True
    with caplog.at_level(logging.WARNING, logger="transit_tpu"):
        validate(cfg)
    assert any("shareOpacity" in r.message for r in caplog.records)
