import os

import numpy as np
import pytest

from tests.test_conformance import make_config, GOLD
from transit_tpu.model import TransitModel
from transit_tpu.utils.savefiles import load_extinction, save_extinction


def test_raddelt_resampling_matches_reference():
    g = np.load(os.path.join(GOLD, "ref_eclipse_raddelt.npz"))
    cfg = make_config("eclipse", 1e30, raygrid="0 40 80")
    cfg.raddelt = 25.0
    model = TransitModel(cfg)
    assert model.rads_v.shape[0] == g["rad_ext"].shape[0]
    np.testing.assert_allclose(model.rads_v, g["rad_ext"], rtol=1e-9)
    res = model.compute()
    np.testing.assert_allclose(np.asarray(res.extinction), g["ext"],
                               rtol=5e-5, atol=g["ext"].max() * 1e-10)
    np.testing.assert_allclose(np.asarray(res.spectrum), g["spec"],
                               rtol=1e-5)


def test_read_reference_saveext():
    """The reference's @E@S@ extinction checkpoint parses correctly."""
    g = np.load(os.path.join(GOLD, "ref_eclipse_raddelt.npz"))
    nrad, nwn = g["ext"].shape
    got = load_extinction(os.path.join(GOLD, "ref_ext.save"), nrad, nwn)
    assert got is not None
    ext, computed = got
    assert computed.all()
    # golden ext was parsed from 10-significant-digit ASCII output:
    np.testing.assert_allclose(ext, g["ext"], rtol=1e-9)


def test_saveext_roundtrip_and_reuse(tmp_path):
    cfg = make_config("eclipse", 1e30)
    cfg.saveext = str(tmp_path / "ext.save")
    m = TransitModel(cfg)
    res1 = m.compute()
    assert os.path.exists(cfg.saveext)
    # Second run restores from the checkpoint (no line computation):
    m2 = TransitModel(cfg)
    res2 = m2.compute()
    np.testing.assert_allclose(np.asarray(res2.extinction),
                               np.asarray(res1.extinction), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(res2.spectrum),
                               np.asarray(res1.spectrum), rtol=1e-12)


def test_saveext_invalid_file_ignored(tmp_path):
    p = tmp_path / "bad.save"
    p.write_bytes(b"NOTMAGIC" + b"\0" * 100)
    assert load_extinction(str(p), 4, 4) is None


def test_timers_and_logging(capsys):
    from transit_tpu.utils.log import Timers, set_verbosity, logger
    set_verbosity(5)
    t = Timers()
    with t.stage("demo"):
        _ = sum(range(1000))
    rep = t.report()
    assert "demo" in rep and "TOTAL" in rep
