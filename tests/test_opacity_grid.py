import os

import numpy as np
import pytest

from tests.test_conformance import make_config, GOLD
from transit_tpu.model import TransitModel
from transit_tpu.opacities.grid import (build_opacity_grid,
                                        read_opacity_grid,
                                        write_opacity_grid)


@pytest.fixture(scope="module")
def ref_grid():
    return read_opacity_grid(os.path.join(GOLD, "ref_opacity_grid.bin"))


def grid_config(solution="eclipse", opacityfile=None):
    cfg = make_config(solution, 1e30)
    cfg.tlow = 1000.0
    cfg.thigh = 2000.0
    cfg.tempdelt = 100.0
    cfg.opacityfile = opacityfile
    return cfg


def test_read_reference_grid(ref_grid):
    g = ref_grid
    assert g.molID.tolist() == [102]        # CH4
    assert g.temp.shape == (11,)
    assert g.press.shape == (20,)
    assert g.grid.shape == (20, 11, 1, 101)
    assert np.all(np.isfinite(g.grid))


def test_build_matches_reference(ref_grid):
    model = TransitModel(grid_config())
    og = build_opacity_grid(model)
    assert og.grid.shape == ref_grid.grid.shape
    np.testing.assert_allclose(og.temp, ref_grid.temp)
    np.testing.assert_allclose(og.press, ref_grid.press, rtol=1e-12)
    np.testing.assert_allclose(og.wns, ref_grid.wns, rtol=1e-12)
    scale = ref_grid.grid.max()
    np.testing.assert_allclose(og.grid, ref_grid.grid, rtol=5e-5,
                               atol=scale * 1e-10)


def test_roundtrip(tmp_path, ref_grid):
    p = str(tmp_path / "og.bin")
    write_opacity_grid(p, ref_grid)
    g2 = read_opacity_grid(p)
    np.testing.assert_array_equal(g2.grid, ref_grid.grid)
    np.testing.assert_array_equal(g2.molID, ref_grid.molID)


def test_gridmode_spectrum_matches_reference(tmp_path):
    gold = np.load(os.path.join(GOLD, "ref_eclipse_gridmode.npz"))
    cfg = grid_config(opacityfile=os.path.join(GOLD,
                                               "ref_opacity_grid.bin"))
    model = TransitModel(cfg)
    assert model.ogrid is not None and model.tli is None
    res = model.compute()
    np.testing.assert_allclose(np.asarray(res.extinction), gold["ext"],
                               rtol=5e-5, atol=gold["ext"].max() * 1e-10)
    np.testing.assert_allclose(np.asarray(res.spectrum), gold["spec"],
                               rtol=1e-5)
