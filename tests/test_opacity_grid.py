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


def test_fast_build_is_permol_consistent():
    """build_opacity_grid_fast (the production builder for the
    reference's 'hours' workload): the per-molecule grid rows, collapsed
    with the cell densities, must reproduce the collapsed fast kernel
    exactly — validates the permol/unit-density plumbing independent of
    any quantization question."""
    import jax.numpy as jnp
    from transit_tpu.constants import AMU, KB
    from transit_tpu.numerics.spline import splinterp_np
    from transit_tpu.opacities import fast
    from transit_tpu.opacities.grid import build_opacity_grid_fast

    cfg = grid_config()
    cfg.ethreshold = 1e-30          # remove per-molecule-kmax ambiguity
    fm = TransitModel(cfg, mode="fast")
    ogf = build_opacity_grid_fast(fm)
    r, t = 12, 5
    T = float(ogf.temp[t])
    atm = fm.atm
    dens = (AMU * atm.q[:, r] * (atm.press[r] * atm.pfct) / KB / T)
    dens = dens * (atm.mm[r] if atm.by_mass else np.asarray(fm.mol.mass))
    Zc = np.array([splinterp_np(tt, zz, np.array([T]))[0]
                   for tt, zz in fm._pf])
    direct = np.asarray(fast.fast_extinction(
        fm.fplan, fm.fdev, jnp.array([T]), jnp.asarray(dens[:, None]),
        jnp.asarray(Zc[:, None]), jnp.asarray(fm.mol.mass),
        jnp.asarray(fm.mol.radius), wn_i=fm.wns.i, dwn=fm.wns.d,
        ethresh=1e-30, nwidth=cfg.nwidth))[0]
    ids = list(fm.mol.ids)
    dens_m = np.array([dens[ids.index(int(mid))] for mid in ogf.molID])
    coll = np.einsum("mw,m->w", ogf.grid[r, t], dens_m)
    np.testing.assert_allclose(coll, direct,
                               atol=np.abs(direct).max() * 1e-12)


def test_fast_build_converges_to_exact_with_table_refinement():
    """The fast grid uses TRUE per-line widths; the exact grid carries
    the reference's log-spaced width-table quantization.  Refining the
    table (15x15 -> 60x60) must shrink the gap toward the fast grid —
    the attribution that the difference is the exact path's
    discretization, not a fast-kernel defect."""
    from transit_tpu.opacities.grid import build_opacity_grid_fast

    fm = TransitModel(grid_config(), mode="fast")
    ogf = build_opacity_grid_fast(fm)

    def l1_gap(ndop):
        cfg = grid_config()
        cfg.ndop = cfg.nlor = ndop
        og = build_opacity_grid(TransitModel(cfg))
        return np.abs(ogf.grid - og.grid).sum() / np.abs(og.grid).sum()

    g15, g60 = l1_gap(15), l1_gap(60)
    assert g60 < 0.5 * g15          # measured: 0.106 -> 0.031
    assert g60 < 0.05


def test_fast_build_writes_reference_format(tmp_path):
    from transit_tpu.opacities.grid import build_opacity_grid_fast

    fm = TransitModel(grid_config(), mode="fast")
    p = str(tmp_path / "fast_grid.bin")
    og = build_opacity_grid_fast(fm, p)
    g2 = read_opacity_grid(p)
    np.testing.assert_array_equal(g2.grid, og.grid)
    # And the written grid drives the grid-interpolation mode:
    cfg = grid_config(opacityfile=p)
    model = TransitModel(cfg)
    res = model.compute()
    assert np.all(np.isfinite(np.asarray(res.spectrum)))


def test_mode_b_build_and_continue(tmp_path):
    """Reference opacity mode (b), opacity.c:39-70: when ``opacityfile``
    is specified but ABSENT (and not --justOpacity), one invocation must
    compute the grid, write it, and continue to the spectrum served from
    that grid.  The written grid must byte-match the two-step path
    (--justOpacity build, then a separate grid-mode run), and the
    spectrum must match the two-step run's output exactly."""
    from tests.test_conformance import FIX
    from transit_tpu import cli

    common = [
        "--atm", f"{FIX}/test.atm", "--linedb", f"{FIX}/test.tli",
        "--csfile", f"{FIX}/test_cia.dat",
        "--molfile", f"{FIX}/molecules.dat",
        "--wnlow", "2000", "--wnhigh", "2100", "--wndelt", "1.0",
        "--wnosamp", "216", "--wnfct", "1.0", "--ndop", "15",
        "--nlor", "15", "--dmin", "1e-3", "--dmax", "0.25",
        "--lmin", "1e-4", "--lmax", "10.0", "--nwidth", "20",
        "--ethresh", "1e-8", "--solution", "eclipse",
        "--toomuch", "1e30", "--raygrid", "0 20 40 60 80",
        "--tlow", "1000", "--thigh", "2000", "--tempdelt", "100",
        "--verb", "0",
    ]

    # Two-step path: --justOpacity build, then a grid-mode spectrum run:
    grid2 = str(tmp_path / "two_step.bin")
    spec2 = str(tmp_path / "two_step_spec.dat")
    assert cli.main(common + ["--opacityfile", grid2,
                              "--justOpacity"]) == 0
    assert os.path.exists(grid2)
    assert cli.main(common + ["--opacityfile", grid2,
                              "--outspec", spec2]) == 0

    # Mode (b): absent opacityfile, single run:
    gridb = str(tmp_path / "mode_b.bin")
    specb = str(tmp_path / "mode_b_spec.dat")
    assert not os.path.exists(gridb)
    assert cli.main(common + ["--opacityfile", gridb,
                              "--outspec", specb]) == 0
    assert os.path.exists(gridb), "mode (b) must leave the grid behind"

    with open(gridb, "rb") as fb, open(grid2, "rb") as f2:
        assert fb.read() == f2.read(), "grid bytes differ from two-step"
    with open(specb) as fb, open(spec2) as f2:
        assert fb.read() == f2.read(), "spectrum differs from two-step"
