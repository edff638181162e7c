"""End-to-end conformance against the reference C implementation.

Golden data: tests/golden/ref_*.npz, produced by tests/make_golden_spectrum.py
running the reference transit binary on the synthetic fixtures in
tests/fixtures/ (same line list, atmosphere, CIA table, and config).
"""

import os

import numpy as np
import pytest

from transit_tpu.config import TransitConfig
from transit_tpu.model import TransitModel

HERE = os.path.dirname(os.path.abspath(__file__))
FIX = os.path.join(HERE, "fixtures")
GOLD = os.path.join(HERE, "golden")


def make_config(solution, toomuch, raygrid="0 20 40 60 80"):
    return TransitConfig(
        atm=f"{FIX}/test.atm", linedb=f"{FIX}/test.tli",
        csfile=f"{FIX}/test_cia.dat", molfile=f"{FIX}/molecules.dat",
        wnlow=2000.0, wnhigh=2100.0, wndelt=1.0, wnosamp=216, wnfct=1.0,
        ndop=15, nlor=15, dmin=1e-3, dmax=0.25, lmin=1e-4, lmax=10.0,
        nwidth=20.0, ethreshold=1e-8, solution=solution, toomuch=toomuch,
        raygrid=raygrid)


@pytest.fixture(scope="module")
def eclipse_run():
    model = TransitModel(make_config("eclipse", 1e30))
    return model, model.compute()


@pytest.fixture(scope="module")
def transit_run():
    model = TransitModel(make_config("transit", 1e30))
    return model, model.compute()


class TestEclipse:
    def test_cia(self, eclipse_run):
        g = np.load(os.path.join(GOLD, "ref_eclipse.npz"))
        _, res = eclipse_run
        np.testing.assert_allclose(np.asarray(res.cia), g["cia"],
                                   rtol=1e-8, atol=1e-30)

    def test_extinction(self, eclipse_run):
        g = np.load(os.path.join(GOLD, "ref_eclipse.npz"))
        _, res = eclipse_run
        ours = np.asarray(res.extinction)     # (nl, nwn)
        ref = g["ext"]
        np.testing.assert_allclose(ours, ref, rtol=5e-5,
                                   atol=ref.max() * 1e-10)

    def test_tau(self, eclipse_run):
        g = np.load(os.path.join(GOLD, "ref_eclipse.npz"))
        _, res = eclipse_run
        np.testing.assert_allclose(np.asarray(res.tau), g["tau"],
                                   rtol=5e-5, atol=g["tau"].max() * 1e-10)

    def test_intensity(self, eclipse_run):
        g = np.load(os.path.join(GOLD, "ref_eclipse.npz"))
        _, res = eclipse_run
        ref = g["intens"][:, 1:].T            # (nangle, nwn)
        np.testing.assert_allclose(np.asarray(res.intensity), ref,
                                   rtol=1e-5)

    def test_flux(self, eclipse_run):
        g = np.load(os.path.join(GOLD, "ref_eclipse.npz"))
        _, res = eclipse_run
        np.testing.assert_allclose(np.asarray(res.spectrum), g["spec"],
                                   rtol=1e-5)

    def test_flux_with_toomuch(self):
        g = np.load(os.path.join(GOLD, "ref_eclipse_toomuch.npz"))
        model = TransitModel(make_config("eclipse", 3.0, raygrid="0 40 80"))
        res = model.compute()
        np.testing.assert_allclose(np.asarray(res.spectrum), g["spec"],
                                   rtol=1e-5)


class TestTransit:
    def test_tau(self, transit_run):
        g = np.load(os.path.join(GOLD, "ref_transit.npz"))
        _, res = transit_run
        np.testing.assert_allclose(np.asarray(res.tau), g["tau"],
                                   rtol=5e-5, atol=g["tau"].max() * 1e-10)

    def test_modulation(self, transit_run):
        g = np.load(os.path.join(GOLD, "ref_transit.npz"))
        _, res = transit_run
        np.testing.assert_allclose(np.asarray(res.spectrum), g["spec"],
                                   rtol=1e-5)

    def test_modulation_with_toomuch(self):
        g = np.load(os.path.join(GOLD, "ref_transit_toomuch.npz"))
        model = TransitModel(make_config("transit", 5.0))
        res = model.compute()
        np.testing.assert_allclose(np.asarray(res.spectrum), g["spec"],
                                   rtol=1e-5)


class TestMultiDatabase:
    """Two TLI databases (CH4 2 isotopes + H2O 1 isotope), four species —
    exercises the cumulative-isotope / molecule mapping (setimol,
    readlineinfo.c:249-278)."""

    def multi_config(self, solution):
        return TransitConfig(
            atm=f"{FIX}/multi.atm", linedb=f"{FIX}/multi.tli",
            csfile=f"{FIX}/test_cia.dat",
            molfile=f"{FIX}/molecules_multi.dat",
            wnlow=2000.0, wnhigh=2100.0, wndelt=1.0, wnosamp=216,
            wnfct=1.0, ndop=15, nlor=15, nwidth=20.0, ethreshold=1e-8,
            solution=solution, toomuch=1e30, raygrid="0 40 80")

    def test_eclipse(self):
        g = np.load(os.path.join(GOLD, "ref_multi_eclipse.npz"))
        model = TransitModel(self.multi_config("eclipse"))
        assert model.iso.mass.shape[0] == 3
        assert model.iso.nmol_out == 2
        res = model.compute()
        np.testing.assert_allclose(np.asarray(res.extinction), g["ext"],
                                   rtol=5e-5, atol=g["ext"].max() * 1e-10)
        np.testing.assert_allclose(np.asarray(res.spectrum), g["spec"],
                                   rtol=1e-5)

    def test_transit(self):
        g = np.load(os.path.join(GOLD, "ref_multi_transit.npz"))
        model = TransitModel(self.multi_config("transit"))
        res = model.compute()
        np.testing.assert_allclose(np.asarray(res.spectrum), g["spec"],
                                   rtol=1e-5)

    def test_fast_mode_multi(self):
        model = TransitModel(self.multi_config("eclipse"), mode="fast")
        res = model.compute()
        g = np.load(os.path.join(GOLD, "ref_multi_eclipse.npz"))
        rel = np.abs(np.asarray(res.spectrum) / g["spec"] - 1.0)
        assert np.median(rel) < 2e-3
        assert rel.max() < 0.1


class TestScatteringClouds:
    """Rayleigh scattering (both flags) and cloud model 1 against the
    reference binary.  Cloud models 2-5 multiply the reference's
    *uninitialized* mean_dens stack array (tau.c:129,203 — UB), so they
    cannot be golden-pinned; transit_tpu computes the intended quantity
    (documented in model.py) and they are covered by unit tests."""

    def test_lecavelier_scattering_eclipse(self):
        g = np.load(os.path.join(GOLD, "ref_eclipse_scat.npz"))
        cfg = make_config("eclipse", 1e30, raygrid="0 40 80")
        cfg.scattering = "0.5"
        res = TransitModel(cfg).compute()
        np.testing.assert_allclose(np.asarray(res.spectrum), g["spec"],
                                   rtol=1e-5)

    def test_polarizability_scattering_transit(self):
        g = np.load(os.path.join(GOLD, "ref_transit_polar.npz"))
        cfg = make_config("transit", 1e30)
        cfg.scattering = "polar"
        res = TransitModel(cfg).compute()
        np.testing.assert_allclose(np.asarray(res.tau), g["tau"],
                                   rtol=5e-5, atol=g["tau"].max() * 1e-10)
        np.testing.assert_allclose(np.asarray(res.spectrum), g["spec"],
                                   rtol=1e-5)

    def test_cloud_ext_transit(self):
        g = np.load(os.path.join(GOLD, "ref_transit_cloud1.npz"))
        cfg = make_config("transit", 1e30)
        cfg.cloud = "ext,1e-8,-1.0,1.5"   # reference type-name syntax
        res = TransitModel(cfg).compute()
        np.testing.assert_allclose(np.asarray(res.tau), g["tau"],
                                   rtol=5e-5, atol=g["tau"].max() * 1e-10)
        np.testing.assert_allclose(np.asarray(res.spectrum), g["spec"],
                                   rtol=1e-5)


def test_detail_outputs(tmp_path):
    """--detailtau/--detailext/--detailcia writers vs the reference's
    detailout (tau.c:525-605): same wavenumber binary-search selection,
    same rows (tau vs impact parameter; extinction/CIA vs radius)."""
    from transit_tpu.cli import write_detail
    g = np.load(os.path.join(GOLD, "ref_detail.npz"))
    model = TransitModel(make_config("eclipse", 1e30, raygrid="0 40 80"))
    res = model.compute()

    def ours(spec, rows_axis, arr, radfirst):
        path = tmp_path / "d.dat"
        write_detail(f"{path}:{spec}", res.wns, rows_axis, arr, radfirst)
        with open(path) as f:
            head = f.readline().split("=>")[1].split()
        return (np.array([float(v) for v in head]),
                np.loadtxt(path, skiprows=1))

    wn_t, dt = ours("2040.5,2070", model.ips_v, np.asarray(res.tau), False)
    np.testing.assert_allclose(wn_t, g["dtau_wn"])
    np.testing.assert_allclose(dt, g["dtau"], rtol=1e-5)
    wn_e, de = ours("2025,2050", model.rads_v,
                    np.asarray(res.extinction), True)
    np.testing.assert_allclose(wn_e, g["dext_wn"])
    np.testing.assert_allclose(de, g["dext"], rtol=5e-5,
                               atol=g["dext"].max() * 1e-10)
    # detailcia: the reference passes its *double* e_cs array through
    # detailout's CIA_DOFLOAT branch, which reinterprets the bytes as
    # float (tau.c:337-338,539,585 — arrf = (float**)arr on a double
    # array), so its printed values are garbage (the golden holds e.g.
    # -4e31).  Only the wavenumber selection column is meaningful; we
    # print the intended values:
    wn_c, dc = ours("2060", model.rads_v, np.asarray(res.cia), False)
    np.testing.assert_allclose(wn_c, g["dcia_wn"])
    np.testing.assert_allclose(dc[:, 0], g["dcia"][:, 0], rtol=1e-6)
    np.testing.assert_allclose(dc[:, 1], np.asarray(res.cia)[
        int(np.searchsorted(res.wns, 2060.0, side="right") - 1)],
        rtol=1e-5, atol=1e-30)


def test_eclipse_full_oversampling():
    """wnosamp = 2160 (the demo's production value): exercises large
    profiles including the VOIGT_QUICK path (nvgt > 99999,
    extinction.c:50-51)."""
    g = np.load(os.path.join(GOLD, "ref_eclipse_osamp2160.npz"))
    cfg = make_config("eclipse", 1e30, raygrid="0 40 80")
    cfg.wnhigh = 2050.0
    cfg.wnosamp = 2160
    model = TransitModel(cfg)
    from transit_tpu.opacities.voigt import VOIGT_MAXELEMENTS
    assert int(2 * model.table.profsize.max() + 1) > VOIGT_MAXELEMENTS
    res = model.compute()
    np.testing.assert_allclose(np.asarray(res.extinction), g["ext"],
                               rtol=5e-5, atol=g["ext"].max() * 1e-10)
    np.testing.assert_allclose(np.asarray(res.spectrum), g["spec"],
                               rtol=1e-5)
