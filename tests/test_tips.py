"""Partition-function source tests.

The reference computes HITRAN partition functions with Gamache TIPS
(pylineread/src/db_hitran.py:100-158, via the non-vendored pytips C
submodule).  tips.statmech_source re-derives Q(T) from molecular
constants — explicit rotational level sums (linear molecules, with
para/ortho nuclear-spin weights and centrifugal distortion) or corrected
classical tops, times harmonic vibrational products — anchored to
HITRAN's published molparam Q(296 K), so state-independent factors
cancel and the absolute scale is exact at the anchor.
"""

import numpy as np
import pytest

from transit_tpu.lineread import tips


def test_anchor_reproduced_exactly_at_296K():
    for mol, iso, q in [("CO", "26", 107.42), ("CO2", "626", 286.09),
                        ("H2O", "161", 174.58), ("CH4", "211", 590.48),
                        ("H2", "11", 7.67)]:
        t, pf = tips.statmech_source(mol, temps=[296.0])([iso])
        np.testing.assert_allclose(pf[0, 0], q, rtol=1e-12)


def test_covers_tips_temperature_range():
    t, pf = tips.statmech_source("CO")(["26"])
    assert t[0] == 70.0 and t[-1] >= 3000.0
    assert np.all(np.diff(pf[0]) > 0)          # monotone in T


def test_linear_explicit_sum_matches_mulholland():
    """Internal consistency: the explicit level sum must match the
    Mulholland expansion Q = (1/x)(1 + x/3 + x^2/15 + 4x^3/315) in its
    domain of validity (x = hcB/kT small)."""
    B = 1.93128                                 # CO
    for T in (150.0, 296.0, 1000.0, 3000.0):
        x = B * tips.HCK / T
        series = (1.0 / x) * (1 + x / 3 + x ** 2 / 15 + 4 * x ** 3 / 315)
        got = tips.qrot_linear(np.array([T]), B)[0]
        np.testing.assert_allclose(got, series, rtol=1e-6)


def test_h2_para_ortho_low_temperature():
    """H2 at 70 K is dominated by J=0 (para, weight 1) and J=1 (ortho,
    weight 3): Q_rot = 1 + 9 exp(-2B hc/kT) + ... — the quantum regime
    a classical/rigid-rotor law cannot represent."""
    B, D = 60.853, 0.0471
    got = tips.qrot_linear(np.array([70.0]), B, D, gns=(1.0, 3.0))[0]
    u1, u2 = 2.0, 6.0
    byhand = (1.0 +
              9.0 * np.exp(-(B * u1 - D * u1 ** 2) * tips.HCK / 70.0) +
              5.0 * np.exp(-(B * u2 - D * u2 ** 2) * tips.HCK / 70.0))
    np.testing.assert_allclose(got, byhand, rtol=2e-5)   # J>=3: ~7e-6


def test_classical_limit_and_vibrational_excitation():
    """High-T: rotation goes classical (Q_rot -> kT/hcB) and vibration
    contributes the harmonic product."""
    got = tips.qrot_linear(np.array([2000.0]), 1.93128)[0]
    np.testing.assert_allclose(got, 2000.0 / tips.HCK / 1.93128,
                               rtol=1e-3)
    qv = tips.qvib_harmonic(np.array([3000.0]), ((667.4, 2),))[0]
    np.testing.assert_allclose(
        qv, (1 - np.exp(-667.4 * tips.HCK / 3000.0)) ** -2, rtol=1e-12)


def test_spherical_top_correction_factor():
    """qrot_nonlinear carries the exact spherical-top quantum correction
    exp(hcB/4kT): compare against the explicit (2J+1)^2 level sum for
    CH4's B."""
    B = 5.2412
    for T in (150.0, 296.0, 1000.0):
        J = np.arange(0.0, 400.0)
        exact = np.sum((2 * J + 1) ** 2 *
                       np.exp(-B * J * (J + 1) * tips.HCK / T))
        got = tips.qrot_nonlinear(np.array([T]), (B, B, B))[0]
        np.testing.assert_allclose(got, exact, rtol=2e-3)


def test_default_source_uses_statmech_for_known_molecules():
    t, pf = tips.default_source("CH4", ["211"])(["211"])
    q296 = tips.statmech_source("CH4", temps=[296.0])(["211"])[1][0, 0]
    np.testing.assert_allclose(q296, 590.48, rtol=1e-12)
    # Rigid rotor would be (T/296)^1.5 with no vibration — at 3000 K
    # that underestimates CH4's Q by ~3x; statmech must not:
    ratio = pf[0, -1] / np.interp(296.0, t, pf[0])
    assert ratio > 1000.0                     # vib-rich: ~3400x

    rr = tips.rigid_rotor_source(power=1.5)(["211"])[1]
    assert rr[0, -1] / np.interp(296.0, tips.TIPS_TEMPS, rr[0]) < 40.0


def test_default_source_warns_for_unknown_molecule(caplog):
    import logging
    with caplog.at_level(logging.WARNING, logger="transit_tpu"):
        tips.default_source("XYZ", ["1"])(["1"])
    assert any("NOT TIPS-accurate" in r.message for r in caplog.records)


def test_statmech_warns_for_unanchored_isotopologue(caplog):
    import logging
    with caplog.at_level(logging.WARNING, logger="transit_tpu"):
        t, pf = tips.statmech_source("CO")(["26", "99"])
    assert any("no Q(296 K) anchor" in r.message for r in caplog.records)
    # Anchored isotopologue unaffected:
    np.testing.assert_allclose(np.interp(296.0, t, pf[0]), 107.42,
                               rtol=2e-3)


def test_hitran_compile_without_pf_gets_statmech(tmp_path):
    """End-to-end: compiling a CH4 .par with no pf file embeds the
    anchored statistical-mechanical partition functions in the TLI."""
    from tests.test_lineread import make_par_line
    from transit_tpu.lineread.hitran import HitranReader
    from transit_tpu.lineread.compile import compile_tli
    from transit_tpu.io.tli import read_tli
    p = tmp_path / "06_t.par"
    p.write_text(make_par_line(6, 1, 3030.0, 1e-20, 2.5, 100.0, 11.0))
    out = str(tmp_path / "t.tli")
    r = HitranReader(str(p))
    compile_tli([r.block(3.0, 3.4)], 3.0, 3.4, out)
    d = read_tli(out)
    db = d.databases[0]
    q296 = np.interp(296.0, db.temps, db.isotopes[0].partition)
    np.testing.assert_allclose(q296, 590.48, rtol=2e-3)
