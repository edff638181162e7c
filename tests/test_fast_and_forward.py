import numpy as np
import jax
import jax.numpy as jnp
import pytest

from transit_tpu.config import TransitConfig
from transit_tpu.model import TransitModel
from tests.test_conformance import make_config


@pytest.fixture(scope="module")
def models():
    cfg = make_config("eclipse", 1e30)
    # Dense width table so the exact path's quantization error is small and
    # the two paths should agree closely:
    cfg.ndop = 120
    cfg.nlor = 120
    exact = TransitModel(cfg, mode="exact")
    fastm = TransitModel(cfg, mode="fast")
    return exact, fastm


def test_fast_matches_exact_extinction(models):
    exact, fastm = models
    re_ = exact.compute()
    rf = fastm.compute()
    a = np.asarray(re_.extinction)
    b = np.asarray(rf.extinction)
    # Different discretizations: the exact path quantizes each line's
    # widths to the (log-spaced) table — ~5% width error even at 120
    # samples — and truncates wings at the quantized cutoff.  The fast path
    # uses true widths.  Median agreement is tight; the tail of the error
    # distribution reflects the exact path's quantization, concentrated in
    # inter-line valleys and line peaks:
    scale = a.max(axis=1, keepdims=True)
    mask = a > 1e-10 * scale
    rel = np.abs(a - b) / (np.abs(a) + 1e-3 * scale)
    # (Measured: a brute-force recompute with quantized widths agrees with
    # the exact path to ~1%, while true widths move valley floors by up to
    # tens of percent — i.e. the tail below is the reference's own
    # discretization error, not a kernel defect.)
    assert np.median(rel[mask]) < 2e-3
    assert np.quantile(rel[mask], 0.9) < 5e-2


def test_quantized_width_oracle_attributes_tail(models):
    """Attribution proof for the fast-path tail (extinction.c:479-509):
    a brute-force numpy recompute that keeps TRUE line physics but
    quantizes each line's widths to the exact path's (log-spaced) table
    bins and cuts wings at the quantized profile extent must reproduce
    the exact path far better than the true-width fast kernel does in
    the tail bins — i.e. the fast-vs-exact deviation IS the reference's
    own width discretization, not a kernel defect."""
    from transit_tpu.constants import (SQRTLN2, SIGCTE, EXPCTE, KB, AMU,
                                       LS, PI)
    from transit_tpu.numerics.search import nearest_index_np
    from transit_tpu.opacities.voigt import voigt_k

    exact, fastm = models
    a = np.asarray(exact.compute().extinction)       # (nl, nwn)
    b = np.asarray(fastm.compute().extinction)
    tab = exact.table
    atm = exact.atm
    iso = exact.iso
    molm = np.asarray(exact.mol.mass)
    molr = np.asarray(exact.mol.radius)
    wns_v = exact.wns.v
    odwn = exact.owns.d / exact.owns.o
    wn0 = float(exact.owns.v[0])
    eth = exact.cfg.ethreshold

    from transit_tpu.io.tli import select_lines
    from transit_tpu.constants import TLI_WAV_UNITS
    wl, isoid, elow, gf = select_lines(exact.tli, exact.wns.i,
                                       exact.wns.f)
    wavn = 1.0 / (np.asarray(wl) * TLI_WAV_UNITS)

    from transit_tpu.numerics.spline import splinterp_np
    Z = np.stack([splinterp_np(t, z, atm.temp) for t, z in exact._pf])

    oracle = np.zeros_like(a)
    for r in range(atm.nlayers):
        T = atm.temp[r] * atm.tfct
        dens = atm.d[:, r]
        fdop = np.sqrt(2.0 * KB * T / AMU) * SQRTLN2 / LS
        flor = np.sqrt(2.0 * KB * T / PI / AMU) / (AMU * LS)
        aL_iso = np.zeros(iso.mass.shape[0])
        for mi in range(iso.mass.shape[0]):
            csd = molr + molr[iso.imol[mi]]
            aL_iso[mi] = flor * np.sum(
                dens / molm * csd * csd *
                np.sqrt(1.0 / iso.mass[mi] + 1.0 / molm))
        aD_line = fdop / np.sqrt(iso.mass[isoid]) * wavn
        aL_line = aL_iso[isoid]
        # Quantize to the table bins (binsearchapprox nearest,
        # extinction.c:388-395):
        idop = nearest_index_np(tab.aDop, aD_line)
        ilor = nearest_index_np(tab.aLor, aL_line)
        aDq = tab.aDop[idop]
        aLq = tab.aLor[ilor]
        # Strength (extinction.c:413-419, 440-464):
        s = (gf * np.exp(-EXPCTE * elow / T) *
             (1.0 - np.exp(-EXPCTE * wavn / T)) *
             SIGCTE * iso.ratio[isoid] / iso.mass[isoid] /
             Z[isoid, r]) * dens[iso.imol[isoid]]
        kmax = (s / dens[iso.imol[isoid]]).max()
        keep = (s / dens[iso.imol[isoid]]) >= eth * kmax
        # Snap line centers to the fine grid; wings cut at the quantized
        # profile extent (getprofile, extinction.c:8-57):
        snapped = wn0 + np.round((wavn - wn0) / odwn) * odwn
        cut = tab.profsize[idop, ilor] * odwn
        # One fixed-shape (nlines, nwn) evaluation per layer:
        dist = np.abs(wns_v[None, :] - snapped[:, None])
        use = (dist <= cut[:, None]) & keep[:, None]
        x = float(SQRTLN2) * dist / aDq[:, None]
        y = float(SQRTLN2) * (aLq / aDq)[:, None]
        prof = np.asarray(voigt_k(jnp.asarray(x),
                                  jnp.broadcast_to(jnp.asarray(y),
                                                   x.shape)))
        prof = prof / aDq[:, None]
        oracle[r] = np.sum(np.where(use, prof, 0.0) * s[:, None],
                           axis=0)
    scale = a.max(axis=1, keepdims=True)
    mask = a > 1e-6 * scale
    rel_oracle = np.abs(oracle - a) / (np.abs(a) + 1e-3 * scale)
    rel_fast = np.abs(b - a) / (np.abs(a) + 1e-3 * scale)
    # The oracle (quantized widths) tracks the exact path closely:
    assert np.median(rel_oracle[mask]) < 2e-2
    # Attribution: in the bins where the fast path deviates most, the
    # quantized-width oracle agrees with the exact path an order of
    # magnitude better — the tail is the width discretization:
    tail = mask & (rel_fast > 0.05)
    if tail.sum() >= 10:
        assert np.median(rel_oracle[tail]) < 0.2 * np.median(
            rel_fast[tail])


def test_fast_matches_exact_spectrum(models):
    exact, fastm = models
    se = np.asarray(exact.compute().spectrum)
    sf = np.asarray(fastm.compute().spectrum)
    # Bulk agreement is ~1e-4; isolated strong-line peaks carry the exact
    # path's width-quantization error (up to a few percent):
    rel = np.abs(sf / se - 1.0)
    assert np.median(rel) < 5e-4
    assert rel.max() < 5e-2


def test_forward_matches_compute():
    cfg = make_config("eclipse", 1e30)
    m = TransitModel(cfg, mode="exact")
    spec0 = np.asarray(m.compute().spectrum)
    spec1 = np.asarray(m.forward(jnp.asarray(m.atm.temp),
                                 jnp.asarray(m.atm.q)))
    np.testing.assert_allclose(spec1, spec0, rtol=1e-12)


def test_forward_jit_and_grad():
    cfg = make_config("eclipse", 1e30)
    m = TransitModel(cfg, mode="fast")
    f = jax.jit(lambda t, q: jnp.sum(m.forward(t, q)))
    t0 = jnp.asarray(m.atm.temp)
    q0 = jnp.asarray(m.atm.q)
    v = f(t0, q0)
    assert np.isfinite(float(v))
    g = jax.grad(f, argnums=0)(t0, q0)
    g = np.asarray(g)
    assert g.shape == t0.shape
    assert np.all(np.isfinite(g))
    assert np.any(g != 0)
    # Finite-difference check on one layer temperature:
    eps = 1e-3
    tp = t0.at[10].add(eps)
    fd = (float(f(tp, q0)) - float(f(t0, q0))) / eps
    assert np.isclose(fd, g[10], rtol=2e-3), (fd, g[10])


def test_forward_hydrostatic_radii():
    cfg = make_config("transit", 1e30)
    cfg.gsurf = 980.0
    cfg.refpress = 1.0     # atm-file pressure units (bar)
    cfg.refradius = 92000.0
    m = TransitModel(cfg, mode="fast")
    f = jax.jit(m.forward)
    spec = np.asarray(f(jnp.asarray(m.atm.temp), jnp.asarray(m.atm.q)))
    assert spec.shape == (m.wns.n,)
    assert np.all(np.isfinite(spec))
    assert np.all(spec > 0)
    # Gradient flows through the hydrostatic geometry:
    g = jax.grad(lambda t: jnp.sum(m.forward(t, jnp.asarray(m.atm.q))))(
        jnp.asarray(m.atm.temp))
    assert np.all(np.isfinite(np.asarray(g)))


def test_forward_vmap_batch():
    cfg = make_config("eclipse", 1e30)
    m = TransitModel(cfg, mode="fast")
    t0 = jnp.asarray(m.atm.temp)
    q0 = jnp.asarray(m.atm.q)
    temps = jnp.stack([t0, t0 + 50.0, t0 - 50.0])
    qs = jnp.stack([q0, q0, q0 * 1.1])
    batch = jax.vmap(m.forward)(temps, qs)
    assert batch.shape == (3, m.wns.n)
    one = m.forward(t0, q0)
    np.testing.assert_allclose(np.asarray(batch[0]), np.asarray(one),
                               rtol=1e-10)


def test_jnp_weight_builders_match_numpy():
    from transit_tpu.rt import tau as rt_tau
    from transit_tpu.rt import geometry as rt_geom
    rng = np.random.default_rng(3)
    rad = np.sort(90000.0 + np.cumsum(rng.uniform(80, 160, 24)))
    We_np = rt_tau.eclipse_weights(rad)
    We_j = np.asarray(rt_geom.eclipse_weights_jnp(jnp.asarray(rad)))
    np.testing.assert_allclose(We_j, We_np, rtol=1e-9, atol=1e-12)
    Wt_np = rt_tau.transit_weights(rad, rad[::-1].copy())
    Wt_j = np.asarray(rt_geom.transit_weights_jnp(jnp.asarray(rad)))
    np.testing.assert_allclose(Wt_j, Wt_np, rtol=1e-9, atol=1e-12)


def test_jnp_modulation_table_matches_numpy():
    from transit_tpu.rt.transmission import (modulation_weight_table,
                                             modulation_weight_table_jnp)
    rng = np.random.default_rng(4)
    ipv = np.sort(rng.uniform(1.0, 2.0, 13))
    Wn = modulation_weight_table(ipv)
    Wj = np.asarray(modulation_weight_table_jnp(jnp.asarray(ipv)))
    np.testing.assert_allclose(Wj, Wn, rtol=1e-10, atol=1e-14)


def test_run_transit_flat_api():
    """BART-style flat input [T..., q...] matches forward()."""
    cfg = make_config("eclipse", 1e30)
    m = TransitModel(cfg, mode="fast")
    t0 = np.asarray(m.atm.temp)
    q0 = np.asarray(m.atm.q)
    flat = np.concatenate([t0, q0.reshape(-1)])
    a = np.asarray(m.run_transit(jnp.asarray(flat)))
    b = np.asarray(m.forward(jnp.asarray(t0), jnp.asarray(q0)))
    np.testing.assert_allclose(a, b, rtol=1e-12)


def test_split_far_matches_unsplit():
    """The far-line region-II split (opacities/fast.py R2_MARGIN) with
    decimation OFF (the exactness fallback) must be bit-identical to the
    unsplit banded path: far lines satisfy s = |x| + y >= 5.5 for every
    (layer, bin) they are evaluated at, so the full Humlicek kernel
    would select the same region-II branch."""
    cfg = make_config("eclipse", 1e30)
    m0 = TransitModel(cfg, mode="fast", bands=6, split_far=False)
    m1 = TransitModel(cfg, mode="fast", bands=6, split_far=True,
                      far_decimate=False)
    t = jnp.asarray(m0.atm.temp, m0.dtype)
    q = jnp.asarray(m0.atm.q, m0.dtype)
    s0 = np.asarray(jax.jit(m0.forward)(t, q))
    s1 = np.asarray(jax.jit(m1.forward)(t, q))
    np.testing.assert_allclose(s1, s0, rtol=1e-12)


def _fine_grid_config():
    """A fine-resolution (0.01 cm-1) slice where Lorentz halos span
    thousands of bins — the regime the far-wing decimation targets
    (the BASELINE 1-20 um workload runs 950k bins at this spacing)."""
    cfg = make_config("eclipse", 1e30)
    cfg.wnlow, cfg.wnhigh, cfg.wndelt = 2000.0, 2040.0, 0.01
    cfg.wnosamp = 2
    return cfg


def test_far_decimation_conformance():
    """Far-wing decimation (FAR_FACTOR distance shells, Catmull-Rom
    upsample, smooth per-line halo weights) — VERDICT r4 next #1.
    Three bounds:

    1. The *decimation* error proper — decimated shells vs the same
       line-weighted physics at full resolution (far_full_res=True) —
       must be <= 1e-4 on both spectrum and extinction/layer-scale.
       (The shell fields are smooth by construction, so this measures
       pure cubic-interpolation error; observed ~1e-8.)
    2. The physics delta vs the reference-style per-layer hard cutoff
       (narrower-than-band-max layers keep their wings out to the band
       halo instead of truncating at nwidth half-widths) must stay
       within the nwidth truncation's own modeling uncertainty — the
       spectrum shift from nwidth 20 -> 30, which dwarfs it because the
       hard cutoff discards entire wing tails at these resolutions.
    3. Gradients flow through the decimated shells.
    """
    from transit_tpu.opacities import fast

    cfg = _fine_grid_config()
    m0 = TransitModel(cfg, mode="fast", bands=6, split_far=True,
                      far_decimate=False)
    m1 = TransitModel(cfg, mode="fast", bands=6, split_far=True,
                      far_decimate=True)
    # The decimation must actually engage on this grid:
    strides = [s for far in (m1.bplan.far_plans or []) if far
               for (_l, _r, s) in far]
    assert strides and max(strides) >= 4, \
        f"expected decimated shells, got strides {strides}"
    t = jnp.asarray(m0.atm.temp, m0.dtype)
    q = jnp.asarray(m0.atm.q, m0.dtype)

    r1 = m1.compute()
    e1 = np.asarray(r1.extinction)
    s1 = np.asarray(r1.spectrum)

    # (1) same-physics full-resolution baseline — pure interp error:
    orig = fast.banded_extinction
    try:
        fast.banded_extinction = \
            lambda *a, **k: orig(*a, far_full_res=True, **k)
        rF = m1.compute()
    finally:
        fast.banded_extinction = orig
    eF = np.asarray(rF.extinction)
    sF = np.asarray(rF.spectrum)
    scale = eF.max(axis=1, keepdims=True)
    assert (np.abs(e1 - eF) / scale).max() < 1e-4
    np.testing.assert_allclose(s1, sF, rtol=1e-4)

    # (2) wing-extension delta within the truncation uncertainty:
    r0 = m0.compute()
    s0 = np.asarray(r0.spectrum)
    ext_shift = np.abs(s1 / s0 - 1.0).max()
    cfg30 = _fine_grid_config()
    cfg30.nwidth = 30.0
    m30 = TransitModel(cfg30, mode="fast", bands=6, split_far=True,
                       far_decimate=False)
    s30 = np.asarray(m30.compute().spectrum)
    trunc_shift = np.abs(s30 / s0 - 1.0).max()
    assert ext_shift < trunc_shift, \
        (f"wing-extension shift {ext_shift:.2e} exceeds the truncation "
         f"uncertainty {trunc_shift:.2e}")

    # (3) gradients flow through the decimated shells:
    g = jax.grad(lambda tt: jnp.sum(m1.forward(tt, q)))(t)
    assert np.all(np.isfinite(np.asarray(g)))
    assert np.abs(np.asarray(g)).max() > 0.0


def test_banded_matches_unbanded():
    """Layer-banded plans (+ tile line-count classes) must reproduce the
    single-global-halo fast path exactly (the wing mask uses true
    per-layer widths in both; banding only skips evaluating pairs the
    mask would zero)."""
    cfg = make_config("eclipse", 1e30)
    m0 = TransitModel(cfg, mode="fast")
    mb = TransitModel(cfg, mode="fast", bands=6)
    assert mb.bplan is not None and len(mb.bplan.plans) >= 2
    t = jnp.asarray(m0.atm.temp, m0.dtype)
    q = jnp.asarray(m0.atm.q, m0.dtype)
    s0 = np.asarray(jax.jit(m0.forward)(t, q))
    sb = np.asarray(jax.jit(mb.forward)(t, q))
    np.testing.assert_allclose(sb, s0, rtol=5e-7)
    # gradients flow through the banded path:
    g = jax.grad(lambda tt: jnp.sum(mb.forward(tt, q)))(t)
    assert np.all(np.isfinite(np.asarray(g)))


def test_make_forward_and_device_tree():
    """make_forward binds the line tensors as jit ARGUMENTS (device_tree)
    instead of closure constants and must reproduce forward exactly."""
    cfg = make_config("eclipse", 1e30)
    for kw in (dict(mode="fast"), dict(mode="fast", bands=4)):
        m = TransitModel(cfg, **kw)
        t = jnp.asarray(m.atm.temp, m.dtype)
        q = jnp.asarray(m.atm.q, m.dtype)
        a = np.asarray(m.forward(t, q))
        b = np.asarray(m.make_forward()(t, q))
        np.testing.assert_allclose(b, a, rtol=1e-12)
        c = np.asarray(jax.jit(lambda dev, tt, qq: m.forward(tt, qq, dev))(
            m.device_tree(), t, q))
        np.testing.assert_allclose(c, a, rtol=1e-12)


def test_analytic_block_vjp_matches_autodiff():
    """The analytic block-level VJP (_block_val: Faddeeva-identity
    backward with table cotangents, no element residuals) must
    reproduce plain autodiff gradients through the full forward —
    including banded far shells, decimated bins-layout shells, and the
    tapered cutoff (VERDICT r4 next #2)."""
    from transit_tpu.opacities import fast

    cfg = _fine_grid_config()
    m = TransitModel(cfg, mode="fast", bands=6, split_far=True,
                     far_decimate=True)
    # the fine grid engages bins-layout decimated shells:
    assert any(p is not None and p.lanes == "bins"
               for far in (m.bplan.far_plans or []) if far
               for pair in far for p in pair[:2])
    t0 = jnp.asarray(m.atm.temp, m.dtype)
    q0 = jnp.asarray(m.atm.q, m.dtype)

    def loss(t, q):
        return jnp.sum(m.forward(t, q))

    assert fast.ANALYTIC_VJP
    ga = jax.grad(loss, argnums=(0, 1))(t0, q0)
    try:
        fast.ANALYTIC_VJP = False
        gd = jax.grad(loss, argnums=(0, 1))(t0, q0)
    finally:
        fast.ANALYTIC_VJP = True
    for a, b in zip(ga, gd):
        a, b = np.asarray(a), np.asarray(b)
        np.testing.assert_allclose(a, b, rtol=1e-5,
                                   atol=1e-12 * np.abs(b).max())


def test_forward_batch_matches_vmap():
    """forward_batch folds the batch into the extinction kernel's layer
    axis (one unbatched kernel invocation; the cheap assembly is
    vmapped) and must reproduce jax.vmap(forward) exactly, including
    gradients."""
    cfg = make_config("eclipse", 1e30)
    m = TransitModel(cfg, mode="fast", bands=6)
    t0 = jnp.asarray(m.atm.temp, m.dtype)
    q0 = jnp.asarray(m.atm.q, m.dtype)
    tb = jnp.stack([t0, t0 * 1.01, t0 * 0.98])
    qb = jnp.stack([q0, q0 * 1.02, q0])
    sb = np.asarray(m.forward_batch(tb, qb))
    sv = np.asarray(jax.vmap(m.forward, in_axes=(0, 0))(tb, qb))
    np.testing.assert_allclose(sb, sv, rtol=1e-10)
    g1 = jax.grad(lambda t: jnp.sum(m.forward_batch(t, qb)))(tb)
    g2 = jax.grad(lambda t: jnp.sum(
        jax.vmap(m.forward, in_axes=(0, 0))(t, qb)))(tb)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-6, atol=1e-30)
    # transmission geometry + hydrostatic radii (vmapped geometry):
    cfg2 = make_config("transit", 1e30)
    cfg2.gsurf, cfg2.refpress, cfg2.refradius = 980.0, 1.0, 92000.0
    m2 = TransitModel(cfg2, mode="fast", bands=4)
    sb2 = np.asarray(m2.forward_batch(tb, qb))
    sv2 = np.asarray(jax.vmap(m2.forward, in_axes=(0, 0))(tb, qb))
    np.testing.assert_allclose(sb2, sv2, rtol=1e-10)
