import numpy as np
import jax.numpy as jnp
import pytest

from transit_tpu.opacities.voigt import (
    voigt_k, bin_averaged_profile, build_profile_table, logspace_ref,
    getprofile_size,
)
from transit_tpu.constants import SQRTLN2, PI


def test_voigt_lorentz_limit():
    # For y >> 1 the Voigt profile approaches the Lorentzian.
    alphaL, alphaD = 5.0, 1e-3
    y = SQRTLN2 * alphaL / alphaD
    dv = np.linspace(0.0, 20.0, 100)
    x = SQRTLN2 * dv / alphaD
    vals = np.asarray(voigt_k(jnp.asarray(x), jnp.asarray(y))) / alphaD
    lorentz = alphaL / PI / (dv**2 + alphaL**2)
    assert np.allclose(vals, lorentz, rtol=2e-4)


def test_voigt_doppler_limit():
    # For y << 1, x small the Voigt profile approaches the Gaussian.
    alphaL, alphaD = 1e-7, 0.1
    y = SQRTLN2 * alphaL / alphaD
    dv = np.linspace(0.0, 0.25, 50)
    x = SQRTLN2 * dv / alphaD
    vals = np.asarray(voigt_k(jnp.asarray(x), jnp.asarray(y))) / alphaD
    gauss = (np.sqrt(np.log(2) / PI) / alphaD *
             np.exp(-np.log(2) * (dv / alphaD) ** 2))
    assert np.allclose(vals, gauss, rtol=1e-4)


def test_voigt_area_normalization():
    # Integral of the profile over all frequency = 1.
    alphaL, alphaD = 0.05, 0.02
    y = SQRTLN2 * alphaL / alphaD
    dv = np.linspace(0, 60, 400001)
    x = SQRTLN2 * dv / alphaD
    vals = np.asarray(voigt_k(jnp.asarray(x), jnp.asarray(y))) / alphaD
    area = 2.0 * np.trapezoid(vals, dv)  # symmetric
    assert abs(area - 1.0) < 1e-3


def test_voigt_region_continuity():
    # No large jumps across the region I/II and II/III boundaries.
    y_vals = [0.5, 1.7, 1.9, 4.9, 5.1]
    for y in y_vals:
        x = np.linspace(0.0, 8.0, 16001)
        v = np.asarray(voigt_k(jnp.asarray(x), jnp.asarray(float(y))))
        rel_jump = np.abs(np.diff(v)) / np.maximum(v[1:], 1e-30)
        assert np.max(rel_jump) < 5e-3, y


def test_bin_averaged_profiles_match_reference():
    g = np.load("tests/golden/voigtn_profiles.npz")
    meta = g["meta"]
    for k in range(meta.shape[0]):
        nwn, dwn, lor, dop, quick = meta[k]
        ours = bin_averaged_profile(int(nwn), float(dwn), float(lor),
                                    float(dop), bool(quick))
        ref = g[f"prof{k}"]
        assert ours.shape == ref.shape
        # float32 storage + (identical) float accumulation: tight match.
        np.testing.assert_allclose(ours, ref, rtol=2e-5, atol=0.0,
                                   err_msg=f"case {k}: {meta[k]}")


def test_getprofile_size():
    # extinction.c:8-57 semantics
    assert getprofile_size(1e-3, 0.01, 0.02, 20.0, 10**6) == \
        2 * int(0.02 * 20 / 1e-3 + 0.5) + 1
    assert getprofile_size(1.0, 1e-6, 1e-6, 20.0, 100) == 3
    assert getprofile_size(1e-5, 10.0, 1.0, 20.0, 50) == 101  # capped


def test_logspace_ref():
    a = logspace_ref(1e-3, 0.25, 60)
    assert a.shape == (60,)
    assert np.isclose(a[0], 1e-3) and np.isclose(a[-1], 0.25)
    ratios = a[1:] / a[:-1]
    assert np.allclose(ratios, ratios[0])


def test_profile_table_dedup_and_layout():
    t = build_profile_table(dwn=1e-3, nwave=5000, nwidth=20.0,
                            ndop=8, nlor=8, dmin=1e-3, dmax=0.25,
                            lmin=1e-4, lmax=10.0)
    assert t.profsize.shape == (8, 8)
    # Dedup: where aDop*10 < aLor (i != 0), entries share storage:
    for i in range(1, 8):
        for j in range(8):
            if t.aDop[i] * 10.0 < t.aLor[j]:
                assert t.base[i, j] == t.base[i - 1, j]
                assert t.profsize[i, j] == t.profsize[i - 1, j]
    # Each stored profile is the right length and positive at center:
    for i in range(8):
        for j in range(8):
            b = t.base[i, j]
            half = t.profsize[i, j]
            prof = t.flat[b:b + 2 * half + 1]
            assert prof.shape[0] == 2 * half + 1
            assert prof[half] == prof.max()


def test_humlicek_finite_value_and_grad_everywhere():
    """Regression (round 4): masked/padding lanes hand the fast kernels
    arbitrary (x, y) — including far-tile padding duplicates sitting ON
    a bin (x ~ 0, y ~ 1e-8, where |t|^4 underflows float32) and
    bin-to-dummy distances (x ~ 1e8, where it overflows).  Both kernels
    must return finite values AND finite reverse-mode gradients over
    the whole float32 (x, y) plane; NaN at any weight-zero lane
    poisons the spectrum through 0 * NaN."""
    import jax
    from transit_tpu.opacities.voigt import (voigt_k_humlicek,
                                             voigt_k_humlicek_r2)
    xs = jnp.asarray(10.0 ** np.linspace(-8, 8, 300), jnp.float32)
    for yv in (1e-8, 1e-4, 1e-2, 1.0, 1e2, 1e6):
        y = jnp.full_like(xs, yv)
        for fn in (voigt_k_humlicek, voigt_k_humlicek_r2):
            v = np.asarray(fn(xs, y))
            g = np.asarray(jax.grad(lambda xx: jnp.sum(fn(xx, y)))(xs))
            assert np.all(np.isfinite(v)), (fn.__name__, yv)
            assert np.all(np.isfinite(g)), (fn.__name__, yv)
