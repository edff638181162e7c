"""Voigt line profiles, TPU-native.

The reference evaluates the Voigt function with the Pierluisi et al. (1977)
three-region complex-probability approximation (reference: pu/src/voigt.c:132-200,
``voigtxy``) and builds *bin-averaged* profiles on an equispaced grid with
per-bin Simpson/trapezoid sub-sampling (voigt.c:369-483, ``voigtn``).

Here the same scheme is a branch-free, fully vectorized jnp computation:
regions are selected with ``jnp.where`` and the Region-I power series runs a
fixed 29 masked iterations (the reference's NFCN bound at x<3).  The function
is elementwise, so the identical code runs inside Pallas kernels on the VPU.

Two products:
  * :func:`voigt_k` — pointwise K(x, y); multiply by SQRTLN2PI/alphaD for the
    area-normalized profile value (used by the fast on-the-fly kernel).
  * :func:`bin_averaged_profile` / :class:`ProfileTable` — the reference's
    precomputed bin-averaged profile grid (used by the conformance-exact
    extinction path; reference: transit/src/opacity.c:218-277 calcprofiles,
    transit/src/extinction.c:8-57 getprofile).
"""

from __future__ import annotations

import dataclasses
import functools
import math

import numpy as np
import jax
import jax.numpy as jnp

from transit_tpu.constants import SQRTLN2, SQRTLN2PI, TWOOSQRTPI

# Region II/III rational-approximation coefficients (voigt.c:32-42):
_A1, _A2, _A3 = 0.46131350, 0.19016350, 0.09999216
_A4, _A5, _A6 = 1.78449270, 0.002883894, 5.52534370
_B1, _B2, _B3, _B4 = 0.51242424, 0.27525510, 0.05176536, 2.72474500

# ferf[n] = 1/(n! (2n+1)) (voigt.c:46-108).  29 terms cover NFCN for x < 3.
_MAX_ITERS = 29
_FERF = np.array([1.0 / (math.factorial(n) * (2 * n + 1))
                  for n in range(_MAX_ITERS + 1)], dtype=np.float64)

# Reference getprofile switches to VOIGT_QUICK above this many samples
# (pu/src/voigt.c:109, extinction.c:50-51):
VOIGT_MAXELEMENTS = 99999


def voigt_k(x, y):
    """K(x,y) = sqrt(ln2/pi) * Re[w(x + iy)] via the 3-region approximation.

    The profile value of the reference's voigtxy is K(x, y)/alphaD.
    Elementwise over x (y may broadcast).  Matches voigt.c:132-200.
    """
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    dtype = jnp.result_type(x, y)
    x = x.astype(dtype)
    y = jnp.broadcast_to(y.astype(dtype), x.shape)

    x2y2 = x * x - y * y
    xy2 = 2.0 * x * y
    cosxy = jnp.cos(xy2)
    sinxy = jnp.sin(xy2)

    # ---- Region I: x < 3 and y < 1.8 (power series) ----
    # Iteration count: n = NFCN(x,y) + 1, NFCN = 15 if x<1 else int(6.842x+8)
    n_iters = jnp.where(x < 1.0, 15, (6.842 * x + 8.0).astype(jnp.int32)) + 1
    ferf = jnp.asarray(_FERF, dtype=dtype)

    # Clamp inputs so the masked-out lanes (regions II/III) cannot overflow:
    xs = jnp.minimum(x, 3.0)
    ys = jnp.minimum(y, 1.8)
    sx2y2 = xs * xs - ys * ys
    sxy2 = 2.0 * xs * ys

    def body(i, state):
        ar, ai, orr, oi = state
        ni = orr * sxy2 + oi * sx2y2
        nr = orr * sx2y2 - oi * sxy2
        take = (i <= n_iters).astype(dtype)
        ar = ar + take * nr * ferf[i]
        ai = ai + take * ni * ferf[i]
        return ar, ai, nr, ni

    ar0 = ys
    ai0 = -xs
    ar, ai, _, _ = jax.lax.fori_loop(1, _MAX_ITERS + 1, body,
                                     (ar0, ai0, ar0, ai0))
    scosxy = jnp.cos(sxy2)
    ssinxy = jnp.sin(sxy2)
    k1 = SQRTLN2PI * jnp.exp(-sx2y2) * (
        scosxy * (1.0 - ar * TWOOSQRTPI) - ssinxy * ai * TWOOSQRTPI)

    # ---- Region II: x < 5 and y < 5 (3-term rational) ----
    ar2 = xy2 * xy2
    nr2 = xy2 * x
    ni2 = x2y2 - _A2
    ai2 = x2y2 - _A4
    oi2 = x2y2 - _A6
    k2 = SQRTLN2PI * (_A1 * ((nr2 - ni2 * y) / (ni2 * ni2 + ar2)) +
                      _A3 * ((nr2 - ai2 * y) / (ai2 * ai2 + ar2)) +
                      _A5 * ((nr2 - oi2 * y) / (oi2 * oi2 + ar2)))

    # ---- Region III (2-term rational) ----
    ni3 = x2y2 - _B2
    ai3 = x2y2 - _B4
    k3 = SQRTLN2PI * (_B1 * ((nr2 - ni3 * y) / (ni3 * ni3 + ar2)) +
                      _B3 * ((nr2 - ai3 * y) / (ai3 * ai3 + ar2)))

    in1 = (x < 3.0) & (y < 1.8)
    in2 = (x < 5.0) & (y < 5.0)
    return jnp.where(in1, k1, jnp.where(in2, k2, k3))


def _humlicek_w(x, y):
    """Humlicek (1982) w4 as a real pair: (Re w(x+iy), Im w(x+iy)).

    The body of :func:`voigt_k_humlicek`; the imaginary part costs two
    extra multiply-adds on the shared divide plus one sin in region IV,
    and feeds the analytic custom-VJP (the Faddeeva derivative identity
    w'(z) = -2 z w(z) + 2i/sqrt(pi) needs both parts).
    """
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    dtype = jnp.result_type(x, y)
    x = x.astype(dtype)
    y = jnp.broadcast_to(y.astype(dtype), x.shape)

    def cmul(ar, ai, br, bi):
        return ar * br - ai * bi, ar * bi + ai * br

    def horner(tr_, ti_, coeffs):
        # complex Horner: p(t) with real coefficients, highest degree last
        pr = jnp.full_like(tr_, coeffs[-1])
        pi = jnp.zeros_like(tr_)
        for c in reversed(coeffs[:-1]):
            pr, pi = cmul(pr, pi, tr_, ti_)
            pr = pr + c
        return pr, pi

    tr, ti = y, -x                       # t = y - i x
    ur = (y - x) * (y + x)               # u = t^2
    ui = -2.0 * x * y
    s = jnp.abs(x) + y

    in2 = s >= 5.5
    in4 = (~in2) & (y < 0.195 * jnp.abs(x) - 0.176)
    in3 = ~(in2 | in4)

    # Mask unselected lanes so they can't produce inf/NaN (which would
    # poison gradients through jnp.where):
    m = jnp.where

    # Region II (s >= 5.5): w = t (1.410474 + 0.5641896 u) / (0.75 + u (3 + u)),
    # computed through v = 1/u — in-region |u| = |t|^2 >= 15, so
    # |v| <= 1/15 and every intermediate stays bounded:
    #     w = t (1.410474 v^2 + 0.5641896 v) / (1 + 3 v + 0.75 v^2).
    # The direct form squares u, which overflows float32 once |x| >~ 6e4;
    # masked padding lanes reach |x| ~ 1e8+, and inf * 0 from the
    # overflow poisons the BACKWARD pass with NaN even though the masked
    # primal is fine (retrieval gradients; VERDICT r3 item 1).
    u2r, u2i = m(in2, ur, 16.0), m(in2, ui, 0.0)
    t2r, t2i = m(in2, tr, 1.0), m(in2, ti, 0.0)
    uinv = 1.0 / (u2r * u2r + u2i * u2i)
    vr, vi = u2r * uinv, -u2i * uinv
    v2r, v2i = cmul(vr, vi, vr, vi)
    n2r, n2i = cmul(t2r, t2i,
                    1.410474 * v2r + 0.5641896 * vr,
                    1.410474 * v2i + 0.5641896 * vi)
    d2r = 1.0 + 3.0 * vr + 0.75 * v2r
    d2i = 3.0 * vi + 0.75 * v2i

    # Region III: degree-4 / degree-5 rational in t:
    t3r, t3i = m(in3, tr, 1.0), m(in3, ti, 0.0)
    n3r, n3i = horner(t3r, t3i,
                      [16.4955, 20.20933, 11.96482, 3.778987, 0.5642236])
    d3r, d3i = horner(t3r, t3i,
                      [16.4955, 38.82363, 39.27121, 21.69274, 6.699398, 1.0])

    # Region IV: w = exp(u) - t * P(u)/Q(u)  (alternating-sign polys in u):
    u4r, u4i = m(in4, ur, -1.0), m(in4, ui, 0.0)
    t4r, t4i = m(in4, tr, 1.0), m(in4, ti, 0.0)
    pc = [36183.31, -3321.9905, 1540.787, -219.0313, 35.76683,
          -1.320522, 0.56419]
    qc = [32066.6, -24322.84, 9022.228, -2186.181, 364.2191,
          -61.57037, 1.841439, -1.0]
    p4r, p4i = horner(u4r, u4i, pc)
    q4r, q4i = horner(u4r, u4i, qc)
    n4r, n4i = cmul(t4r, t4i, p4r, p4i)
    # exp(u) = exp(ur) (cos ui + i sin ui); in-region ur < 0 (y < 0.195|x|):
    eu = jnp.exp(u4r)
    exp_re = eu * jnp.cos(u4i)
    exp_im = eu * jnp.sin(u4i)

    # One shared divide: n/d with n, d selected per lane:
    nr = m(in2, n2r, m(in4, n4r, n3r))
    ni = m(in2, n2i, m(in4, n4i, n3i))
    dr = m(in2, d2r, m(in4, q4r, d3r))
    di = m(in2, d2i, m(in4, q4i, d3i))
    dinv = 1.0 / (dr * dr + di * di)
    re = (nr * dr + ni * di) * dinv
    im = (ni * dr - nr * di) * dinv
    wr = jnp.where(in4, exp_re - re, re)
    wi = jnp.where(in4, exp_im - im, im)
    return wr, wi


def _reduce_to(g, shape):
    """Sum a broadcast gradient back down to an input's shape."""
    shape = tuple(shape)
    if g.shape == shape:
        return g
    nd = g.ndim - len(shape)
    if nd:
        g = g.sum(axis=tuple(range(nd)))
    ax = tuple(i for i, s in enumerate(shape)
               if s == 1 and g.shape[i] != 1)
    if ax:
        g = g.sum(axis=ax, keepdims=True)
    return g


@jax.custom_vjp
def voigt_k_humlicek(x, y):
    """K(x,y) = sqrt(ln2/pi) Re[w(x+iy)] via the Humlicek (1982) w4
    rational approximation — branch-free, restructured for the VPU:

      * region I (s >= 15), an asymptotic *shortcut* of region II in the
        scalar original, is folded into region II (whose rational is valid
        on all of s >= 5.5) — on SIMD hardware computing both is pure waste;
      * the three remaining regions' complex rationals n/d share a
        single real divide (numerator/denominator selected per lane), the
        most expensive VPU op in the kernel.

    Real-pair complex arithmetic throughout (complex dtypes don't compile
    on this TPU backend).  ~10x cheaper than the Pierluisi power series of
    :func:`voigt_k` (relative accuracy ~1e-4, ample for float32); used by
    the fast production path.  voigt_k remains the reference-faithful
    kernel (pu/src/voigt.c:132-200).

    Reverse-mode gradients come from the Faddeeva derivative identity
    w'(z) = -2 z w(z) + 2i/sqrt(pi) (custom VJP): ~10 flops from the
    already-computed (Re w, Im w) instead of differentiating through
    the rational chains — and it is the derivative of the TRUE Voigt
    function to the approximation's own accuracy.  Forward-mode (jvp)
    is not defined.
    """
    return SQRTLN2PI * _humlicek_w(x, y)[0]


def _vkh_fwd(x, y):
    wr, wi = _humlicek_w(x, y)
    return SQRTLN2PI * wr, (jnp.asarray(x), jnp.asarray(y), wr, wi)


def _vkh_bwd(res, ct):
    x, y, wr, wi = res
    xb = jnp.broadcast_to(x.astype(wr.dtype), wr.shape)
    yb = jnp.broadcast_to(y.astype(wr.dtype), wr.shape)
    # dK/dx = C Re w' = -2C (x wr - y wi);
    # dK/dy = C Re(i w') = 2C (x wi + y wr) - 2C/sqrt(pi):
    gx = ct * (SQRTLN2PI * -2.0) * (xb * wr - yb * wi)
    gy = ct * (SQRTLN2PI * 2.0 * (xb * wi + yb * wr) -
               SQRTLN2PI * TWOOSQRTPI)
    return _reduce_to(gx, x.shape), _reduce_to(gy, y.shape)


voigt_k_humlicek.defvjp(_vkh_fwd, _vkh_bwd)


def _humlicek_w_r2(x, y):
    """Region II of the w4 pair alone (see voigt_k_humlicek_r2)."""
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    dtype = jnp.result_type(x, y)
    x = x.astype(dtype)
    y = jnp.broadcast_to(y.astype(dtype), x.shape)

    # Same v = 1/u form as the full kernel's region II (|u| >= 15 when
    # s >= 5.5): the direct u^2 form overflows float32 for |x| >~ 6e4
    # and NaNs the backward pass through masked far/padding lanes.
    # |u|^2 is floored away from zero: far-tile PADDING lanes (clipped
    # duplicate lines that can sit on top of a bin) reach s ~ 1e-8
    # where |t|^4 underflows to 0 and 1/0 * 0 NaNs even the primal —
    # those lanes are zero-weighted, they just must stay finite.  Valid
    # lanes have |u|^2 >= 900, so flooring at 1 never touches them —
    # and it also bounds |v| <= |u| <= 1 on junk lanes, keeping the
    # downstream rational finite too:
    tr, ti = y, -x
    ur = (y - x) * (y + x)
    ui = -2.0 * x * y
    uinv = 1.0 / jnp.maximum(ur * ur + ui * ui,
                             jnp.asarray(1.0, dtype))
    vr, vi = ur * uinv, -ui * uinv
    v2r = vr * vr - vi * vi
    v2i = 2.0 * vr * vi
    cr = 1.410474 * v2r + 0.5641896 * vr
    ci = 1.410474 * v2i + 0.5641896 * vi
    nr = tr * cr - ti * ci
    ni = tr * ci + ti * cr
    dr = 1.0 + 3.0 * vr + 0.75 * v2r
    di = 3.0 * vi + 0.75 * v2i
    dinv = 1.0 / (dr * dr + di * di)
    return ((nr * dr + ni * di) * dinv,
            (ni * dr - nr * di) * dinv)


@jax.custom_vjp
def voigt_k_humlicek_r2(x, y):
    """Region II of :func:`voigt_k_humlicek` alone: the |t| >= 5.5
    asymptotic rational w = t (1.410474 + 0.5641896 u) / (0.75 + u (3 + u)),
    u = t^2, t = y - ix.

    Valid (and bit-identical to the full kernel, which selects this same
    branch) whenever s = |x| + y >= 5.5.  The fast extinction path uses it
    for *far* lines — lines whose center is farther from every bin of a
    tile than the host-computed margin 5.5/sqrt(ln2) * alphaD_max — where
    computing regions III/IV (two degree-5..7 complex Horner chains plus
    exp/cos) only to mask them out is ~4x wasted VPU work.  Gradients
    via the same Faddeeva-identity custom VJP as the full kernel.
    """
    return SQRTLN2PI * _humlicek_w_r2(x, y)[0]


def _vkh2_fwd(x, y):
    wr, wi = _humlicek_w_r2(x, y)
    return SQRTLN2PI * wr, (jnp.asarray(x), jnp.asarray(y), wr, wi)


voigt_k_humlicek_r2.defvjp(_vkh2_fwd, _vkh_bwd)


def _w_asym2(x, y):
    """Two-term asymptotic (Laurent) Faddeeva pair:
    w(z) ~ (i/sqrt(pi)) (1/z + 1/(2 z^3)),  z = x + i y.

    The next term is 3/(4 z^4) of the leading one, so the relative
    error is <= 3/(4 |z|^4): below 5e-5 for |z| >= 11 — the regime of
    the outer far-wing distance shells, where the region-II rational's
    two divides and ~34 flops are overkill (this needs one divide and
    ~16 flops).  |z|^2 is floored at 1 for the same reason as the
    region-II kernel: zero-weighted padding lanes may sit on a bin
    (x ~ y ~ 0) and must stay finite; valid lanes have |z|^2 >= 121.
    """
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    dtype = jnp.result_type(x, y)
    x = x.astype(dtype)
    y = jnp.broadcast_to(y.astype(dtype), x.shape)
    r2 = jnp.maximum(x * x + y * y, jnp.asarray(1.0, dtype))
    rinv = 1.0 / r2
    ur = x * rinv                 # 1/z = (x - i y)/|z|^2
    ui = -y * rinv
    u2r = ur * ur - ui * ui
    u2i = 2.0 * ur * ui
    fr = ur * (1.0 + 0.5 * u2r) - 0.5 * ui * u2i
    fi = ui * (1.0 + 0.5 * u2r) + 0.5 * ur * u2i
    # w = (i/sqrt(pi)) f  ->  Re w = -fi/sqrt(pi), Im w = fr/sqrt(pi):
    inv_sqrtpi = 0.5 * TWOOSQRTPI
    return -fi * inv_sqrtpi, fr * inv_sqrtpi


@jax.custom_vjp
def voigt_k_asym2(x, y):
    """K(x,y) from the two-term asymptotic Faddeeva pair (_w_asym2);
    used by the outermost far-wing shells (|z| >= 11, relative error
    <= 5e-5 — below the shells' own decimation budget).  Gradients via
    the same Faddeeva-identity custom VJP as the full kernel."""
    return SQRTLN2PI * _w_asym2(x, y)[0]


def _vka_fwd(x, y):
    wr, wi = _w_asym2(x, y)
    return SQRTLN2PI * wr, (jnp.asarray(x), jnp.asarray(y), wr, wi)


voigt_k_asym2.defvjp(_vka_fwd, _vkh_bwd)


def voigt_profile(wn, wn0, alphaL, alphaD):
    """Pointwise area-normalized Voigt profile, reference voigtf (voigt.c:205-227)."""
    y = SQRTLN2 * alphaL / alphaD
    x = SQRTLN2 * jnp.abs(wn - wn0) / alphaD
    return voigt_k(x, y) / alphaD


# ----------------------------------------------------------------------------
# Bin-averaged profiles (voigtn semantics)
# ----------------------------------------------------------------------------

def _voigtn_plan(nwn: int, dwn_half: float, alphaD: float, quick: bool):
    """Fine-grid sizing of voigtn (voigt.c:399-433).  Host-side, static.

    Returns (nint, dint, center) with the profile center expressed as a fine
    grid index: dint*i - dwn_half == (i - center)*dint.  In the coarse branch
    dint = 2*dwn_half/(nwn-1) so the center sits at (nwn-1)/2; in the
    sub-sampled branch dint = 2*dwn_half/(nint-1) puts it at (nint-1)/2.
    """
    ddwn = 2.0 * dwn_half / (nwn - 1)
    nint = 50
    dint = alphaD / (nint - 1)
    if ddwn < dint or quick:
        dint = ddwn
        nint = nwn + 1
        center = (nwn - 1) / 2.0
    else:
        nint = int(ddwn / dint) + 1
        if nint & 1:
            nint += 1
        nint = nwn * nint + 1
        dint = 2.0 * dwn_half / (nint - 1)
        center = (nint - 1) / 2.0
    return nint, dint, center


@functools.partial(jax.jit, static_argnames=("npad",))
def _fine_eval(npad, center, dint, alphaL, alphaD):
    """Evaluate the fine-sampled Voigt on i = 0..npad-1 (padded).

    The distance from the profile center is computed as (i - center)*dint —
    algebraically identical to the reference's dint*i - dwn_half
    (voigt.c:449) but free of cancellation, which keeps float32 evaluation
    accurate on TPU.
    """
    dtype = jnp.result_type(dint, alphaL, alphaD)
    i = jnp.arange(npad, dtype=dtype)
    d = i - center
    x = SQRTLN2 * jnp.abs(d) * dint / alphaD
    y = SQRTLN2 * alphaL / alphaD
    return voigt_k(x, y) / alphaD


def _bucket(n: int) -> int:
    """Round up to limit jit recompiles across profile shapes."""
    b = 1024
    while b < n:
        b *= 2
    return b


def bin_averaged_profile(nwn: int, dwn_half: float, alphaL: float,
                         alphaD: float, quick: bool = False) -> np.ndarray:
    """Bin-averaged Voigt profile, float32, exactly following voigtn
    (voigt.c:369-483) with eps=-1 (fixed iteration counts).

    Bins take the value of the *lower-edge-anchored* average over one bin
    width; when quick, the lower-edge sample itself (VOIGT_QUICK).
    """
    nint, dint, center = _voigtn_plan(nwn, dwn_half, alphaD, quick)
    npad = _bucket(nint)
    dt = np.float64 if jax.config.jax_enable_x64 else np.float32
    fine64 = _fine_eval(npad, dt(center), dt(dint), dt(alphaL), dt(alphaD))
    fine = np.asarray(fine64, dtype=np.float32)[:nint]

    if quick:
        return fine[:nwn]

    ipo = int(float(nint - 1) / nwn) + 1   # fine samples per bin, +1 shared
    step = ipo - 1
    assert step * nwn == nint - 1, (nint, nwn, ipo)
    # seg[k] = fine[k*step : k*step + step + 1]
    body = fine[:-1].reshape(nwn, step).astype(np.float32)
    ends = fine[step::step]
    if ipo & 1:  # odd sample count per bin -> Simpson (meanintegSimp)
        s_odd = body[:, 1::2].sum(axis=1, dtype=np.float32)
        s_even = body[:, 2::2].sum(axis=1, dtype=np.float32)
        out = ((s_odd * np.float32(2.0) + s_even) * np.float32(2.0)
               + body[:, 0] + ends) / np.float32(step * 3.0)
    else:        # trapezoid (meanintegTrap)
        mid = body[:, 1:].sum(axis=1, dtype=np.float32)
        out = (mid + (body[:, 0] + ends) / np.float32(2.0)) / np.float32(step)
    return out.astype(np.float32)


@dataclasses.dataclass
class ProfileTable:
    """Grid of bin-averaged Voigt profiles over (Doppler, Lorentz) widths.

    Mirrors calcprofiles (opacity.c:218-277): log-spaced width axes, per-cell
    half-size ``profsize``, profile reuse when aDop*10 < aLor (i != 0), and
    getprofile's size rule (extinction.c:8-57).  Profiles are stored
    concatenated in one flat float32 buffer addressed by ``base``; this is the
    ragged layout the extinction kernels gather from.
    """
    aDop: np.ndarray        # (nDop,) Doppler width samples
    aLor: np.ndarray        # (nLor,) Lorentz width samples
    profsize: np.ndarray    # (nDop, nLor) int64 half sizes
    base: np.ndarray        # (nDop, nLor) int64 offsets into flat
    flat: np.ndarray        # (total,) float32 concatenated profiles

    @property
    def ndop(self):
        return self.aDop.shape[0]

    @property
    def nlor(self):
        return self.aLor.shape[0]


def logspace_ref(vmin: float, vmax: float, n: int) -> np.ndarray:
    """Reference logspace (pu/src/iomisc.c:1064-1083)."""
    logmin = math.log10(vmin)
    logmax = math.log10(vmax)
    logstep = (logmax - logmin) / (n - 1.0)
    return np.array([10.0 ** (logmin + i * logstep) for i in range(n)])


def getprofile_size(dwn: float, dop: float, lor: float, nwidth: float,
                    nwave: int) -> int:
    """Number of profile samples, reference getprofile (extinction.c:8-57)."""
    bigalpha = max(dop, lor)
    wvgt = bigalpha * nwidth
    nvgt = 2 * int(wvgt / dwn + 0.5) + 1
    if nvgt < 2:
        nvgt = 3
    if nvgt > 2 * nwave:
        nvgt = 2 * nwave + 1
    return nvgt


def build_profile_table(dwn: float,         # fine (oversampled) wn spacing
                        nwave: int,         # oversampled wavenumber count
                        nwidth: float,      # wing half-widths (timesalpha)
                        ndop: int = 60, nlor: int = 60,
                        dmin: float = 1e-3, dmax: float = 0.25,
                        lmin: float = 1e-4, lmax: float = 10.0,
                        ) -> ProfileTable:
    """Build the (nDop x nLor) bin-averaged profile table (calcprofiles)."""
    aDop = logspace_ref(dmin, dmax, ndop)
    aLor = logspace_ref(lmin, lmax, nlor)
    profsize = np.zeros((ndop, nlor), dtype=np.int64)
    base = np.zeros((ndop, nlor), dtype=np.int64)
    chunks = []
    offset = 0
    for i in range(ndop):
        for j in range(nlor):
            if aDop[i] * 10.0 < aLor[j] and i != 0:
                profsize[i, j] = profsize[i - 1, j]
                base[i, j] = base[i - 1, j]
                continue
            nvgt = getprofile_size(dwn, aDop[i], aLor[j], nwidth, nwave)
            quick = nvgt > VOIGT_MAXELEMENTS
            prof = bin_averaged_profile(nvgt, dwn * (nvgt // 2),
                                        aLor[j], aDop[i], quick)
            profsize[i, j] = nvgt // 2
            base[i, j] = offset
            chunks.append(prof)
            offset += nvgt
    flat = (np.concatenate(chunks) if chunks
            else np.zeros(0, dtype=np.float32))
    return ProfileTable(aDop=aDop, aLor=aLor, profsize=profsize,
                        base=base, flat=flat)
