"""Transit (transmission) modulation spectrum.

Reference: transit/src/slantpath.c:274-473 (modulation1 / modulationm1).
The radial integral runs over a per-wavenumber, tau.last-dependent number of
impact-parameter samples; we precompute Simpson weight rows for every
possible count and gather the right row per wavenumber — turning the
data-dependent loop into masked vector ops.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from transit_tpu.numerics.simpson import simpson_weights_np


def modulation_weight_table(ipv_asc: np.ndarray) -> np.ndarray:
    """Wmod[(count), j]: Simpson weights over the ascending impact-parameter
    tail of length ``count`` (positions ipn-count..ipn-1), zero elsewhere.
    modulation1 integrates rinteg over exactly that tail
    (slantpath.c:399-408)."""
    ipn = ipv_asc.shape[0]
    W = np.zeros((ipn + 1, ipn))
    for count in range(2, ipn + 1):
        W[count, ipn - count:] = simpson_weights_np(ipv_asc[ipn - count:])
    return W


def modulation_weight_table_jnp(ipv_asc):
    """Differentiable modulation_weight_table for traced radii."""
    from transit_tpu.numerics.simpson import simpson_weights_jnp
    ipv_asc = jnp.asarray(ipv_asc)
    ipn = ipv_asc.shape[0]

    def row(count):
        # The valid segment is the ascending *tail* of length `count`; roll
        # it to the front for the prefix-masked weight builder, then roll
        # the weights back into place:
        rolled = jnp.roll(ipv_asc, count)
        w = simpson_weights_jnp(rolled, n_valid=count)
        return jnp.roll(w, -count)

    counts = jnp.arange(ipn + 1)
    return jax.vmap(row)(counts)


def modulation(tau, last, ip_v, ip_fct, starrad_cm, toomuch,
               transparent=False, Wmod=None):
    """Modulation spectrum M(wn), modulation1 (slantpath.c:350-436).

    Args:
      tau: (nwn, nip) optical depth, rows over descending impact parameter
        (index 0 = largest b = top).
      ip_v: (nip,) impact parameters, *descending* (reversed radii); may be
        traced if Wmod is supplied (or built with the jnp table).
    """
    nwn, ipn = tau.shape
    ipv_desc = jnp.asarray(ip_v) * ip_fct
    ipv_asc = ipv_desc[::-1]                # ascending, index ipn-1-i
    if Wmod is None:
        Wmod = modulation_weight_table_jnp(ipv_asc)
    Wmod = jnp.asarray(Wmod)
    ipv_asc_j = ipv_asc

    idx = jnp.arange(ipn)
    # rinteg[ipn-1-i] = exp(-tau[i]) * ipv[i] for i <= last, 0 beyond
    # (slantpath.c:374-385):
    rint_desc = jnp.where(idx[None, :] <= last[:, None],
                          jnp.exp(-tau) * ipv_desc[None, :], 0.0)
    rint_asc = rint_desc[:, ::-1]

    # Number of integration samples: last+2 capped at ipn
    # (slantpath.c:381-393: one extra zero row, then count = last+1+1):
    count = jnp.minimum(last + 2, ipn)
    w_rows = Wmod[count]                      # (nwn, ipn)
    integ = jnp.sum(w_rows * rint_asc, axis=1)

    res = ipv_asc[-1] * ipv_asc[-1] - 2.0 * integ
    if transparent:
        # slantpath.c:424-425: subtract the opaque-disc term at the
        # innermost integrated impact parameter:
        maxtau = jnp.take_along_axis(tau, last[:, None], axis=1)[:, 0]
        maxtau = jnp.maximum(maxtau, toomuch)
        inner = ipv_asc_j[ipn - count]
        res = res - jnp.exp(-maxtau) * inner * inner
    return res / (starrad_cm * starrad_cm)


def modulation_m1(tau, last, ip_v, ip_fct, starrad_cm, toomuch):
    """Opaque-disc modulation, modulationm1 (slantpath.c:446-473):
    the radius where tau = toomuch, linearly interpolated, squared over the
    stellar radius.  Returns -1 where toomuch was not reached."""
    nwn, ipn = tau.shape
    ipv = jnp.asarray(ip_v) * ip_fct
    tlast = jnp.take_along_axis(tau, last[:, None], axis=1)[:, 0]
    reached = tlast >= toomuch

    lastp1 = last + 1
    ini = jnp.maximum(lastp1 - 2, 0)
    t0 = jnp.take_along_axis(tau, ini[:, None], axis=1)[:, 0]
    t1 = jnp.take_along_axis(tau, jnp.minimum(ini + 1, ipn - 1)[:, None],
                             axis=1)[:, 0]
    p0 = ipv[ini]
    p1 = ipv[jnp.minimum(ini + 1, ipn - 1)]
    # interp_line(tau+ini, ipv, toomuch) (numerical.c:202-211):
    m = (p1 - p0) / (t1 - t0)
    muchrad = p0 + (toomuch - t0) * m
    res = muchrad * muchrad / (starrad_cm * starrad_cm)
    return jnp.where(reached, res, -1.0)
