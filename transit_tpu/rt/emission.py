"""Eclipse (dayside emission) intensity and flux.

Reference: transit/src/eclipse.c:117-287 (eclipse_intens, flux).
Vectorized over wavenumbers; the reference's per-wavenumber tau.last
early-stop becomes a mask.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from transit_tpu.constants import H, LS, KB, PI, DEGREES


def planck(wn_cgs, temp):
    """B_nu(wavenumber) = 2 h nu^3 c^2 / (exp(h nu c / kB T) - 1),
    erg/s/sr/cm (eclipse.c:149-156)."""
    wn_cgs = jnp.asarray(wn_cgs)
    return (2.0 * H * wn_cgs ** 3 * LS * LS /
            (jnp.exp(H * wn_cgs * LS / (KB * temp)) - 1.0))


def eclipse_intensity(tau, last, wns_cgs, temp_rev, angle_deg):
    """Emergent intensity per wavenumber at one incidence angle.

    Args:
      tau: (nwn, nrad) vertical optical depth, top-down rows.
      last: (nwn,) index where tau first exceeded toomuch.
      temp_rev: (nrad,) layer temperatures from the TOP down
        (temp[rnn-1-i] in eclipse.c:155).
    Returns (nwn,) intensity.
    """
    mu = np.cos(angle_deg * DEGREES)
    return _intensity_mu(tau, last, wns_cgs, temp_rev, mu)


def _intensity_mu(tau, last, wns_cgs, temp_rev, mu):
    """eclipse_intensity with mu = cos(angle) as a (traceable) scalar."""
    nwn, nrad = tau.shape
    dtau = jnp.exp(-tau / mu)                        # (nwn, nrad)
    B = planck(wns_cgs[:, None], temp_rev[None, :])  # (nwn, nrad)

    idx = jnp.arange(nrad)
    # Boundary term B[last] * exp(-tau[last]/mu):
    blast = jnp.take_along_axis(B, last[:, None], axis=1)[:, 0]
    dlast = jnp.take_along_axis(dtau, last[:, None], axis=1)[:, 0]
    # integ_trapz(dtau, B, last+1) with x = dtau (eclipse.c:158-159):
    seg = (dtau[:, 1:] - dtau[:, :-1]) * (B[:, 1:] + B[:, :-1]) * 0.5
    mask = idx[None, 1:] <= last[:, None]
    integral = jnp.sum(jnp.where(mask, seg, 0.0), axis=1)
    return blast * dlast - integral


def eclipse_intensities(tau, last, wns_cgs, temp_rev, angles_deg):
    """All raygrid angles at once: (nangle, nwn) intensity.

    vmap over mu = cos(angle) replaces the reference's per-angle loop
    (eclipse.c:117-143) — one compiled subgraph instead of nangle
    near-identical unrolled copies."""
    mus = jnp.cos(jnp.asarray(np.asarray(angles_deg, dtype=np.float64) *
                              DEGREES, dtype=tau.dtype))
    return jax.vmap(_intensity_mu,
                    in_axes=(None, None, None, None, 0))(
        tau, last, wns_cgs, temp_rev, mus)


def flux(intensities, angles_deg):
    """F = pi * sum_i I_i (sin^2 a_{i+1} - sin^2 a_i) over the area grid
    built from angle midpoints (eclipse.c:242-287)."""
    an = len(angles_deg)
    grid = np.zeros(an + 1)
    grid[0] = 0.0
    grid[an] = 90.0 * DEGREES
    for i in range(1, an):
        grid[i] = (angles_deg[i - 1] + angles_deg[i]) * DEGREES / 2.0
    area = np.sin(grid[1:]) ** 2 - np.sin(grid[:-1]) ** 2
    return PI * jnp.tensordot(jnp.asarray(area), intensities, axes=(0, 0))
