"""Collision-induced absorption / cross-section opacity.

Reference: transit/src/crosssec.c:271-428 (interpcs + bicubicinterpolate).
The C code natural-spline interpolates each table first along temperature
(to the layer temperatures) and then along wavenumber (to the transit grid),
zeroing everything outside the tabulated rectangle and clamping negative
interpolants (crosssec.c:328-334).  Densities convert cm-1 amagat^-n to cm-1.

Differentiable: layer temperatures may be traced (retrieval); the source
tables are static.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from transit_tpu.constants import AMU, AMAGAT
from transit_tpu.numerics.spline import (
    spline_second_derivs_np, spline_second_derivs_jnp, spline_eval_jnp)


def interp_cs_one(table_wn: np.ndarray, table_temps: np.ndarray,
                  table_cs: np.ndarray, wns: np.ndarray, temps,
                  zT: np.ndarray = None):
    """Bicubic interpolation of one table onto (wns x temps).

    Returns (nwn, nlayer).  Outside the table rectangle the result is zero
    (no extrapolation; crosssec.c:376-392).  ``temps`` may be traced.
    """
    nwn_src = table_wn.shape[0]
    wns_j = jnp.asarray(wns)
    temps = jnp.asarray(temps)

    # Stage 1 (crosssec.c:407-411): spline along temperature for each source
    # wavenumber row, evaluated at the layer temperatures.  The spline
    # second-derivatives are static (table data):
    if zT is None:
        zT = np.stack([spline_second_derivs_np(table_temps, table_cs[i])
                       for i in range(nwn_src)])
    tw = jnp.asarray(table_temps)
    cs = jnp.asarray(table_cs)
    zT = jnp.asarray(zT)
    f2 = jax.vmap(lambda y, z: spline_eval_jnp(tw, y, z, temps))(cs, zT)
    # f2: (nwn_src, nlayer)

    # Stage 2 (crosssec.c:414-419): spline along source wavenumber for each
    # layer, evaluated at the transit wavenumbers:
    twn = jnp.asarray(table_wn)

    def per_layer(col):
        z2 = spline_second_derivs_jnp(twn, col)
        return spline_eval_jnp(twn, col, z2, wns_j)

    res = jax.vmap(per_layer, in_axes=1, out_axes=1)(f2)  # (nwn, nlayer)

    # Zero outside the table rectangle (fi/li, fj/lj logic):
    wn_in = (wns_j >= table_wn[0]) & (wns_j <= table_wn[-1])
    t_in = (temps >= table_temps[0]) & (temps <= table_temps[-1])
    return res * wn_in[:, None] * t_in[None, :]


def cs_extinction(tables, precomp, wns, temps, densities, mol_mass,
                  species_idx):
    """Total cross-section extinction e_cs (nwn, nlayer), cm-1.

    Args:
      tables: list of CrossSection.
      precomp: list of static zT arrays (from :func:`precompute_cs`).
      temps: (nlayer,) layer temperatures (cgs, possibly traced).
      densities: (nmol, nlayer) mass densities.
      species_idx: list of index-arrays, the atmosphere species of each
        table's 1-2 collision partners.
    """
    nwn = np.shape(wns)[0]
    nl = densities.shape[1]
    total = jnp.zeros((nwn, nl), dtype=densities.dtype)
    for tb, zT, sidx in zip(tables, precomp, species_idx):
        e = interp_cs_one(tb.wn, tb.temps, tb.cs, wns, temps, zT)
        dens = jnp.ones(nl, dtype=densities.dtype)
        for k in sidx:
            dens = dens * densities[k] / (AMU * mol_mass[k] * AMAGAT)
        # Negative-interpolant guard (crosssec.c:328-334):
        total = total + jnp.where(e > 0, e, 0.0) * dens[None, :]
    return total


def precompute_cs(tables):
    """Static temperature-direction spline coefficients per table."""
    out = []
    for tb in tables:
        zT = np.stack([spline_second_derivs_np(tb.temps, tb.cs[i])
                       for i in range(tb.wn.shape[0])])
        out.append(zT)
    return out
