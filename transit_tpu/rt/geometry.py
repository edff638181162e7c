"""Differentiable path-weight construction and hydrostatic radii.

For retrieval, the radius grid changes every step (hydrostatic equilibrium
from the new T/q profiles; reference: transit/src/readatm.c:722-865
reloadatm/radpress), so the path-weight matrices of rt/tau.py must be
rebuilt *inside* the jitted step.  The segment structure (which layer each
ray reaches) is static — impact parameters are the reversed radius grid —
so rows vectorize with masked Simpson weights.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from transit_tpu.constants import KB, AMU
from transit_tpu.numerics.simpson import simpson_weights_jnp


def _parab_coeffs_jnp(x3, xr):
    """Coefficients c with p(xr) = c @ y3, interp_parab
    (numerical.c:182-195).  x3: (..., 3); returns (..., 3)."""
    dx = x3[..., 1] - x3[..., 0]
    x0 = x3[..., 0] / dx
    # Basis y = e_k: my_k = [1, -2, 1]
    # b_k = ([0,-1,1][k] - (x0+1.5)*my_k)/dx
    # c_k = [1,0,0][k] + x0*([3,-4,1][k] + x0*my_k)/2
    my = jnp.stack([jnp.ones_like(dx), -2.0 * jnp.ones_like(dx),
                    jnp.ones_like(dx)], axis=-1)
    b1 = jnp.stack([jnp.zeros_like(dx), -jnp.ones_like(dx),
                    jnp.ones_like(dx)], axis=-1)
    c1 = jnp.stack([3.0 * jnp.ones_like(dx), -4.0 * jnp.ones_like(dx),
                    jnp.ones_like(dx)], axis=-1)
    e0 = jnp.stack([jnp.ones_like(dx), jnp.zeros_like(dx),
                    jnp.zeros_like(dx)], axis=-1)
    a = my / (2.0 * dx * dx)[..., None]
    b = (b1 - (x0 + 1.5)[..., None] * my) / dx[..., None]
    c = e0 + x0[..., None] * (c1 + x0[..., None] * my) / 2.0
    return (xr * xr)[..., None] * a + xr[..., None] * b + c


def _weights_rows(rad, s_of, n):
    """Shared row builder: rows ri = 0..n-1 with segment start
    rs = n-1-ri; s_of(rs, idx) gives the path coordinate of layer idx for a
    ray reaching rs.  Returns W (n, n) on layers."""
    dtype = rad.dtype
    W = jnp.zeros((n, n), dtype=dtype)

    # General rows ri >= 2 (segment length >= 3):
    def general_row(ri):
        rs = n - 1 - ri
        k = jnp.arange(n)
        idx = jnp.clip(rs + k, 0, n - 1)
        s = s_of(rs, idx)
        nseg = ri + 1
        w = simpson_weights_jnp(s, n_valid=nseg)
        p = _parab_coeffs_jnp(rad[jnp.clip(rs, 0, n - 3) +
                                  jnp.arange(3)], rad[rs])
        row = jnp.zeros(n, dtype=dtype).at[idx].add(
            jnp.where(k < nseg, w, 0.0))
        corr = jnp.zeros(n, dtype=dtype).at[rs + jnp.arange(3)].add(
            w[0] * (p - jnp.array([1.0, 0.0, 0.0], dtype=dtype)))
        return row + corr

    ris = jnp.arange(2, n)
    Wg = jax.vmap(general_row)(ris)
    W = W.at[2:].set(Wg)

    # Row ri = 1 (two layers left: parabola over n-3..n-1 + midpoint,
    # slantpath.c:62-74 / eclipse.c:68-80):
    rs = n - 2
    p = _parab_coeffs_jnp(rad[rs - 1:rs + 2], rad[rs])
    mid = (rad[rs] + rad[rs + 1]) / 2.0
    s3 = jnp.stack([s_of_scalar(s_of, rs, rad[rs]),
                    s_of_scalar(s_of, rs, mid),
                    s_of_scalar(s_of, rs, rad[rs + 1])])
    w3 = simpson_weights_jnp(s3)
    C = jnp.zeros((3, n), dtype=dtype)
    C = C.at[0, rs - 1:rs + 2].set(p)
    C = C.at[1, rs - 1:rs + 2].set(p / 2.0)
    C = C.at[1, rs + 1].add(0.5)
    C = C.at[2, rs + 1].set(1.0)
    W = W.at[1].set(w3 @ C)
    return W


def s_of_scalar(s_of, rs, rval):
    return s_of(rs, None, rval)


def eclipse_weights_jnp(rad):
    """Differentiable eclipse_weights (rt/tau.py) for traced radii."""
    rad = jnp.asarray(rad)
    n = rad.shape[0]
    diffs = rad[1:] - rad[:-1]
    cs = jnp.concatenate([jnp.zeros(1, rad.dtype), jnp.cumsum(diffs)])

    def s_of(rs, idx, rval=None):
        if idx is None:
            return rval - rad[rs]
        return cs[idx] - cs[rs]

    return _weights_rows(rad, s_of, n)


def transit_weights_jnp(rad):
    """Differentiable transit_weights for b = reversed radii."""
    rad = jnp.asarray(rad)
    n = rad.shape[0]

    def safe_sqrt(arg):
        # d/dx sqrt at 0 is infinite; the tangent point hits arg == 0
        # exactly, so mask the operand before sqrt to keep gradients finite:
        pos = arg > 0.0
        return jnp.where(pos, jnp.sqrt(jnp.where(pos, arg, 1.0)), 0.0)

    def s_of(rs, idx, rval=None):
        r0 = rad[rs]
        if idx is None:
            return safe_sqrt(rval * rval - r0 * r0)
        return safe_sqrt(rad[idx] ** 2 - r0 * r0)

    return 2.0 * _weights_rows(rad, s_of, n)


def radpress_jnp(g0, p0, r0, temp, mu, pressure, rfct):
    """Hydrostatic radius grid (readatm.c:787-865 radpress).

    pressure: static (nl,) in cgs; temp/mu traced; returns radii in the
    atmosphere file's units (divided by rfct).  i0 (reference-pressure
    layer) is resolved on the host since the pressure grid is static.
    """
    pressure = np.asarray(pressure)
    nl = pressure.shape[0]
    i0 = int(np.argmin(np.abs(pressure - p0)))
    temp = jnp.asarray(temp)
    mu = jnp.asarray(mu)
    dtype = temp.dtype
    kb_amu = KB / AMU

    if pressure[i0] > p0:
        lr = np.log(pressure[i0 + 1] / pressure[i0])
        temp0 = temp[i0] + (temp[i0 + 1] - temp[i0]) / lr * np.log(
            p0 / pressure[i0])
        mu0 = mu[i0] + (mu[i0 + 1] - mu[i0]) / lr * np.log(p0 / pressure[i0])
        rad_i0 = r0 + 0.5 * (temp[i0] / mu[i0] + temp0 / mu0) * (
            kb_amu * np.log(p0 / pressure[i0]) / g0) / rfct
    else:
        lr = np.log(pressure[i0 - 1] / pressure[i0])
        temp0 = temp[i0] + (temp[i0 - 1] - temp[i0]) / lr * np.log(
            p0 / pressure[i0])
        mu0 = mu[i0] + (mu[i0 - 1] - mu[i0]) / lr * np.log(p0 / pressure[i0])
        rad_i0 = r0 - 0.5 * (temp[i0] / mu[i0] + temp0 / mu0) * (
            kb_amu * np.log(pressure[i0] / p0) / g0) / rfct

    g_start = g0 * (r0 / rad_i0) ** 2

    # Downward from i0-1 to 0 (readatm.c:837-842):
    def down(carry, i):
        r_prev, g = carry
        dr = 0.5 * (temp[i] / mu[i] + temp[i + 1] / mu[i + 1]) * (
            kb_amu * jnp.log(pressure_j[i] / pressure_j[i + 1]) / g) / rfct
        r_new = r_prev - dr
        g_new = g * (r_prev / r_new) ** 2
        return (r_new, g_new), r_new

    pressure_j = jnp.asarray(pressure, dtype=dtype)
    if i0 > 0:
        _, r_down = jax.lax.scan(down, (rad_i0, g_start),
                                 jnp.arange(i0 - 1, -1, -1))
    else:
        r_down = jnp.zeros((0,), dtype=dtype)

    # Upward from i0+1 to nl-1 (readatm.c:847-851):
    def up(carry, i):
        r_prev, g = carry
        dr = 0.5 * (temp[i] / mu[i] + temp[i - 1] / mu[i - 1]) * (
            kb_amu * jnp.log(pressure_j[i - 1] / pressure_j[i]) / g) / rfct
        r_new = r_prev + dr
        g_new = g * (r_prev / r_new) ** 2
        return (r_new, g_new), r_new

    if i0 < nl - 1:
        _, r_up = jax.lax.scan(up, (rad_i0, g_start),
                               jnp.arange(i0 + 1, nl))
    else:
        r_up = jnp.zeros((0,), dtype=dtype)

    return jnp.concatenate([r_down[::-1], jnp.reshape(rad_i0, (1,)), r_up])
