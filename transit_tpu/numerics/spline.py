"""Natural cubic spline matching the reference implementation.

Reference: pu/src/spline.c.  The C code solves the natural-spline tridiagonal
system with the Kincaid & Cheney elimination (spline.c:12-48, ``tri``) and
evaluates with the nested-polynomial form of splinterp_pt (spline.c:131-183).

The numpy path is used for host-side precomputation; the jnp path (a Thomas
solve via lax.scan) is used inside jitted/differentiable code, e.g. partition
functions interpolated to retrieval temperatures.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from transit_tpu.numerics.search import nearest_index_np, nearest_index_jnp


# ----------------------------------------------------------------------------
# numpy (host) path
# ----------------------------------------------------------------------------

def spline_second_derivs_np(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Second derivatives z of the natural cubic spline (spline.c tri())."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    n = x.shape[0]
    z = np.zeros(n, dtype=np.float64)
    if n < 3:
        return z
    h = np.diff(x)
    b = np.diff(y) / h
    u = np.zeros(n - 1)
    v = np.zeros(n - 1)
    u[1] = 2.0 * (h[1] + h[0])
    v[1] = 6.0 * (b[1] - b[0])
    for i in range(2, n - 1):
        u[i] = 2.0 * (h[i] + h[i - 1]) - h[i - 1] * h[i - 1] / u[i - 1]
        v[i] = 6.0 * (b[i] - b[i - 1]) - v[i - 1] * h[i - 1] / u[i - 1]
    for i in range(n - 2, 0, -1):
        z[i] = (v[i] - h[i] * z[i + 1]) / u[i]
    return z


def spline_eval_np(x: np.ndarray, y: np.ndarray, z: np.ndarray, xout):
    """Evaluate the spline at xout (vectorized splinterp_pt, spline.c:131-183)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    xout = np.asarray(xout, dtype=np.float64)
    n = x.shape[0]
    idx = nearest_index_np(x, xout)
    # Enforce x[i] <= xout (except when idx would underflow):
    idx = np.where((idx == n - 1) | (xout < x[idx]), idx - 1, idx)
    idx = np.clip(idx, 0, n - 2)
    x_lo = x[idx]
    h = x[idx + 1] - x_lo
    dy = y[idx + 1] - y[idx]
    dx = xout - x_lo
    a = (z[idx + 1] - z[idx]) / (6.0 * h)
    b = 0.5 * z[idx]
    c = dy / h - h / 6.0 * (z[idx + 1] + 2.0 * z[idx])
    out = y[idx] + dx * (c + dx * (b + dx * a))
    # Exact hit fast-path of the C code (splinterp_pt:169-170):
    exact = x[np.clip(idx, 0, n - 1)] == xout
    out = np.where(exact, y[idx], out)
    return out


def splinterp_np(x, y, xout):
    """Natural-spline interpolation y(xout) from samples (x, y)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    if x.shape[0] < 3:
        # Degenerate: fall back to linear interpolation.
        return np.interp(np.asarray(xout, dtype=np.float64), x, y)
    z = spline_second_derivs_np(x, y)
    return spline_eval_np(x, y, z, xout)


# ----------------------------------------------------------------------------
# jnp (device, differentiable) path
# ----------------------------------------------------------------------------

def spline_second_derivs_jnp(x, y):
    """Same elimination as spline_second_derivs_np, via lax.scan."""
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    n = x.shape[0]
    if n < 3:
        return jnp.zeros_like(y)
    h = x[1:] - x[:-1]
    b = (y[1:] - y[:-1]) / h

    u1 = 2.0 * (h[1] + h[0])
    v1 = 6.0 * (b[1] - b[0])

    def fwd(carry, inp):
        u_prev, v_prev = carry
        h_i, h_im1, db = inp
        u_i = 2.0 * (h_i + h_im1) - h_im1 * h_im1 / u_prev
        v_i = 6.0 * db - v_prev * h_im1 / u_prev
        return (u_i, v_i), (u_i, v_i)

    if n > 3:
        inps = (h[2:n - 1], h[1:n - 2], b[2:n - 1] - b[1:n - 2])
        (_, _), (us, vs) = jax.lax.scan(fwd, (u1, v1), inps)
        u = jnp.concatenate([jnp.array([u1], dtype=x.dtype), us])
        v = jnp.concatenate([jnp.array([v1], dtype=x.dtype), vs])
    else:
        u = jnp.array([u1], dtype=x.dtype)
        v = jnp.array([v1], dtype=x.dtype)

    # Back substitution from i = n-2 down to 1:
    def bwd(z_next, inp):
        v_i, h_i, u_i = inp
        z_i = (v_i - h_i * z_next) / u_i
        return z_i, z_i

    inps = (v[::-1], h[1:n - 1][::-1], u[::-1])
    _, zs_rev = jax.lax.scan(bwd, jnp.asarray(0.0, dtype=x.dtype), inps)
    z_mid = zs_rev[::-1]
    zero = jnp.zeros((1,), dtype=x.dtype)
    return jnp.concatenate([zero, z_mid, zero])


def spline_eval_jnp(x, y, z, xout):
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    xout = jnp.asarray(xout)
    n = x.shape[0]
    idx = nearest_index_jnp(x, xout)
    idx = jnp.where((idx == n - 1) | (xout < x[idx]), idx - 1, idx)
    idx = jnp.clip(idx, 0, n - 2)
    x_lo = x[idx]
    h = x[idx + 1] - x_lo
    dy = y[idx + 1] - y[idx]
    dx = xout - x_lo
    a = (z[idx + 1] - z[idx]) / (6.0 * h)
    b = 0.5 * z[idx]
    c = dy / h - h / 6.0 * (z[idx + 1] + 2.0 * z[idx])
    out = y[idx] + dx * (c + dx * (b + dx * a))
    exact = x[idx] == xout
    return jnp.where(exact, y[idx], out)


def splinterp_jnp(x, y, xout):
    if x.shape[0] < 3:
        return jnp.interp(xout, x, y)
    z = spline_second_derivs_jnp(x, y)
    return spline_eval_jnp(x, y, z, xout)
