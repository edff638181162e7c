"""Non-uniform Simpson integration expressed as weight vectors.

The reference integrates over non-uniform grids with a Simpson scheme built
from interval pair coefficients (reference: pu/src/numerical.c:390-525,
``geth``/``simps``/``simpson``).  The integral is a *linear* functional of the
sampled values, so on TPU we precompute the weight vector w with
``integral = w @ y`` and every path/level integral becomes a dot product or a
matmul that runs on the MXU.

Semantics reproduced exactly:
  * n == 1 -> 0
  * n == 2 -> trapezoid:  h0*(y0+y1)/2
  * n >= 3 -> pairwise Simpson over intervals; when the number of samples is
    even the first interval is handled by a trapezoid and the Simpson pairs
    start at index 1 (numerical.c:413-424,472-480).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def simpson_weights_np(x: np.ndarray) -> np.ndarray:
    """Weight vector w such that w @ y == simps(y) of the reference."""
    x = np.asarray(x, dtype=np.float64)
    n = x.shape[0]
    w = np.zeros(n, dtype=np.float64)
    if n < 2:
        return w
    h = np.diff(x)
    if n == 2:
        w[0] = w[1] = h[0] / 2.0
        return w
    even = int(n % 2 == 0)
    # Simpson pairs: j = 2*i + even, i in [0, (n-1)//2)
    npairs = (n - 1) // 2
    i = np.arange(npairs)
    j = 2 * i + even
    h0 = h[j]
    h1 = h[j + 1]
    hsum = h0 + h1
    hratio = h1 / h0
    hfactor = hsum * hsum / (h0 * h1)
    np.add.at(w, j, (2.0 - hratio) * hsum / 6.0)
    np.add.at(w, j + 1, hfactor * hsum / 6.0)
    np.add.at(w, j + 2, (2.0 - 1.0 / hratio) * hsum / 6.0)
    if even:
        w[0] += h[0] / 2.0
        w[1] += h[0] / 2.0
    return w


def simpson_weights_jnp(x, n_valid=None, n_total=None):
    """JAX version of :func:`simpson_weights_np` with optional masking.

    ``x`` is a padded array of length ``n_total``; only the first ``n_valid``
    entries are meaningful.  Returns a weight vector of length ``n_total``
    with zeros beyond ``n_valid``.  Differentiable w.r.t. ``x``.
    """
    x = jnp.asarray(x)
    n_total = x.shape[0] if n_total is None else n_total
    if n_valid is None:
        n_valid = n_total
    n_valid = jnp.asarray(n_valid, dtype=jnp.int32)

    h = x[1:] - x[:-1]                       # length n_total-1
    even = jnp.where(n_valid % 2 == 0, 1, 0)

    npairs_valid = (n_valid - 1) // 2
    i = jnp.arange((n_total - 1) // 2 + 1)
    j = 2 * i + even
    pair_ok = i < npairs_valid
    jc = jnp.clip(j, 0, n_total - 3)
    h0 = h[jc]
    h1 = h[jc + 1]
    safe_h0 = jnp.where(h0 == 0, 1.0, h0)
    safe_h1 = jnp.where(h1 == 0, 1.0, h1)
    hsum = h0 + h1
    hratio = h1 / safe_h0
    safe_hratio = jnp.where(hratio == 0, 1.0, hratio)
    hfactor = hsum * hsum / (safe_h0 * safe_h1)

    w = jnp.zeros(n_total, dtype=x.dtype)
    z = jnp.where(pair_ok, 1.0, 0.0)
    w = w.at[jc].add(z * (2.0 - hratio) * hsum / 6.0)
    w = w.at[jc + 1].add(z * hfactor * hsum / 6.0)
    w = w.at[jc + 2].add(z * (2.0 - 1.0 / safe_hratio) * hsum / 6.0)

    # n == 2 special case and the even-first-interval trapezoid fix-up:
    trap = jnp.where((n_valid == 2) | ((n_valid > 2) & (even == 1)),
                     h[0] / 2.0, 0.0)
    w = w.at[0].add(trap)
    w = w.at[1].add(trap)
    w = jnp.where(n_valid < 2, jnp.zeros_like(w), w)
    return w


def suffix_simpson_matrix_np(x: np.ndarray) -> np.ndarray:
    """Matrix W with W[s] = Simpson weights of the suffix x[s:] placed at
    global indices (zeros before s).  Used for per-height vertical optical
    depth: tau[s] = W[s] @ y (reference: transit/src/eclipse.c:28-105)."""
    x = np.asarray(x, dtype=np.float64)
    n = x.shape[0]
    W = np.zeros((n, n), dtype=np.float64)
    for s in range(n):
        W[s, s:] = simpson_weights_np(x[s:])
    return W


def trapz_np(x: np.ndarray, y: np.ndarray) -> float:
    """Reference integ_trapz (numerical.c:155-172)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    return 0.5 * float(np.sum((x[1:] - x[:-1]) * (y[1:] + y[:-1])))
