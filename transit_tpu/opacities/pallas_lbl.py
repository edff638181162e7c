"""Pallas TPU kernel for the fast extinction path.

Same math as opacities/fast.py (on-the-fly Humlicek Voigt on line tiles) but
scheduled explicitly: the grid runs (wavenumber-tile x layer-tile) kernel
instances; each instance streams its tile's line chunks through VMEM,
fusing line strength, width, and profile evaluation without materializing
any (layer, bin, line) intermediate in HBM.  Per-line isotope parameters
are resolved with a one-hot (niso x chunk) matmul instead of gathers —
niso is tiny, and matmul is what the hardware likes.

Layout: line chunks ride the 128-lane axis; the tile's bins are sublanes;
8 layers per instance.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from transit_tpu.constants import SQRTLN2, SIGCTE, EXPCTE
from transit_tpu.opacities.fast import FastPlan, _layer_widths
from transit_tpu.opacities.voigt import voigt_k_humlicek

LANE = 128
LT = 8          # layers per kernel instance
# Lines per inner-loop step.  KEEP AT 128: a 512-lane variant was tried
# (round 3) and was both ~1.5x slower AND numerically wrong when
# compiled (Mosaic miscompiles the wider dynamic-slice loads; interpret
# mode agreed, hardware did not) — see benchmarks/RESULTS.md.
MAX_CHUNK = LANE


def _kernel(wavn_ref, elow_ref, gf_ref, iso_ref, mask_ref,
            temps_ref, alphal_ref, alphadf_ref, coef0_ref, dens_ref,
            kmax_ref, out_ref, *, tw, tg, lmax, niso, wn_i, dwn,
            ethresh, nwidth, dtype):
    group = pl.program_id(0)

    temps = temps_ref[:]                 # (LT, 1)
    kmax = kmax_ref[:]                   # (LT, 1)
    chunk_w = MAX_CHUNK
    while lmax % chunk_w:
        chunk_w -= LANE
    iso_rows = jax.lax.broadcasted_iota(jnp.int32, (niso, chunk_w), 0)
    nchunks = lmax // chunk_w

    def tile_acc(g, tile, _):
        """Extinction for one tw-bin tile: (LT, tw).  g is a static
        (unrolled) index into this group's block of line rows — Mosaic
        requires static sublane indices for VMEM loads."""
        bin_ids = jax.lax.broadcasted_iota(jnp.int32, (tw, 1), 0)
        wn_col = (wn_i + dwn * (tile * tw) + dwn * bin_ids.astype(dtype))

        def chunk(c, a):
            sl = pl.ds(c * chunk_w, chunk_w)
            wv = wavn_ref[g, sl][None, :]    # (1, chunk_w)
            el = elow_ref[g, sl][None, :]
            gf = gf_ref[g, sl][None, :]
            iso = iso_ref[g, sl][None, :]
            msk = mask_ref[g, sl][None, :] != 0

            onehot = (iso_rows == iso).astype(dtype)      # (niso, LANE)
            aL = jnp.dot(alphal_ref[:], onehot,
                         preferred_element_type=dtype)    # (LT, LANE)
            aDf = jnp.dot(alphadf_ref[:], onehot,
                          preferred_element_type=dtype)
            cf0 = jnp.dot(coef0_ref[:], onehot,
                          preferred_element_type=dtype)
            dens = jnp.dot(dens_ref[:], onehot,
                           preferred_element_type=dtype)

            k0 = (gf * jnp.exp(-EXPCTE * el / temps) *
                  (1.0 - jnp.exp(-EXPCTE * wv / temps)) * cf0)
            keep = msk & (k0 >= ethresh * kmax)
            k = jnp.where(keep, k0 * dens, 0.0)

            aD = aDf * wv
            inv = 1.0 / aD
            y = SQRTLN2 * aL * inv
            dist = jnp.abs(wn_col - wv)                    # (tw, LANE)
            x = SQRTLN2 * dist[None] * inv[:, None, :]     # (LT, tw, LANE)
            prof = voigt_k_humlicek(x, y[:, None, :]) * inv[:, None, :]
            wing = nwidth * jnp.maximum(aD, aL)
            use = dist[None] <= wing[:, None, :]
            val = jnp.sum(jnp.where(use, prof, 0.0) * k[:, None, :],
                          axis=2)                          # (LT, tw)
            return a + val

        return jax.lax.fori_loop(0, nchunks, chunk,
                                 jnp.zeros((LT, tw), dtype=dtype))

    parts = [tile_acc(g, group * tg + g, None) for g in range(tg)]
    out_ref[:] = jnp.concatenate(parts, axis=1)


def pallas_extinction(plan: FastPlan, d, temps, densities, Z,
                      mol_mass, mol_radius, wn_i: float, dwn: float,
                      ethresh: float, nwidth: float,
                      interpret: bool = False):
    """Extinction (nlayer, n_coarse), Pallas-scheduled fast path.

    Same arguments as fast.fast_extinction; layer count is padded to a
    multiple of 8 internally.
    """
    dtype = d["wavn"].dtype
    temps = jnp.asarray(temps, dtype=dtype)
    densities = jnp.asarray(densities, dtype=dtype)
    Z = jnp.asarray(Z, dtype=dtype)
    nlayer = temps.shape[0]
    niso = int(d["iso_mass"].shape[0])
    niso_pad = max(8, -(-niso // 8) * 8)

    alphal, alphad_f = jax.vmap(
        lambda t, dens: _layer_widths(t, dens, d["iso_mass"], d["iso_imol"],
                                      mol_mass, mol_radius),
        in_axes=(0, 1))(temps, densities)               # (nl, niso)

    coef0 = (SIGCTE * d["iso_ratio"][None, :] /
             (d["iso_mass"][None, :] * Z.T))            # (nl, niso)
    densm = densities[d["iso_imol"], :].T               # (nl, niso)

    # kmax per layer (species-collapsed, extinction.c:400-427):
    line_iso = d["all_iso"]
    s_all = (d["all_gf"][None, :] *
             jnp.exp(-EXPCTE * d["all_elow"][None, :] / temps[:, None]) *
             (1.0 - jnp.exp(-EXPCTE * d["all_wavn"][None, :] /
                            temps[:, None])))
    kmax = jnp.max(s_all * coef0[:, line_iso], axis=1)  # (nl,)

    # Pad layers to LT and isotopes to niso_pad:
    nl_pad = -(-nlayer // LT) * LT
    def padl(a):
        return jnp.pad(a, ((0, nl_pad - nlayer), (0, niso_pad - niso)))
    alphal_p = padl(alphal).at[:, niso:].set(1.0).at[nlayer:, :].set(1.0)
    alphadf_p = padl(alphad_f).at[:, niso:].set(1.0).at[nlayer:, :].set(1.0)
    coef0_p = padl(coef0)
    densm_p = padl(densm)
    temps_p = jnp.pad(temps, (0, nl_pad - nlayer),
                      constant_values=1000.0)[:, None]
    kmax_p = jnp.pad(kmax, (0, nl_pad - nlayer),
                     constant_values=jnp.inf)[:, None]

    tw = plan.tw
    lmax = plan.lmax
    # Tile groups: the output block's lane dim must be a multiple of 128
    # and the line-tensor block's sublane dim a multiple of 8, so each
    # kernel instance handles tg = max(8, 128/tw) tiles:
    tg = max(8, LANE // tw)
    ntp = -(-plan.ntiles // tg) * tg           # padded tile count
    pad_t = ntp - plan.ntiles

    def padt(a, fill=0):
        return jnp.pad(a, ((0, pad_t), (0, 0)), constant_values=fill)

    wavn_t = padt(d["wavn"], 1.0)
    elow_t = padt(d["elow"], 1e30)
    gf_t = padt(d["gf"])
    iso_t = padt(d["iso"])
    mask_t = padt(d["mask"].astype(jnp.int32))

    grid = (ntp // tg, nl_pad // LT)
    kern = functools.partial(_kernel, tw=tw, tg=tg, lmax=lmax,
                             niso=niso_pad, wn_i=wn_i, dwn=dwn,
                             ethresh=ethresh, nwidth=nwidth, dtype=dtype)

    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            # One group (tg tiles) of line rows per instance; the kernel
            # indexes rows with the static unrolled index g:
            pl.BlockSpec((tg, lmax), lambda t, l: (t, 0)),  # wavn
            pl.BlockSpec((tg, lmax), lambda t, l: (t, 0)),  # elow
            pl.BlockSpec((tg, lmax), lambda t, l: (t, 0)),  # gf
            pl.BlockSpec((tg, lmax), lambda t, l: (t, 0)),  # iso
            pl.BlockSpec((tg, lmax), lambda t, l: (t, 0)),  # mask
            pl.BlockSpec((LT, 1), lambda t, l: (l, 0)),       # temps
            pl.BlockSpec((LT, niso_pad), lambda t, l: (l, 0)),  # alphal
            pl.BlockSpec((LT, niso_pad), lambda t, l: (l, 0)),  # alphad_f
            pl.BlockSpec((LT, niso_pad), lambda t, l: (l, 0)),  # coef0
            pl.BlockSpec((LT, niso_pad), lambda t, l: (l, 0)),  # dens
            pl.BlockSpec((LT, 1), lambda t, l: (l, 0)),       # kmax
        ],
        out_specs=pl.BlockSpec((LT, tg * tw), lambda t, l: (l, t)),
        out_shape=jax.ShapeDtypeStruct((nl_pad, ntp * tw), dtype),
        interpret=interpret,
    )(wavn_t, elow_t, gf_t, iso_t, mask_t,
      temps_p, alphal_p, alphadf_p, coef0_p, densm_p, kmax_p)

    return out[:nlayer, :plan.n_coarse]
