"""Fast TPU extinction path: on-the-fly Voigt, tile-bucketed lines.

The exact path (opacities/lbl.py) replicates the reference's precomputed
profile-table scheme, whose random-offset gathers are hostile to TPU.  This
module instead evaluates the Voigt function *directly* per (layer, line,
wavenumber) on dense tiles:

  * the coarse wavenumber axis is split into tiles of TW bins;
  * lines are bucketed to every tile their wings can reach (host-side,
    contiguous slices of the wavenumber-sorted line list — the duplication
    factor is ~(2*halo+TW)/TW);
  * each tile evaluates strength x Voigt for a (layers, lines, TW) block and
    reduces over lines — pure VPU elementwise math, zero gathers, and the
    line chunks stream through VMEM.

Physics differences vs the reference (documented, all accuracy-improving):
  * no (nDop x nLor) width quantization — every line uses its true widths;
  * no per-fine-bin averaging — point evaluation at bin centers;
  * wings cut at nwidth*max(alphaD, alphaL) with the true widths.
The reference's ethresh weak-line drop is reproduced (as a mask) so both
paths model the same physics.

Reference for the computed quantities: transit/src/extinction.c:281-529.
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np
import jax
import jax.numpy as jnp

from transit_tpu.constants import SQRTLN2, SIGCTE, EXPCTE, KB, AMU, LS, PI
from transit_tpu.opacities.voigt import (voigt_k, voigt_k_humlicek,
                                         voigt_k_humlicek_r2,
                                         voigt_k_asym2,
                                         _humlicek_w, _humlicek_w_r2,
                                         _w_asym2,
                                         SQRTLN2PI, TWOOSQRTPI)

# Far-line margin: region II of the Humlicek w4 kernel is selected when
# s = |x| + y >= 5.5, i.e. at distances >= 5.5/sqrt(ln2) Doppler widths
# from the line center irrespective of y.  Lines farther than
# R2_MARGIN * alphaD_max from every bin of a tile can therefore be
# evaluated with the region-II rational alone (bit-identical result,
# ~4x less VPU work); 1.02 is a safety factor on the host width bound.
R2_MARGIN = 1.02 * 5.5 / float(SQRTLN2)

# Far-wing decimation (see make_banded_plans split_far/decimate): a line
# at distance >= FAR_FACTOR * s bins from every evaluation point may be
# evaluated on a stride-s decimated bin grid and Catmull-Rom-interpolated
# back up.  The summed wing field of region-II lines decays like a
# Lorentzian ~1/d^2, whose cubic-interpolation error at spacing h and
# distance d is ~(h/d)^3: FAR_FACTOR = 24 bounds the per-line relative
# error at ~3e-5 (measured worst case over strides 2-16 on a pure 1/d^2
# wing), far inside the 1e-4 fast-path conformance budget.  The
# reference evaluates these smooth wings at full resolution
# (extinction.c:485-509, voigt.c:182-199 region-II rational per bin).
FAR_FACTOR = 24

# Scaled-distance threshold for the two-term asymptotic Faddeeva kernel
# (voigt.py _w_asym2): shells whose every line sits at x >= X_ASYM from
# every evaluation point use it instead of the region-II rational
# (measured worst-case relative error 2.6e-4 * (11/x)^4 at small y:
# <= 7.5e-5 at x = 15, under the shells' decimation budget):
X_ASYM = 15.0

# Relative per-element kernel costs for the planner's padded-eval cost
# model (make_banded_plans absorption decision).  Calibrated by a paired
# wide-workload A/B: forcing absorption at R2_COST = 0.65 (which trades
# 12.9 G r2 evals for 6.9 G extra w4 evals) measured +21% step time,
# 0/9 pairs — i.e. a whole r2 element costs well under half a w4
# element despite the shared strength/width/mask chains.  0.3 keeps the
# absorption decision conservatively against converting r2 work to w4:
W4_COST = 1.0
R2_COST = 0.3


@dataclasses.dataclass
class FastPlan:
    """Host-side tile bucketing of the (wavenumber-sorted) line list."""
    wavn: np.ndarray        # (nl,) sorted ascending
    isoid: np.ndarray       # (nl,)
    elow: np.ndarray
    gf: np.ndarray
    tile_start: np.ndarray  # (ntiles,) first line index per tile
    tile_count: np.ndarray  # (ntiles,) lines per tile (BOTH ranges)
    lmax: int               # max lines per tile (padded length)
    tw: int                 # tile width in coarse bins
    ntiles: int
    n_coarse: int
    halo_bins: float        # wing reach used for bucketing, in bins
    # Optional tile classes: tiles grouped by line count so sparse tiles
    # don't pay the densest tile's lmax padding.  class_tiles[c] holds the
    # global tile indices of class c, padded to length class_lmax[c]:
    class_tiles: list = None
    class_lmax: list = None
    # Register layout of the tile kernel: "lines" puts the line axis on
    # the 128-lane vector dimension (dense tiles — lmax rounds to 128);
    # "bins" puts the BIN axis on lanes and lines on the 8-wide sublane
    # axis (lmax rounds to 8) — chosen for sparse far shells, whose
    # ~20-40 lines/tile would otherwise pad 3-8x to fill the lanes:
    lanes: str = "lines"
    # Voigt kernel this plan's lines are valid for: "w4" (full Humlicek),
    # "r2" (region-II rational — far shells), or "asym2" (two-term
    # asymptotic — outer shells with x >= X_ASYM everywhere):
    wfn_tag: str = "w4"
    # Decimated-shell line weighting (see _block_lines): band width
    # bounds (aL_max, aDf_max) from which the kernel reconstructs each
    # tile's halo; None = per-layer hard wing cutoff (near/s1 shells):
    line_weight: tuple = None
    # Optional SECOND per-tile line range (far shells bucket the ranges
    # left AND right of the tile's near window into ONE padded tensor —
    # two ~40-line sides each padding to the 128-lane granule would
    # otherwise double the dominant padding floor; see make_banded_plans).
    # tile_count stays the combined count (consumers: tile classes, the
    # sharded path's LPT block costs); tile_count1 is range 1's length:
    tile_start2: np.ndarray = None   # (ntiles,) or None
    tile_count1: np.ndarray = None   # (ntiles,) or None


# Executor-side kernel lookup for far-shell plans:
FAR_KERNELS = {"r2": voigt_k_humlicek_r2, "asym2": voigt_k_asym2,
               "w4": voigt_k_humlicek}


def make_fast_plan(wavn, isoid, elow, gf, wn_i: float, dwn: float,
                   n_coarse: int, max_width: float, nwidth: float,
                   tw: int = None, aL_max: float = None,
                   aDf_max: float = None, classes: bool = False) -> FastPlan:
    """Bucket lines by coarse tile.

    max_width: upper bound on max(alphaD, alphaL) over all layers/isotopes
    (host-computed from the atmosphere); wings reach nwidth*max_width.
    tw: tile width in coarse bins; by default sized near the halo width —
    each line is evaluated over its whole tile, so wasted work scales with
    tw/halo while line duplication scales with halo/tw.

    aL_max/aDf_max: when given, the halo is sized *per tile* as
    nwidth*max(aL_max, aDf_max*wn_tile)/dwn — the Doppler width grows
    linearly with wavenumber, so a wide spectral range (e.g. 1-20 um) gets
    tight halos at its red end instead of the global worst case.
    """
    if tw is None:
        # Tile height: each line in a tile is evaluated over all tw bins,
        # so wasted work ~ (tw + 2*halo)/(2*halo); memory duplication of
        # line data ~ (tw + 2*halo)/tw.  tw ~ halo balances both; the line
        # axis (not tw) is the 128-lane axis, so small tw is fine:
        halo_est = nwidth * max_width / dwn
        tw = int(min(256, max(8, -(-int(halo_est) // 8) * 8)))
    order = np.argsort(wavn, kind="stable")
    wavn = np.asarray(wavn, dtype=np.float64)[order]
    isoid = np.asarray(isoid, dtype=np.int32)[order]
    elow = np.asarray(elow, dtype=np.float64)[order]
    gf = np.asarray(gf, dtype=np.float64)[order]

    ntiles = -(-n_coarse // tw)
    if aL_max is not None and aDf_max is not None:
        wn_hi_tile = wn_i + (np.arange(ntiles) + 1) * tw * dwn
        width_t = np.maximum(aL_max, aDf_max * wn_hi_tile)
        halo = nwidth * width_t / dwn + 1.0            # (ntiles,)
        halo_rep = float(halo.max())
    else:
        halo = nwidth * max_width / dwn + 1.0          # scalar
        halo_rep = float(halo)
    lo = wn_i + (np.arange(ntiles) * tw - halo) * dwn
    hi = wn_i + ((np.arange(ntiles) + 1) * tw + halo) * dwn
    start = np.searchsorted(wavn, lo, side="left")
    end = np.searchsorted(wavn, hi, side="right")
    return _subplan(wavn, isoid, elow, gf, start, end, tw=tw,
                    ntiles=ntiles, n_coarse=n_coarse, halo_rep=halo_rep,
                    classes=classes)


def _tile_classes(count, lmax: int, classes: bool, min_level: int = 128):
    """Group tiles by line count in powers-of-two multiples of
    ``min_level`` (the layout's line-axis register granule); a class is
    only worth a separate kernel if it has enough tiles."""
    ntiles = count.shape[0]
    if not (classes and ntiles > 1 and lmax > min_level):
        return None, None
    cls_of = np.maximum(min_level, 2 ** np.ceil(
        np.log2(np.maximum(count, 1))).astype(np.int64))
    cls_of = np.minimum(cls_of, lmax)
    # Merge classes with <8 tiles into the next-larger level (a tiny
    # class isn't worth its own compiled kernel):
    levels = sorted(set(cls_of.tolist()))
    for i, lv in enumerate(levels[:-1]):
        if (cls_of == lv).sum() < 8:
            cls_of[cls_of == lv] = levels[i + 1]
    class_tiles, class_lmax = [], []
    for lv in sorted(set(cls_of.tolist())):
        idx = np.nonzero(cls_of == lv)[0]
        class_tiles.append(idx.astype(np.int32))
        class_lmax.append(int(lv))
    if len(class_tiles) == 1:
        return None, None
    return class_tiles, class_lmax


def _subplan(wavn, isoid, elow, gf, start, end, tw, ntiles, n_coarse,
             halo_rep, classes, lanes: str = "lines",
             wfn_tag: str = "w4", line_weight: tuple = None,
             start2=None, end2=None):
    """FastPlan over pre-sorted line arrays with explicit per-tile line
    ranges [start, end) (+ an optional second range [start2, end2) —
    the two sides of a far shell share one padded tensor)."""
    count1 = end - start
    count = count1 if start2 is None else count1 + (end2 - start2)
    lmax = int(count.max()) if count.size else 0
    lmax = max(lmax, 1)
    # Round up to the line axis' register granule (lanes or sublanes):
    granule = 128 if lanes == "lines" else 8
    lmax = -(-lmax // granule) * granule
    class_tiles, class_lmax = _tile_classes(count, lmax, classes,
                                            min_level=granule)
    return FastPlan(wavn=wavn, isoid=isoid, elow=elow, gf=gf,
                    tile_start=start.astype(np.int32),
                    tile_count=count.astype(np.int32),
                    lmax=lmax, tw=tw, ntiles=ntiles, n_coarse=n_coarse,
                    halo_bins=halo_rep, class_tiles=class_tiles,
                    class_lmax=class_lmax, lanes=lanes, wfn_tag=wfn_tag,
                    line_weight=line_weight,
                    tile_start2=(None if start2 is None
                                 else start2.astype(np.int32)),
                    tile_count1=(None if start2 is None
                                 else count1.astype(np.int32)))


def _tile_tensors(plan: FastPlan, tiles, lmax, dtype):
    """Padded (len(tiles), lmax) line tensors for the given tile set."""
    nl = plan.wavn.shape[0]
    j = np.arange(lmax)[None, :]
    if plan.tile_start2 is None:
        idx = plan.tile_start[tiles][:, None] + j
    else:
        c1 = plan.tile_count1[tiles][:, None]
        idx = np.where(j < c1, plan.tile_start[tiles][:, None] + j,
                       plan.tile_start2[tiles][:, None] + (j - c1))
    mask = j < plan.tile_count[tiles][:, None]
    idx = np.clip(idx, 0, max(nl - 1, 0))
    return {
        "wavn": jnp.asarray(plan.wavn[idx], dtype=dtype),
        "elow": jnp.asarray(plan.elow[idx], dtype=dtype),
        "gf": jnp.asarray(plan.gf[idx], dtype=dtype),
        "iso": jnp.asarray(plan.isoid[idx], dtype=jnp.int32),
        "mask": jnp.asarray(mask),
    }


def fast_device_arrays(plan: FastPlan, iso, dtype=jnp.float32):
    """Per-tile padded line tensors on device."""
    if plan.class_tiles is not None:
        cls = [_tile_tensors(plan, t, lm, dtype)
               for t, lm in zip(plan.class_tiles, plan.class_lmax)]
        base = {"classes": cls}
    else:
        base = _tile_tensors(plan, np.arange(plan.ntiles), plan.lmax, dtype)
    return {
        **base,
        "iso_mass": jnp.asarray(iso.mass, dtype=dtype),
        "iso_ratio": jnp.asarray(iso.ratio, dtype=dtype),
        "iso_imol": jnp.asarray(iso.imol, dtype=jnp.int32),
        # full (unbucketed) line arrays for the kmax pass:
        "all_wavn": jnp.asarray(plan.wavn, dtype=dtype),
        "all_elow": jnp.asarray(plan.elow, dtype=dtype),
        "all_gf": jnp.asarray(plan.gf, dtype=dtype),
        "all_iso": jnp.asarray(plan.isoid, dtype=jnp.int32),
    }


def _layer_widths(temp, density, iso_mass, iso_imol, mol_mass, mol_radius):
    """Lorentz width and Doppler width factor per isotope
    (extinction.c:364-395)."""
    fdoppler = jnp.sqrt(2.0 * KB * temp / AMU) * SQRTLN2 / LS
    florentz = jnp.sqrt(2.0 * KB * temp / PI / AMU) / (AMU * LS)
    csdiam = mol_radius[None, :] + mol_radius[iso_imol][:, None]
    alphal = florentz * jnp.sum(
        density[None, :] / mol_mass[None, :] * csdiam * csdiam *
        jnp.sqrt(1.0 / iso_mass[:, None] + 1.0 / mol_mass[None, :]), axis=1)
    alphad_f = fdoppler / jnp.sqrt(iso_mass)   # multiply by wavenumber
    return alphal, alphad_f


def fast_extinction(plan: FastPlan, d, temps, densities,
                    Z, mol_mass, mol_radius, wn_i: float, dwn: float,
                    ethresh: float, nwidth: float, line_chunk: int = 512,
                    eval_budget: int = 0, prep=None,
                    voigt_fn=voigt_k_humlicek, kmax_override=None,
                    unit_density: bool = False, stride: int = 1):
    """Extinction (nlayer, n_coarse) for all layers (single device).

    ``prep`` (from :func:`_prep_layers`) may be shared across the near/far
    subplans of a split band — it depends only on the full line list.
    ``kmax_override`` supplies an externally-computed per-layer kmax (the
    multi-host path reduces kmax across wavenumber bands so the ethresh
    cutoff is globally consistent, extinction.c:400-427).
    """
    if prep is None:
        prep = _prep_layers(plan, d, temps, densities, Z, mol_mass,
                            mol_radius, line_chunk,
                            kmax_override=kmax_override,
                            unit_density=unit_density)
    nlayer = prep["temps"].shape[0]
    if plan.class_tiles is None:
        gidx = jnp.arange(plan.ntiles, dtype=jnp.int32)
        dtiles = {k: d[k] for k in ("wavn", "elow", "gf", "iso", "mask")}
        tiles = _run_tiles(plan, d, dtiles, gidx, plan.lmax, prep, wn_i,
                           dwn, ethresh, nwidth, line_chunk,
                           eval_budget=eval_budget, voigt_fn=voigt_fn,
                           stride=stride)
        out = jnp.moveaxis(tiles, 0, 1).reshape(nlayer,
                                                plan.ntiles * plan.tw)
        return out[:, :plan.n_coarse]

    # Per-class execution: each line-count class runs with its own lmax so
    # sparse tiles don't pay the densest tile's padding.
    parts = []
    for ct, lm, dc in zip(plan.class_tiles, plan.class_lmax, d["classes"]):
        gidx = jnp.asarray(ct, dtype=jnp.int32)
        parts.append(_run_tiles(plan, d, dc, gidx, lm, prep, wn_i, dwn,
                                ethresh, nwidth, line_chunk,
                                eval_budget=eval_budget, voigt_fn=voigt_fn,
                                stride=stride))
    tiles = jnp.concatenate(parts, axis=0)       # (ntiles, nlayer, tw)
    order = np.concatenate(plan.class_tiles)
    inv = np.empty_like(order)
    inv[order] = np.arange(order.shape[0])
    tiles = tiles[jnp.asarray(inv)]
    out = jnp.moveaxis(tiles, 0, 1).reshape(nlayer, plan.ntiles * plan.tw)
    return out[:, :plan.n_coarse]


def _prep_layers(plan: FastPlan, d, temps, densities, Z, mol_mass,
                 mol_radius, line_chunk: int, kmax_override=None,
                 unit_density: bool = False):
    """Temperature-dependent per-layer quantities shared by all tiles:
    widths (extinction.c:364-395) and the per-layer kmax line-strength scan
    (species-collapsed mode, extinction.c:400-427 with permol=0).

    ``unit_density`` drops the absorber-density factor from the line
    strength (the opacity-grid permol convention, extinction.c permol=1:
    the grid stores extinction per unit density and interpolmolext
    multiplies the density back at run time) while widths still use the
    real densities."""
    dtype = d["all_wavn"].dtype
    temps = jnp.asarray(temps, dtype=dtype)
    densities = jnp.asarray(densities, dtype=dtype)
    Z = jnp.asarray(Z, dtype=dtype)
    nlayer = temps.shape[0]

    alphal, alphad_f = jax.vmap(
        lambda t, dens: _layer_widths(t, dens, d["iso_mass"], d["iso_imol"],
                                      mol_mass, mol_radius),
        in_axes=(0, 1))(temps, densities)     # (nlayer, niso) each

    # Per-(layer, iso) strength coefficient SIGCTE*ratio/(mass*Z)
    # (extinction.c:413-419) and number density of each isotope's
    # molecule — (niso, nlayer) tables broadcast to lines by unrolled
    # select-sum below (gathers with multi-million-element index arrays
    # are slow on TPU; niso is tiny):
    coef_iso = (SIGCTE * d["iso_ratio"] / d["iso_mass"])[:, None] / Z
    if unit_density:
        dens_iso = jnp.ones((d["iso_mass"].shape[0], nlayer), dtype=dtype)
    else:
        dens_iso = densities[d["iso_imol"], :]          # (niso, nlayer)
    alphal_t = alphal.T                                 # (niso, nlayer)
    alphad_f_t = alphad_f.T
    niso = int(d["iso_mass"].shape[0])

    if kmax_override is not None:
        kmax = jnp.asarray(kmax_override, dtype=dtype)
    else:
        kmax = _kmax_scan(d, temps, coef_iso, line_chunk, niso, dtype)
    return {"temps": temps, "densities": densities, "Z": Z,
            "alphal": alphal, "alphad_f": alphad_f, "kmax": kmax,
            "coef_iso": coef_iso, "dens_iso": dens_iso,
            "alphal_t": alphal_t, "alphad_f_t": alphad_f_t, "niso": niso,
            "dtype": dtype}


def _kmax_scan(d, temps, coef_iso, line_chunk, niso, dtype):
    """Per-layer max line strength over the full (device-local) line list
    (the extinction.c:400-427 pass-1 scan, permol=0)."""
    nlayer = temps.shape[0]

    def kmax_chunk(carry, sl):
        w, e, g, i = sl
        s = (g * jnp.exp(-EXPCTE * e / temps[:, None]) *
             (1.0 - jnp.exp(-EXPCTE * w / temps[:, None])))
        coef = jnp.zeros_like(s)
        for n in range(niso):
            mm = (i == n).astype(dtype)[None, :]
            coef = coef + mm * coef_iso[n][:, None]
        k = s * coef
        return jnp.maximum(carry, jnp.max(k, axis=1)), None

    # Chunk the kmax scan so it runs <= ~16 sequential steps regardless of
    # line count (a 512-line chunk on a 1e6-line list is 2000 dispatches):
    nlines = d["all_wavn"].shape[0]
    kchunk = max(line_chunk, -(-nlines // 16))
    kchunk = -(-kchunk // 128) * 128
    npad = -(-nlines // kchunk) * kchunk
    pad = npad - nlines
    aw = jnp.pad(d["all_wavn"], (0, pad), constant_values=1.0)
    ae = jnp.pad(d["all_elow"], (0, pad), constant_values=1e30)
    ag = jnp.pad(d["all_gf"], (0, pad))
    ai = jnp.pad(d["all_iso"], (0, pad))
    chunks = (aw.reshape(-1, kchunk), ae.reshape(-1, kchunk),
              ag.reshape(-1, kchunk), ai.reshape(-1, kchunk))
    if npad == kchunk:
        kmax, _ = kmax_chunk(jnp.zeros(nlayer, dtype=dtype),
                             tuple(a[0] for a in chunks))
    else:
        kmax, _ = jax.lax.scan(kmax_chunk, jnp.zeros(nlayer, dtype=dtype),
                               chunks)
    return kmax


def line_kmax(d, temps, Z, line_chunk: int = 512):
    """Standalone per-layer kmax for the device/process-local line list.

    The multi-host path computes this per wavenumber band, max-reduces it
    across processes (one tiny DCN collective), and feeds the global
    result back via ``kmax_override`` so every band applies the same
    ethresh cutoff as a single-process run (extinction.c:467-470)."""
    dtype = d["all_wavn"].dtype
    temps = jnp.asarray(temps, dtype=dtype)
    Z = jnp.asarray(Z, dtype=dtype)
    coef_iso = (SIGCTE * d["iso_ratio"] / d["iso_mass"])[:, None] / Z
    niso = int(d["iso_mass"].shape[0])
    return _kmax_scan(d, temps, coef_iso, line_chunk, niso, dtype)


def _cr_weights(stride: int) -> np.ndarray:
    """(4, stride) Catmull-Rom (Keys a=-1/2) interpolation weights for
    in-group offsets r = 0..stride-1 at fractions u = r/stride."""
    u = np.arange(stride) / stride
    return np.stack([-0.5 * u**3 + u**2 - 0.5 * u,
                     1.5 * u**3 - 2.5 * u**2 + 1.0,
                     -1.5 * u**3 + 2.0 * u**2 + 0.5 * u,
                     0.5 * u**3 - 0.5 * u**2])


def _upsample_cr(x, stride: int, tw: int):
    """Catmull-Rom upsample of decimated tile rows (..., tw//stride+3)
    -> (..., tw).  Sample k sits at bin position (k-1)*stride (one
    sample beyond each tile edge), so bin g*stride+r interpolates from
    samples [g, g+1, g+2, g+3]."""
    G = tw // stride
    W = jnp.asarray(_cr_weights(stride), dtype=x.dtype)
    stacked = jnp.stack([x[..., m:m + G] for m in range(4)], axis=-1)
    out = jnp.einsum("...gm,mr->...gr", stacked, W)
    return out.reshape(x.shape[:-1] + (tw,))


# Map from the public Voigt kernels to their raw (Re w, Im w) pair
# implementations, used by the analytic block VJP below:
_RAW_W = {voigt_k_humlicek: _humlicek_w,
          voigt_k_humlicek_r2: _humlicek_w_r2,
          voigt_k_asym2: _w_asym2}

# Global toggle for the analytic block-level VJP (A/B and debugging);
# when False the tile kernel falls back to plain autodiff + remat:
ANALYTIC_VJP = True


def _block_geom(spec, wn_blk, wv):
    """Layout helpers for the element tensor: ``lines`` layout puts the
    line axis last (on the 128 vector lanes) giving elements
    (tb, nl, ne, lc); ``bins`` layout puts the evaluation-bin axis last
    (sparse far shells), elements (tb, nl, lc, ne).  Returns
    (dist_b, xpand, ax_lines, ax_ne): the broadcast distance tensor,
    the expander from line-level (tb, nl, lc) rank to element rank, the
    LINE axis (reduced by the primal, -> (tb, nl, ne)) and the BIN axis
    (reduced by the backward, -> (tb, nl, lc))."""
    bins_on_lanes = spec[5]
    if bins_on_lanes:
        dist = jnp.abs(wn_blk[:, None, :] - wv[:, :, None])  # (tb, lc, ne)
        return dist[:, None], (lambda a: a[:, :, :, None]), 2, 3
    dist = jnp.abs(wn_blk[:, :, None] - wv[:, None, :])      # (tb, ne, lc)
    return dist[:, None], (lambda a: a[:, :, None, :]), 3, 2


def _line_halo_weight(spec, wv, tile_lo):
    """Smooth per-(line, tile) halo weight for decimated shells.

    Decimated shells carry no per-layer wing cutoff — a per-layer step
    (or any narrow ramp) cannot be represented on a decimated grid, and
    interpolating through it costs percent-level artifacts near every
    cutoff.  Instead every line in a decimated shell contributes its
    full smooth wing across the tile, rolled off at the BAND's halo by
    this weight: a smoothstep from 1 at distance 0.875*halo(tile) to 0
    at 1.125*halo(tile), where halo(tile) mirrors the planner's bound
    nwidth*max(aL_max, aDf_max*wn_hi) + dwn.  The weight is constant
    per (line, tile), so the shell field stays exactly as smooth as the
    wings themselves and decimation error is pure interpolation error.
    The physics difference vs the reference-style per-layer cutoff —
    narrower-than-band-max layers keep their wings out to the band halo
    (< 3x their own nwidth bound at band ratio 3) — is of the same
    class as the nwidth truncation itself and is bounded by test
    against the nwidth 20 -> 30 modeling shift."""
    wfn, niso, ethresh, nwidth, lw, bol = spec
    aL_max, aDf_max, tw_wn, dwn = lw
    tile_hi = tile_lo + tw_wn
    halo_t = nwidth * jnp.maximum(aL_max, aDf_max * tile_hi) + dwn
    d_line = jnp.maximum(jnp.maximum(tile_lo[:, None] - wv,
                                     wv - tile_hi[:, None]), 0.0)
    v = jnp.clip((1.125 * halo_t[:, None] - d_line) /
                 (0.25 * halo_t[:, None]), 0.0, 1.0)
    return v * v * (3.0 - 2.0 * v)                       # (tb, lc)


def _block_lines(spec, wv, el, gf_, isof, mf, temps, coef_tab, dens_tab,
                 aL_tab, aDf_tab, kmax, tile_lo):
    """Line-level (tb, nlayer, lc) tensors shared by the primal and the
    analytic backward: strength, iso-table select-sums, ethresh mask,
    widths (extinction.c:364-427 quantities)."""
    wfn, niso, ethresh, nwidth, lw, bol = spec
    dtype = wv.dtype
    t3 = temps[None, :, None]
    e1 = jnp.exp(-EXPCTE * el[:, None, :] / t3)
    e2 = jnp.exp(-EXPCTE * wv[:, None, :] / t3)
    s = gf_[:, None, :] * e1 * (1.0 - e2)
    coef = jnp.zeros_like(s)
    dd = jnp.zeros_like(s)
    aL = jnp.zeros_like(s)
    aDf = jnp.zeros_like(s)
    for n in range(niso):
        mm = (isof == n).astype(dtype)[:, None, :]
        coef = coef + mm * coef_tab[n][None, :, None]
        dd = dd + mm * dens_tab[n][None, :, None]
        aL = aL + mm * aL_tab[n][None, :, None]
        aDf = aDf + mm * aDf_tab[n][None, :, None]
    wl = None
    if lw is not None:
        wl = _line_halo_weight(spec, wv, tile_lo)
        dd = dd * wl[:, None, :]
    k0 = s * coef
    keep = (mf[:, None, :] > 0) & (k0 >= ethresh * kmax[None, :, None])
    kd = jnp.where(keep, k0, 0.0)
    k = kd * dd
    aD = aDf * wv[:, None, :]
    inv_aD = 1.0 / aD
    y = SQRTLN2 * (aL * inv_aD)
    wing = nwidth * jnp.maximum(aD, aL)
    return dict(e1=e1, e2=e2, s=s, coef=coef, dd=dd, aL=aL, aDf=aDf,
                keep=keep, kd=kd, k=k, aD=aD, inv_aD=inv_aD, y=y,
                wing=wing, t3=t3, wl=wl)


def _block_primal(spec, wn_blk, tile_lo, wv, el, gf_, isof, mf, temps,
                  coef_tab, dens_tab, aL_tab, aDf_tab, kmax):
    wfn, niso, ethresh, nwidth, lw, bol = spec
    dtype = wv.dtype
    L = _block_lines(spec, wv, el, gf_, isof, mf, temps, coef_tab,
                     dens_tab, aL_tab, aDf_tab, kmax, tile_lo)
    dist_b, xpand, ax_lines, _ax_ne = _block_geom(spec, wn_blk, wv)
    x = jnp.minimum(SQRTLN2 * dist_b * xpand(L["inv_aD"]),
                    jnp.asarray(1e8, dtype))
    wr, _wi = wfn(x, xpand(L["y"]))
    prof = SQRTLN2PI * wr * xpand(L["inv_aD"])
    if lw is not None:
        # Decimated shell: the smooth per-line halo weight is already
        # folded into k (see _block_lines); no per-layer mask:
        return jnp.sum(prof * xpand(L["k"]), axis=ax_lines)
    use = dist_b <= xpand(L["wing"])
    return jnp.sum(jnp.where(use, prof, 0.0) * xpand(L["k"]),
                   axis=ax_lines)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _block_val(spec, wn_blk, tile_lo, wv, el, gf_, isof, mf, temps,
               coef_tab, dens_tab, aL_tab, aDf_tab, kmax):
    """One line-chunk's extinction contribution (tb, nlayer, n_eval)
    with an ANALYTIC block-level VJP (VERDICT r4 next #2).

    Plain reverse-mode through the tile body either stores the full
    (tb, nl, ne, lc) Voigt evaluation volume (hundreds of GB at batch
    32) or — under jax.checkpoint — replays the forward and then runs
    an autodiff backward that materializes several element-sized
    intermediates in HBM (~9x a forward step end to end).  This VJP
    saves only the chunk INPUTS, recomputes the Voigt values once in
    the backward via the Faddeeva identity w' = -2zw + 2i/sqrt(pi)
    (the same identity the per-kernel custom VJPs use), and emits
    cotangents directly for the small per-(iso, layer) width/strength
    tables and the layer temperatures — one fused element pass, no
    element-sized residuals, no replay.

    spec (static): (raw_w_fn, niso, ethresh, nwidth, line_weight,
    bins_on_lanes).
    """
    return _block_primal(spec, wn_blk, tile_lo, wv, el, gf_, isof, mf,
                         temps, coef_tab, dens_tab, aL_tab, aDf_tab,
                         kmax)


def _block_val_fwd(spec, wn_blk, tile_lo, wv, el, gf_, isof, mf, temps,
                   coef_tab, dens_tab, aL_tab, aDf_tab, kmax):
    val = _block_primal(spec, wn_blk, tile_lo, wv, el, gf_, isof, mf,
                        temps, coef_tab, dens_tab, aL_tab, aDf_tab, kmax)
    return val, (wn_blk, tile_lo, wv, el, gf_, isof, mf, temps, coef_tab,
                 dens_tab, aL_tab, aDf_tab, kmax)


def _block_val_bwd(spec, res, g):
    wfn, niso, ethresh, nwidth, lw, bol = spec
    (wn_blk, tile_lo, wv, el, gf_, isof, mf, temps, coef_tab, dens_tab,
     aL_tab, aDf_tab, kmax) = res
    dtype = wv.dtype
    C = SQRTLN2PI
    L = _block_lines(spec, wv, el, gf_, isof, mf, temps, coef_tab,
                     dens_tab, aL_tab, aDf_tab, kmax, tile_lo)
    dist_b, xpand, _ax_lines, ax_ne = _block_geom(spec, wn_blk, wv)
    inv_aD, y, k, wing, aD, aL = (L["inv_aD"], L["y"], L["k"], L["wing"],
                                  L["aD"], L["aL"])

    x_raw = SQRTLN2 * dist_b * xpand(inv_aD)
    clamp = jnp.asarray(1e8, dtype)
    x = jnp.minimum(x_raw, clamp)
    wr, wi = wfn(x, xpand(y))
    if lw is not None:
        u = jnp.asarray(1.0, dtype)       # line weight lives inside k
    else:
        u = (dist_b <= xpand(wing)).astype(dtype)

    gb = g[:, :, None, :] if bol else g[:, :, :, None]  # match elem rank
    yE = xpand(y) + jnp.zeros_like(x)        # broadcast for the identity
    # Consolidated single-pass backward: with B = gbar*u and the
    # Faddeeva identity dK/dx = -2C (x wr - y wi),
    # dK/dy = 2C (x wi + y wr) - 2C/sqrt(pi), every cotangent reduces
    # to three sums over the bin axis of short (wr, wi, x, y)
    # expressions — one streamed element pass, no element-sized
    # temporaries:
    #   gk      = C inv_aD   * sum B wr
    #   g_invaD = C          * sum B k (wr + x Kx' [unclamped] + y Ky')
    #   gaL     = C sqrt(ln2) inv_aD^2 * sum B k Ky'
    # where Kx' = dKdx/C, Ky' = dKdy/C; the x term is dropped where the
    # overflow clamp froze x (dx/d inv_aD = 0 there):
    B = gb * u
    Bk = B * xpand(k)
    kxp = -2.0 * (x * wr - yE * wi)
    kyp = 2.0 * (x * wi + yE * wr) - TWOOSQRTPI
    red = lambda t: jnp.sum(t, axis=ax_ne)
    gk = (C * inv_aD) * red(B * wr)                       # (tb, nl, lc)
    g_invaD = C * red(Bk * (wr + x * kxp * (x_raw < clamp) + yE * kyp))
    gaL_l = (C * SQRTLN2) * inv_aD * inv_aD * red(Bk * kyp)
    gaD = -g_invaD * inv_aD * inv_aD
    gaDf = gaD * wv[:, None, :]

    # Strength chain k = where(keep, s*coef, 0) * dd  (dd carries the
    # per-line halo weight wl in decimated shells):
    gdd = gk * L["kd"]
    gk0 = jnp.where(L["keep"], gk * L["dd"], 0.0)
    gs = gk0 * L["coef"]
    gcoef_l = gk0 * L["s"]
    # ds/dT = (c2/T^2) gf e1 [el (1 - e2) - wv e2]:
    t3 = L["t3"]
    gT_line = gs * (EXPCTE / (t3 * t3)) * gf_[:, None, :] * L["e1"] * (
        el[:, None, :] * (1.0 - L["e2"]) - wv[:, None, :] * L["e2"])
    gT = jnp.sum(gT_line, axis=(0, 2))                    # (nl,)

    # Per-(iso, layer) table cotangents via the same select masks;
    # dd_eff = (sum_n mm_n dens_tab[n]) * wl, so the dens cotangent
    # carries the extra wl factor:
    def tab_grad(gl):
        return jnp.stack([
            jnp.sum(gl * (isof == n).astype(dtype)[:, None, :],
                    axis=(0, 2)) for n in range(niso)])   # (niso, nl)

    gdd_tab = gdd if L["wl"] is None else gdd * L["wl"][:, None, :]
    z = jnp.zeros_like
    return (z(wn_blk), z(tile_lo), z(wv), z(el), z(gf_), z(isof), z(mf),
            gT, tab_grad(gcoef_l), tab_grad(gdd_tab), tab_grad(gaL_l),
            tab_grad(gaDf), z(kmax))


_block_val.defvjp(_block_val_fwd, _block_val_bwd)


# Per-scan-step Voigt evaluation budget (elements of the fused
# (tile_block, nlayer, tw, line_chunk) tensor).  Sizes the tile blocks so
# few sequential steps remain without risking an oversized intermediate if
# a fusion fails.  Sweepable via fast_extinction(eval_budget=...).
EVAL_BUDGET = 4 << 20


def _run_tiles(plan: FastPlan, d, dtiles, gidx, lmax: int, prep,
               wn_i: float, dwn: float, ethresh: float, nwidth: float,
               line_chunk: int, eval_budget: int = 0,
               voigt_fn=voigt_k_humlicek, stride: int = 1):
    """Extinction tiles (nt, nlayer, tw) for the tile tensors ``dtiles``
    (leading dim nt) whose global tile indices are ``gidx`` (may be
    traced).

    Tiles are processed in *blocks* of TB tiles, each block one dense
    batched evaluation — a sequential per-tile loop (409 tiles on the
    standard workload) costs far more in per-step dispatch than the Voigt
    math itself.  TB is sized so the fused (TB, nlayer, tw, line_chunk)
    evaluation stays within eval_budget elements; the block loop is a
    hand-batched lax.scan (lax.map's batch_size builds scan-of-vmap, which
    stalls this TPU backend's remote compiler).

    ``stride > 1``: far-wing decimation — evaluate on tw//stride + 3
    positions at spacing stride*dwn (one sample beyond each tile edge)
    and Catmull-Rom-upsample to the tw bins; valid only for plans whose
    lines sit >= FAR_FACTOR*stride bins from every evaluation point
    (make_banded_plans shells).
    """
    dtype = prep["dtype"]
    temps, densities, Z = prep["temps"], prep["densities"], prep["Z"]
    alphal, alphad_f, kmax = prep["alphal"], prep["alphad_f"], prep["kmax"]
    nlayer = temps.shape[0]
    tw = plan.tw
    if stride > 1:
        n_eval = tw // stride + 3
        wn_axis = wn_i + dwn * stride * (jnp.arange(n_eval, dtype=dtype)
                                         - 1.0)
    else:
        n_eval = tw
        wn_axis = wn_i + dwn * jnp.arange(tw, dtype=dtype)
    nt = dtiles["wavn"].shape[0]

    # Line-chunk size: largest multiple of the layout granule <=
    # line_chunk dividing lmax (lmax is always a granule multiple).
    # When the layer axis is huge (forward_batch folds a retrieval
    # batch into it), the tile-block budget can no longer throttle via
    # tb (floor 1), so cap the chunk too — keeps one block's working
    # set near the budget instead of B times it:
    granule = 128 if plan.lanes == "lines" else 8
    budget0 = int(eval_budget) if eval_budget else EVAL_BUDGET
    lc_cap = max(granule, budget0 // max(1, int(nlayer) * n_eval))
    lc = granule
    for cand in range(min(line_chunk, lmax, lc_cap), 0, -granule):
        if lmax % cand == 0:
            lc = cand
            break
    nblk = lmax // lc

    # Analytic block-level VJP (see _block_val): available for the
    # production Voigt kernels; other kernels take the generic
    # autodiff-plus-remat path:
    wfn_raw = _RAW_W.get(voigt_fn) if ANALYTIC_VJP else None
    lw = (None if plan.line_weight is None else
          (float(plan.line_weight[0]), float(plan.line_weight[1]),
           float(plan.tw * dwn), float(dwn)))
    spec = (wfn_raw, int(prep["niso"]), float(ethresh), float(nwidth),
            lw, plan.lanes == "bins")

    budget = int(eval_budget) if eval_budget else EVAL_BUDGET
    tb = max(1, min(nt, budget // max(1, nlayer * n_eval * lc)))
    nb = -(-nt // tb)
    pad_t = nb * tb - nt

    def pad_tiles(a, fill=0):
        return jnp.pad(a, ((0, pad_t),) + ((0, 0),) * (a.ndim - 1),
                       constant_values=fill)

    wv_t = pad_tiles(dtiles["wavn"], 1.0)
    el_t = pad_tiles(dtiles["elow"], 1e30)
    gf_t = pad_tiles(dtiles["gf"])
    iso_t = pad_tiles(dtiles["iso"])
    msk_t = pad_tiles(dtiles["mask"])
    gidx_t = jnp.pad(gidx, (0, pad_t), mode="edge")

    def block_fn(sl):
        w, e, g, i, msk, tidx = sl                       # (tb, lmax) / (tb,)
        tile_lo = wn_i + dwn * (tidx.astype(dtype) * tw)       # (tb,)
        wn_blk = wn_axis[None, :] + dwn * (tidx[:, None].astype(dtype) * tw)

        def line_block(acc, sl2):
            wv, el, gf_, iso_, m_ = sl2                  # (tb, lc)
            if wfn_raw is not None:
                # Analytic-VJP path: isotope ids and the pad mask ride
                # as float tensors (zero cotangents); the whole element
                # computation lives inside _block_val:
                val = _block_val(spec, wn_blk, tile_lo, wv, el, gf_,
                                 iso_.astype(dtype), m_.astype(dtype),
                                 temps, prep["coef_iso"],
                                 prep["dens_iso"], prep["alphal_t"],
                                 prep["alphad_f_t"], kmax)
                return acc + val, None
            # Generic autodiff path (same math; remat'd by the caller).
            # Clamp rationale: padding lanes can reach x ~ 4e9
            # (bin-to-dummy-line distance over a minimal Doppler
            # width), where |t|^4 inside the Humlicek rational
            # overflows float32 and NaNs the backward pass; every
            # physically used x is orders of magnitude below 1e8.
            # _block_primal expects a raw (Re w, Im w) pair; adapt the
            # K-returning public kernel (keeps its own custom VJP):
            kfn = lambda xx, yy: (voigt_fn(xx, yy) / SQRTLN2PI, None)
            gspec = (kfn, int(prep["niso"]), float(ethresh),
                     float(nwidth), lw, plan.lanes == "bins")
            val = _block_primal(gspec, wn_blk, tile_lo, wv, el, gf_,
                                iso_.astype(dtype), m_.astype(dtype),
                                temps, prep["coef_iso"],
                                prep["dens_iso"], prep["alphal_t"],
                                prep["alphad_f_t"], kmax)
            return acc + val, None

        sls = (w.reshape(tb, nblk, lc).swapaxes(0, 1),
               e.reshape(tb, nblk, lc).swapaxes(0, 1),
               g.reshape(tb, nblk, lc).swapaxes(0, 1),
               i.reshape(tb, nblk, lc).swapaxes(0, 1),
               msk.reshape(tb, nblk, lc).swapaxes(0, 1))
        acc0 = jnp.zeros((tb, nlayer, n_eval), dtype=dtype)
        if nblk == 1:
            acc, _ = line_block(acc0, tuple(a[0] for a in sls))
        else:
            acc, _ = jax.lax.scan(line_block, acc0, sls)
        return acc

    blocks = (wv_t.reshape(nb, tb, lmax), el_t.reshape(nb, tb, lmax),
              gf_t.reshape(nb, tb, lmax), iso_t.reshape(nb, tb, lmax),
              msk_t.reshape(nb, tb, lmax), gidx_t.reshape(nb, tb))
    # Memory policy for reverse mode: with the analytic block VJP the
    # only backward residuals are the chunk inputs (one extra copy of
    # the line tensors; no element-sized storage, no replay).  The
    # generic autodiff path instead needs jax.checkpoint: without it
    # the backward stores every block's (tb, nl, ne, lc) Voigt
    # intermediates — the FULL eval volume (a vmapped batch-32 gradient
    # asked for 176 GB of HBM); with it the backward recomputes one
    # block at a time for ~1.3x extinction FLOPs:
    block_ck = block_fn if wfn_raw is not None else jax.checkpoint(block_fn)
    if nb == 1:
        out = block_ck(tuple(a[0] for a in blocks))
    else:
        out = jax.lax.map(block_ck, blocks)              # (nb, tb, nl, ne)
        out = out.reshape(nb * tb, nlayer, n_eval)
    out = out[:nt]
    if stride > 1:
        # The true shell field is non-negative; clip any residual
        # interpolation undershoot (pure artifact near cutoff edges):
        out = jnp.maximum(_upsample_cr(out, stride, tw), 0.0)
    return out


def fast_extinction_tiles(plan: FastPlan, d, temps, densities,
                          Z, mol_mass, mol_radius, wn_i: float, dwn: float,
                          ethresh: float, nwidth: float,
                          tile0=0, ntiles: int = None,
                          line_chunk: int = 512, eval_budget: int = 0,
                          prep=None, voigt_fn=voigt_k_humlicek,
                          kmax_override=None, gidx=None,
                          unit_density: bool = False, stride: int = 1):
    """Extinction (nlayer, ntiles*tw) for a device-local tile set.

    ``d`` holds this set's tile tensors (wavn/elow/gf/iso/mask, first dim
    = ntiles) plus the replicated all_*/iso_* arrays.  The set is either
    the contiguous range starting at global tile ``tile0`` or, when
    ``gidx`` (an (ntiles,) int32 array, may be traced) is given, an
    arbitrary per-device tile selection — the line-balanced assignment
    of parallel/sharded.py passes the permuted global tile indices here
    so each tile's wavenumber offset is right while its OUTPUT position
    stays the local slot order.

    temps: (nl,) layer temperatures (cgs); densities (nmol, nl);
    Z (niso, nl) partition functions.
    """
    if ntiles is None:
        ntiles = d["wavn"].shape[0]
    if prep is None:
        prep = _prep_layers(plan, d, temps, densities, Z, mol_mass,
                            mol_radius, line_chunk,
                            kmax_override=kmax_override,
                            unit_density=unit_density)
    nlayer = prep["temps"].shape[0]
    if gidx is None:
        gidx = tile0 + jnp.arange(ntiles, dtype=jnp.int32)
    dtiles = {k: d[k][:ntiles]
              for k in ("wavn", "elow", "gf", "iso", "mask")}
    tiles = _run_tiles(plan, d, dtiles, gidx, plan.lmax, prep, wn_i, dwn,
                       ethresh, nwidth, line_chunk, eval_budget=eval_budget,
                       voigt_fn=voigt_fn, stride=stride)
    # (ntiles, nlayer, tw) -> (nlayer, ntiles*tw)
    return jnp.moveaxis(tiles, 0, 1).reshape(nlayer, ntiles * plan.tw)


@dataclasses.dataclass
class BandedPlan:
    """Layer-banded fast plans.

    The Lorentz width falls ~6 decades from the bottom of a log-pressure
    atmosphere to its top while the Doppler floor is nearly constant, so a
    single global halo (sized by the bottom layer) makes the upper ~85% of
    layers evaluate mostly masked-out wing bins.  Layers are permuted by
    descending width and split into contiguous bands; each band gets its
    own FastPlan whose halo is that band's width bound.  Results are
    identical to the unbanded path (the wing mask always uses the true
    per-layer widths — banding only avoids *evaluating* (line, bin) pairs
    that the mask would zero anyway); on the standard benchmark the Voigt
    work drops ~3x.
    """
    perm: np.ndarray          # (nl,) layer order, widest first
    inv_perm: np.ndarray      # (nl,) inverse permutation
    slices: list              # [(lo, hi)] into perm per band
    plans: list               # FastPlan per band (near plan when split)
    # Far-line split (see R2_MARGIN / FAR_FACTOR): per band, a list of
    # distance SHELLS [(farL|None, farR|None, stride), ...] over the
    # wing-only line ranges left/right of each tile's near window,
    # evaluated with the region-II-only Voigt kernel; shells with
    # stride > 1 evaluate on a decimated bin grid (Catmull-Rom
    # upsampled).  None/empty when the band isn't split; plans[i] then
    # covers only the near window.
    far_plans: list = None    # [[(farL, farR, stride), ...] or None]


def layer_width_bounds(atm, mol, iso_mass, iso_imol=None):
    """Per-layer width bounds from the init atmosphere: (aL_max, aDf_max),
    each (nlayer,); alphaD = aDf * wn (width formulas of
    extinction.c:364-395)."""
    t = atm.temp * atm.tfct
    fdop = np.sqrt(2.0 * KB * t / AMU) * SQRTLN2 / LS
    flor = np.sqrt(2.0 * KB * t / PI / AMU) / (AMU * LS)
    if iso_imol is None:
        iso_imol = np.zeros(iso_mass.shape[0], dtype=int)
    aL = np.zeros(t.shape[0])
    aDf = np.zeros(t.shape[0])
    for mi in range(iso_mass.shape[0]):
        aDf = np.maximum(aDf, fdop / np.sqrt(iso_mass[mi]))
        al = np.zeros_like(t)
        for j in range(len(mol.mass)):
            csd = mol.radius[j] + mol.radius[iso_imol[mi]]
            al += (atm.d[j] / mol.mass[j] * csd * csd *
                   np.sqrt(1.0 / iso_mass[mi] + 1.0 / mol.mass[j]))
        aL = np.maximum(aL, flor * al)
    return aL, aDf


def make_banded_plans(wavn, isoid, elow, gf, wn_i: float, dwn: float,
                      n_coarse: int, aL_layers, aDf_layers, wn_max: float,
                      nwidth: float, max_bands: int = 4,
                      ratio: float = 3.0, tw_scale: float = None,
                      classes: bool = True,
                      split_far: bool = True,
                      far_decimate: bool = True,
                      max_stride: int = 64) -> BandedPlan:
    """Split layers into width bands and build one FastPlan per band.

    aL_layers/aDf_layers: per-layer width bounds (layer_width_bounds).
    A new band starts when the layer width falls below 1/ratio of the
    current band's maximum, up to max_bands bands.

    tw_scale: tile width multiplier over the halo-sized default; None
    (default) picks per band: tw ~ halo for small halos (the TPU sweep
    benchmarks/sweep_tw.py optimum when every bucketed line is near),
    but tw ~ halo/4 once the halo clears the innermost
    distance-shell boundary — there the far
    distance shells carry the wings, the near window only needs to
    cover the region-II margin, and a narrow tile cuts the dominant
    per-line near cost ~ (tw + 2*margin) (measured on the 950k-bin
    wide workload: tw_scale 1.0 -> 0.25 gives 3.99e7 -> 5.59e7
    points*layers/s).

    split_far: per tile, partition the bucketed lines into a *near* window
    (within R2_MARGIN Doppler widths of a tile bin — full Humlicek w4) and
    *far* ranges (wing-only — region-II rational, bit-identical where
    selected, ~4x cheaper).  Worthwhile when the halo is Lorentz-dominated
    (halo >> Doppler margin), i.e. high-pressure bands.

    far_decimate: split the far ranges into geometric distance shells —
    stride-s shell covering distances [FAR_FACTOR*s, FAR_FACTOR*2s) bins
    — each evaluated on an s-decimated bin grid and Catmull-Rom
    upsampled (per-line relative error ~3e-5, see FAR_FACTOR).  This
    turns the O(halo) per-line far-wing cost into O(FAR_FACTOR *
    log2(halo)): the dominant cost of wide fine-resolution workloads
    (e.g. 1-20 um at 0.01 cm-1), where halos reach thousands of bins.
    False = exactness fallback (single full-resolution far shell,
    bit-identical to the unsplit path).
    """
    w = np.maximum(aL_layers, aDf_layers * wn_max)
    perm = np.argsort(-w, kind="stable")
    ws = w[perm]
    slices = []
    lo = 0
    for i in range(1, len(ws) + 1):
        if i == len(ws) or (ws[i] < ws[lo] / ratio and
                            len(slices) < max_bands - 1):
            slices.append((lo, i))
            lo = i
    order = np.argsort(wavn, kind="stable")
    wavn_s = np.asarray(wavn, dtype=np.float64)[order]
    isoid_s = np.asarray(isoid, dtype=np.int32)[order]
    elow_s = np.asarray(elow, dtype=np.float64)[order]
    gf_s = np.asarray(gf, dtype=np.float64)[order]
    plans = []
    far_plans = [] if split_far else None
    for (a, b) in slices:
        sel = perm[a:b]
        halo_est = nwidth * float(w[sel].max()) / dwn
        # Auto tile width: a narrow (halo/4) tile pays off when the
        # distance shells carry the wings AND the region-II margin is
        # itself many bins wide (the near window then shrinks with tw;
        # measured +20% on the 950k-bin wide workload).  On coarse
        # grids the margin is sub-bin and the stride-1 shell dominates
        # regardless of tw — there the sweep optimum tw ~ halo stands
        # (narrow tiles measured -9% on the standard workload):
        margin_est = (R2_MARGIN * float(aDf_layers[sel].max()) *
                      wn_max / dwn)
        scale = (tw_scale if tw_scale
                 else (0.25 if (halo_est >= 2.0 * FAR_FACTOR + 16.0
                                and margin_est >= 8.0)
                       else 1.0))
        # Snap to a power of two so every band's tiles align on a common
        # block size (the sharded path splits the wavenumber axis at
        # max-tw boundaries):
        tw = int(min(512, max(8, 2 ** int(np.ceil(np.log2(
            max(halo_est * scale, 1.0)))))))
        aL_max = float(aL_layers[sel].max())
        aDf_max = float(aDf_layers[sel].max())
        ntiles = -(-n_coarse // tw)
        k = np.arange(ntiles)
        wn_hi_tile = wn_i + (k + 1) * tw * dwn
        width_t = np.maximum(aL_max, aDf_max * wn_hi_tile)
        halo = nwidth * width_t / dwn + 1.0          # (ntiles,) in bins
        lo_full = wn_i + (k * tw - halo) * dwn
        hi_full = wn_i + ((k + 1) * tw + halo) * dwn
        margin = R2_MARGIN * aDf_max * (wn_hi_tile + halo * dwn) + dwn
        do_split = split_far and bool(np.any(halo * dwn > 2.0 * margin))
        if not do_split:
            plans.append(_subplan(
                wavn_s, isoid_s, elow_s, gf_s,
                np.searchsorted(wavn_s, lo_full, side="left"),
                np.searchsorted(wavn_s, hi_full, side="right"),
                tw=tw, ntiles=ntiles, n_coarse=n_coarse,
                halo_rep=float(halo.max()), classes=classes))
            if split_far:
                far_plans.append(None)
            continue
        halo_wn = halo * dwn                              # (ntiles,)
        tile_lo = wn_i + k * tw * dwn
        tile_hi = wn_i + (k + 1) * tw * dwn

        # Distance-shell boundaries (wn units, per tile).  Shell stride s
        # spans [bound(s), bound(2s)); the innermost (stride-1) shell
        # starts at the region-II margin and the outermost ends at the
        # full wing bound.  The margin + s*dwn term keeps the decimated
        # sample one stride beyond each tile edge inside region II:
        def bound(s):
            if s == 1:
                return margin
            return np.minimum(np.maximum(margin + s * dwn,
                                         FAR_FACTOR * s * dwn), halo_wn)

        strides = [1]
        if far_decimate:
            s = 2
            smax = min(max_stride, tw // 4)
            while s <= smax and bool(np.any(bound(s) < halo_wn)):
                strides.append(s)
                s *= 2

        def side_ranges(lo_b, hi_b):
            """Per-tile line ranges of one shell's left and right side."""
            sL0 = np.searchsorted(wavn_s, tile_lo - hi_b, side="left")
            sL1 = np.searchsorted(wavn_s, tile_lo - lo_b, side="left")
            sR0 = np.searchsorted(wavn_s, tile_hi + lo_b, side="right")
            sR1 = np.searchsorted(wavn_s, tile_hi + hi_b, side="right")
            return sL0, sL1, sR0, sR1

        def est_cost(cnt, ne, weight, lanes_choice=None):
            """Padded-eval cost of a plan with per-tile line counts
            ``cnt`` over ``ne`` evaluation bins, mirroring mk_far's
            layout rule; ``weight`` is the kernel's relative per-element
            cost (W4_COST/R2_COST)."""
            mean_c = float(cnt.sum()) / max(len(cnt), 1)
            if lanes_choice is None:
                waste_lines = max(128.0, mean_c) / max(mean_c, 1.0)
                lane_pad = 128.0 * (-(-ne // 128)) / max(ne, 1)
                waste_bins = lane_pad * max(8.0, mean_c) / max(mean_c, 1.0)
                lanes_choice = ("bins" if far_decimate and
                                waste_bins < waste_lines else "lines")
            if lanes_choice == "bins":
                pl = np.maximum(8, -(-cnt // 8) * 8)
                return weight * float(pl.sum()) * 128 * (-(-ne // 128))
            pl = np.maximum(128, -(-cnt // 128) * 128)
            return weight * float(pl.sum()) * ne

        # Near window: by default [tile - margin, tile + margin].  When
        # decimated shells exist, consider ABSORBING the stride-1 shell
        # into the near window: at wide-workload line densities the
        # near window and each stride-1 side hold ~40-60 lines/tile —
        # all below the 128-lane padding granule — so three separate
        # plans pay the ~128-lines-per-point*layer padding floor three
        # times, while one merged w4 window often still fits a single
        # granule (the full w4 kernel is bit-identical to the region-II
        # rational on region-II inputs, so the merge is exact).  Decided
        # per band by the padded-eval cost model with the kernels'
        # relative weights; together with the two-range side merge below
        # this measured -13.3% step time (paired A/B, 9/9) on the
        # 950k-bin wide workload:
        near_b = margin
        absorb = False
        if len(strides) > 1:
            b2 = np.minimum(bound(strides[1]), halo_wn)
            aL0, aL1, aR0, aR1 = side_ranges(margin, b2)
            cnt_s1 = (aL1 - aL0) + (aR1 - aR0)
            n0 = np.searchsorted(wavn_s, tile_lo - margin, side="left")
            n1 = np.searchsorted(wavn_s, tile_hi + margin, side="right")
            merged = est_cost((n1 - n0) + cnt_s1, tw, W4_COST, "lines")
            sep = (est_cost(n1 - n0, tw, W4_COST, "lines") +
                   est_cost(cnt_s1, tw, R2_COST))
            absorb = bool(merged < sep)
            if absorb:
                near_b = b2
        plans.append(_subplan(
            wavn_s, isoid_s, elow_s, gf_s,
            np.searchsorted(wavn_s, tile_lo - near_b, side="left"),
            np.searchsorted(wavn_s, tile_hi + near_b, side="right"),
            tw=tw, ntiles=ntiles, n_coarse=n_coarse,
            halo_rep=float(halo.max()), classes=classes))

        def mk_far(sL0, sL1, sR0, sR1, ne, lo_b, stride_s):
            """Far-shell subplan: BOTH sides of the tile's near window
            share one two-range padded tensor (each ~40-line side alone
            would pad to the full line-axis granule), with a layout
            choice: sparse shells pad 3-8x when lines ride the 128-lane
            axis; putting BINS on lanes and lines on the 8-wide sublane
            axis cuts the padding to the sublane granule.  Pick the
            layout with the smaller estimated register-padding waste.
            Only active with far_decimate (the exactness fallback keeps
            the reference layout and summation order)."""
            cnt = (sL1 - sL0) + (sR1 - sR0)
            mean_c = float(cnt.sum()) / max(len(cnt), 1)
            waste_lines = max(128.0, mean_c) / max(mean_c, 1.0)
            lane_pad = 128.0 * (-(-ne // 128)) / ne
            waste_bins = lane_pad * max(8.0, mean_c) / max(mean_c, 1.0)
            lanes = ("bins" if far_decimate and waste_bins < waste_lines
                     else "lines")
            # Kernel choice: every line of this shell sits at scaled
            # distance >= x_min from every evaluation point (one
            # decimated sample beyond each tile edge); beyond X_ASYM
            # the cheap asymptotic pair replaces the region-II
            # rational.  aD is bounded by the largest line wavenumber
            # the shell can contain:
            aD_hi = aDf_max * (wn_hi_tile + halo_wn)
            x_min = float(np.min(float(SQRTLN2) *
                                 (lo_b - stride_s * dwn) / aD_hi))
            tag = ("asym2" if far_decimate and x_min >= X_ASYM
                   else "r2")
            # Decimated shells use the smooth per-line halo weight in
            # place of the per-layer wing cutoff (_line_halo_weight):
            lwt = ((aL_max, aDf_max) if stride_s > 1 else None)
            return _subplan(wavn_s, isoid_s, elow_s, gf_s, sL0, sL1,
                            tw=tw, ntiles=ntiles, n_coarse=n_coarse,
                            halo_rep=float(halo.max()), classes=classes,
                            lanes=lanes, wfn_tag=tag, line_weight=lwt,
                            start2=sR0, end2=sR1)

        shells = []
        for si, s in enumerate(strides):
            if s == 1 and absorb:
                continue                 # folded into the near window
            lo_b = bound(s) if s > 1 else near_b
            # The outermost decimated shell extends to 1.125*halo: its
            # per-line halo weight ramps over [0.875, 1.125]*halo, so
            # ramp lines must be bucketed (weight-zero beyond):
            if si + 1 < len(strides):
                hi_b = bound(strides[si + 1])
            else:
                hi_b = halo_wn if s == 1 else 1.125 * halo_wn
            ne = tw // s + 3 if s > 1 else tw
            sL0, sL1, sR0, sR1 = side_ranges(lo_b, hi_b)
            if int((sL1 - sL0).max()) > 0 or int((sR1 - sR0).max()) > 0:
                shells.append((mk_far(sL0, sL1, sR0, sR1, ne, lo_b, s),
                               None, s))
        far_plans.append(shells if shells else None)
    inv = np.empty_like(perm)
    inv[perm] = np.arange(len(perm))
    return BandedPlan(perm=perm, inv_perm=inv, slices=slices, plans=plans,
                      far_plans=far_plans)


def _far_tile_tensors(fp: FastPlan, iso, dtype):
    """Tile-tensor subset of fast_device_arrays for a far subplan (the
    all_*/iso_* arrays are shared with the band's near dict)."""
    fd = fast_device_arrays(fp, iso, dtype=dtype)
    return {k: fd[k] for k in
            (("classes",) if fp.class_tiles is not None
             else ("wavn", "elow", "gf", "iso", "mask"))}


def banded_device_arrays(bplan: BandedPlan, iso, dtype=jnp.float32):
    """Per-band device tensors (list parallel to bplan.plans).  When the
    band is far-split, the dict gains a "far" list parallel to the
    band's shells: (tensorsL|None, tensorsR|None) per shell."""
    devs = []
    for i, p in enumerate(bplan.plans):
        d = fast_device_arrays(p, iso, dtype=dtype)
        far = bplan.far_plans[i] if bplan.far_plans is not None else None
        if far:
            d["far"] = [tuple(_far_tile_tensors(fp, iso, dtype)
                              if fp is not None else None
                              for fp in (pL, pR))
                        for (pL, pR, _s) in far]
        devs.append(d)
    return devs


def banded_extinction(bplan: BandedPlan, devs, temps, densities, Z,
                      mol_mass, mol_radius, wn_i: float, dwn: float,
                      ethresh: float, nwidth: float, eval_budget: int = 0,
                      kmax_override=None, far_full_res: bool = False):
    """Extinction (nlayer, n_coarse) via per-band plans; numerically the
    same quantity as fast_extinction (wing masks use true widths, and far
    lines take the region-II branch the full kernel would select).

    Decimated far shells (stride > 1) replace the per-layer wing cutoff
    with a smooth per-(line, tile) halo weight (see _line_halo_weight).
    ``far_full_res=True`` evaluates those shells at FULL resolution with
    the SAME weighting — the reference baseline that isolates the pure
    decimation (interpolation) error for conformance tests."""
    perm = jnp.asarray(bplan.perm)
    rows = []
    for i, ((a, b), plan, d) in enumerate(zip(bplan.slices, bplan.plans,
                                              devs)):
        sel = perm[a:b]
        args = (temps[sel], densities[:, sel], Z[:, sel],
                mol_mass, mol_radius)
        kw = dict(wn_i=wn_i, dwn=dwn, ethresh=ethresh, nwidth=nwidth,
                  eval_budget=eval_budget)
        kov = kmax_override[sel] if kmax_override is not None else None
        far = (bplan.far_plans[i]
               if bplan.far_plans is not None else None)
        if not far:
            rows.append(fast_extinction(plan, d, *args,
                                        kmax_override=kov, **kw))
            continue
        prep = _prep_layers(plan, d, *args, line_chunk=512,
                            kmax_override=kov)
        ex = fast_extinction(plan, d, *args, prep=prep, **kw)
        for (pL, pR, s), (dL, dR) in zip(far, d["far"]):
            for fp, fdt in ((pL, dL), (pR, dR)):
                if fp is None:
                    continue
                fd = dict(d, **fdt)  # shared all_*/iso_* + shell tiles
                ex = ex + fast_extinction(
                    fp, fd, *args, prep=prep,
                    voigt_fn=FAR_KERNELS[fp.wfn_tag],
                    stride=(1 if far_full_res else s), **kw)
        rows.append(ex)
    out = jnp.concatenate(rows, axis=0)          # permuted layer order
    return out[jnp.asarray(bplan.inv_perm)]


def max_width_bound(atm, mol, iso_mass, wn_max: float,
                    iso_imol=None) -> float:
    """Host-side max of max(alphaD, alphaL) over layers/isotopes (the exact
    width formulas of extinction.c:364-395) for tile-halo sizing."""
    t = atm.temp * atm.tfct
    fdop = np.sqrt(2.0 * KB * t / AMU) * SQRTLN2 / LS
    flor = np.sqrt(2.0 * KB * t / PI / AMU) / (AMU * LS)
    amax = 0.0
    if iso_imol is None:
        iso_imol = np.zeros(iso_mass.shape[0], dtype=int)
    for mi in range(iso_mass.shape[0]):
        ad = fdop / np.sqrt(iso_mass[mi]) * wn_max
        amax = max(amax, ad.max())
        al = np.zeros_like(t)
        for j in range(len(mol.mass)):
            csd = mol.radius[j] + mol.radius[iso_imol[mi]]
            al += (atm.d[j] / mol.mass[j] * csd * csd *
                   np.sqrt(1.0 / iso_mass[mi] + 1.0 / mol.mass[j]))
        amax = max(amax, (flor * al).max())
    return float(amax)
