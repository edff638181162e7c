"""Multi-host execution: jax.distributed + per-process wavenumber bands.

The reference's only multi-process feature is a SysV shared-memory segment
for the opacity grid (transit/src/opacity.c:89-201) — N retrieval workers
on one machine sharing one read-only table.  The TPU-native replacement
scales the *compute*: the coarse wavenumber axis is split into contiguous
per-process bands, each process

  * loads only its band's lines from the TLI (io.tli.read_tli_band — the
    memmap binary-search analogue of readdatarng's in-file search,
    readlineinfo.c:416-537), with a wing margin so boundary-line wings
    are retained;
  * builds band-local tile plans and runs the ICI-sharded step
    (parallel/sharded.py) over its local devices;
  * joins two DCN collectives per step: a (nlayer,)-sized max-reduction
    of the line-strength kmax (so the ethresh cutoff is globally
    consistent, extinction.c:400-427/467-470) and the final spectrum
    all-gather.

Bands are line-count-balanced, not bin-balanced: per-band work scales
with the number of lines (wing evaluations), and line density per band
is wildly non-uniform (SURVEY §7 hard part 2).  Boundaries are found by
bisection over the coarse grid with the per-isotope sorted wavelength
blocks queried through a memmap — O(nproc * niso * log N) page touches,
so a 1e9-line TLI balances in milliseconds.

Every per-process program is compiled independently (plans, tile shapes
and line-count classes may differ per band); only the two collectives
couple the processes, so scaling efficiency is set by the line balance.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from transit_tpu.constants import TLI_WAV_UNITS
from transit_tpu import grids
from transit_tpu.io.tli import bisect_mm, read_tli_header, read_tli_band
from transit_tpu.io.atmosphere import read_atmosphere
from transit_tpu.opacities import fast
from transit_tpu.parallel.sharded import make_sharded_forward


def initialize(coordinator_address: str, num_processes: int,
               process_id: int, **kw):
    """jax.distributed.initialize wrapper (call before any jax compute).

    On CPU test rigs combine with
    XLA_FLAGS=--xla_force_host_platform_device_count=K for K local
    devices per process."""
    jax.distributed.initialize(coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id, **kw)


def balanced_blocks(tli_path: str, wns_v: np.ndarray, nproc: int,
                    min_bins: int = 4) -> np.ndarray:
    """Line-count-balanced contiguous coarse-bin blocks.

    Returns (nproc+1,) bin boundaries with bounds[0]=0,
    bounds[-1]=len(wns_v); block p owns bins [bounds[p], bounds[p+1]).
    Uses only O(nproc * log n) memmap binary searches over the TLI's
    per-isotope wavelength-sorted line blocks.
    """
    n = int(len(wns_v))
    if nproc <= 1:
        return np.array([0, n], dtype=np.int64)
    if n < nproc * min_bins:
        min_bins = max(1, n // nproc)
    hdr = read_tli_header(tli_path)
    data_off, nlines, isotran = hdr["_line_layout"]
    wl_mm = np.memmap(tli_path, dtype="<f8", mode="r", offset=data_off,
                      shape=(nlines,))
    starts = np.concatenate([[0], np.cumsum(isotran.astype(np.int64))])

    def lines_below(wn):
        """Lines with wavenumber <= wn (wavelength >= 1/wn).  bisect_mm,
        not np.searchsorted: the unaligned TLI memmap would otherwise be
        COPIED wholesale on every probe (io/tli.py:bisect_mm)."""
        wl_x = 1.0 / wn / TLI_WAV_UNITS
        tot = 0
        for i in range(len(isotran)):
            blk = wl_mm[starts[i]:starts[i + 1]]
            tot += int(blk.shape[0]) - bisect_mm(blk, wl_x, side="left")
        return tot

    g_lo = lines_below(float(wns_v[0]))
    g_hi = lines_below(float(wns_v[-1]))
    bounds = [0]
    for k in range(1, nproc):
        tgt = g_lo + (g_hi - g_lo) * k / nproc
        lo_b = bounds[-1] + min_bins
        hi_b = n - (nproc - k) * min_bins
        lo, hi = lo_b, max(hi_b, lo_b + 1)
        while hi - lo > 1:
            mid = (lo + hi) // 2
            if lines_below(float(wns_v[mid])) < tgt:
                lo = mid
            else:
                hi = mid
        bounds.append(int(np.clip(lo, lo_b, hi_b)))
    bounds.append(n)
    return np.array(bounds, dtype=np.int64)


def wing_margin(cfg, databases, wns) -> float:
    """Line-selection margin (cm-1) beyond a band's window: the maximum
    wing reach nwidth * max(alphaD, alphaL) over layers/isotopes
    (extinction.c:27 via fast.max_width_bound), plus slack for the +1-bin
    halo rounding of the tile planner."""
    qmol = cfg.qmol.split(",") if cfg.qmol else None
    qscale = ([float(x) for x in cfg.qscale.split(",")]
              if cfg.qscale else None)
    atm, mol = read_atmosphere(cfg.atm, cfg.molfile, qmol=qmol,
                               qscale=qscale, allowq=cfg.allowq)
    iso_mass, iso_imol = [], []
    for db in databases:
        mi = atm.species.index(db.molecule)
        for iso in db.isotopes:
            iso_mass.append(iso.mass)
            iso_imol.append(mi)
    mw = fast.max_width_bound(atm, mol, np.asarray(iso_mass), wns.f,
                              np.asarray(iso_imol, dtype=int))
    return cfg.nwidth * mw + 2.0 * wns.d


def build_band_model(cfg, num_processes: int, process_id: int,
                     mode: str = "fast", bands: int = 4, dtype=None,
                     balanced: bool = True, bounds=None):
    """Band-local TransitModel for one process.

    Returns (model, (b0, b1), bounds): the model covers coarse bins
    [b0, b1) of the global grid, with only that window's lines (+wing
    margin) loaded from the TLI.
    """
    import os
    from transit_tpu.model import TransitModel
    grid_mode = bool(cfg.opacityfile and os.path.exists(cfg.opacityfile)
                     and not cfg.justOpacity)
    assert grid_mode or mode == "fast", \
        "multi-host bands require the fast path (or an opacity grid)"
    wns, _ = grids.make_wn_sampling(
        wnlow=cfg.wnlow, wnhigh=cfg.wnhigh, wllow=cfg.wllow,
        wlhigh=cfg.wlhigh, wndelt=cfg.wndelt, wnosamp=cfg.wnosamp,
        wnfct=(cfg.wnfct if cfg.wnfct > 0 else 1.0), wlfct=cfg.wlfct)
    if bounds is None:
        if balanced and not grid_mode:
            bounds = balanced_blocks(cfg.linedb, wns.v, num_processes)
        else:
            # Grid interpolation costs the same per bin — even split:
            edges = np.linspace(0, wns.n, num_processes + 1)
            bounds = np.round(edges).astype(np.int64)
    b0, b1 = int(bounds[process_id]), int(bounds[process_id + 1])

    if grid_mode:
        # The model memmap-reads only its wavenumber band of the grid
        # file (read_opacity_grid wn_window) — the shard-local load
        # replacing the reference's SysV shm mount (opacity.c:89-201):
        model = TransitModel(cfg, dtype=dtype, wn_window=(b0, b1))
        return model, (b0, b1), np.asarray(bounds)

    hdr = read_tli_header(cfg.linedb)
    margin = wing_margin(cfg, hdr["databases"], wns)
    wn_lo = max(wns.i, float(wns.v[b0]) - margin)
    wn_hi = min(wns.f, float(wns.v[b1 - 1]) + margin)
    # Wavelength window (microns) for the memmap band read:
    wl_min_um = 1.0 / wn_hi / TLI_WAV_UNITS
    wl_max_um = 1.0 / wn_lo / TLI_WAV_UNITS
    band_tli = read_tli_band(cfg.linedb, wl_min_um, wl_max_um)
    model = TransitModel(cfg, dtype=dtype, mode=mode, bands=bands,
                         tli=band_tli, wn_window=(b0, b1),
                         wn_margin=margin)
    return model, (b0, b1), np.asarray(bounds)


class MultihostForward:
    """Differentiable-band multi-process spectrum runner.

    forward(temps_raw, q) -> full global spectrum (replicated on every
    process).  Works unchanged with process_count() == 1 (then it is
    just the band machinery without DCN traffic).

    exact_ethresh=True adds the per-step kmax max-reduction so results
    match a single-process run to float-association level; with False
    each band uses its local kmax (deviations at the ethresh level,
    ~1e-8 relative) and one collective per step is saved.
    """

    def __init__(self, cfg, mode: str = "fast", bands: int = 4,
                 dtype=None, balanced: bool = True,
                 exact_ethresh: bool = True):
        self.nproc = jax.process_count()
        self.pid = jax.process_index()
        self.model, self.block, self.bounds = build_band_model(
            cfg, self.nproc, self.pid, mode=mode, bands=bands,
            dtype=dtype, balanced=balanced)
        ldevs = jax.local_devices()
        self.mesh = Mesh(np.asarray(ldevs), ("wn",))
        if self.model.ogrid is not None:
            exact_ethresh = False       # grid mode: no line kernel
        self.exact_ethresh = exact_ethresh
        self._step = make_sharded_forward(self.model, self.mesh,
                                          external_kmax=exact_ethresh)
        if exact_ethresh:
            model = self.model
            dev0 = (model.bdev[0] if model.bdev is not None
                    else model.fdev)

            @jax.jit
            def _kmax(temps_raw):
                temps_cgs = temps_raw * model.atm.tfct
                Z = model.partition_jnp(temps_raw)
                return fast.line_kmax(dev0, temps_cgs, Z)

            self._kmax_fn = _kmax
        spans = np.diff(self.bounds)
        self.span_max = int(spans.max())

    @property
    def n_local_lines(self):
        return self.model.tli.n_lines if self.model.tli is not None else 0

    def local_spectrum(self, temps_raw, q):
        """This process's band of the spectrum (no DCN gather)."""
        kg = self._global_kmax(temps_raw)
        if kg is not None:
            return self._step(temps_raw, q, kg)
        return self._step(temps_raw, q)

    def forward(self, temps_raw, q):
        spec = self.local_spectrum(temps_raw, q)
        if self.nproc == 1:
            return np.asarray(spec)
        from jax.experimental import multihost_utils
        pad = jnp.zeros(self.span_max - spec.shape[0], dtype=spec.dtype)
        g = np.asarray(multihost_utils.process_allgather(
            jnp.concatenate([spec, pad])))          # (nproc, span_max)
        parts = [g[p, :self.bounds[p + 1] - self.bounds[p]]
                 for p in range(self.nproc)]
        return np.concatenate(parts)

    def _global_kmax(self, temps_raw):
        if not self.exact_ethresh:
            return None
        kl = self._kmax_fn(temps_raw)
        if self.nproc > 1:
            from jax.experimental import multihost_utils
            kl = jnp.max(multihost_utils.process_allgather(kl), axis=0)
        return jnp.asarray(kl, self.model.dtype)

    def value_and_grad(self, loss_fn, temps_raw, q, *loss_args):
        """Differentiable multi-process retrieval step (the production
        loop the reference drives through run_transit, transit.c:118-122
        — here with gradients for optimizer/HMC samplers).

        ``loss_fn(band_spec, (b0, b1), *loss_args) -> scalar``: this
        process's contribution to a global loss that is a SUM over
        wavenumber bins (e.g. chi^2 of the band against the observed
        spectrum's matching window; loss_args ride through untouched,
        e.g. the full observation array for the band to slice).

        Returns (loss, (grad_temps, grad_q)), identical on every
        process.  The differentiated region is pure jit (band spectrum
        -> local loss -> local grads via one backward pass); the two
        host-mediated DCN collectives — the kmax max-reduction (a
        piecewise-constant threshold wrt parameters,
        extinction.c:467-470) and the loss/grad sum-reduction — stay
        OUTSIDE it, so autodiff never sees a host round-trip.
        """
        kg = self._global_kmax(temps_raw)

        def local(t, qq):
            spec = (self._step(t, qq, kg) if kg is not None
                    else self._step(t, qq))
            return loss_fn(spec, self.block, *loss_args)

        val, grads = jax.value_and_grad(local, argnums=(0, 1))(
            temps_raw, q)
        if self.nproc == 1:
            return val, grads
        from jax.experimental import multihost_utils
        gt, gq = grads
        flat = jnp.concatenate([jnp.reshape(val, (1,)), jnp.ravel(gt),
                                jnp.ravel(gq)])
        tot = jnp.sum(multihost_utils.process_allgather(flat), axis=0)
        return (tot[0],
                (tot[1:1 + gt.size].reshape(gt.shape),
                 tot[1 + gt.size:].reshape(gq.shape)))
