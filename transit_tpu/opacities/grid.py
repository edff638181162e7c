"""Opacity-grid subsystem: build, store, load, interpolate.

Reference: transit/src/opacity.c (calcopacity/readopacity, binary layout
opacity.c:406-421) and extinction.c:534-581 (interpolmolext).  The grid is a
4-D table [Nlayer][Ntemp][Nmol][Nwave] of per-molecule extinction (without
the density factor); at run time each layer linearly interpolates in
temperature and multiplies by the molecular density.

The reference's SysV shared-memory distribution of the grid
(opacity.c:89-201) has no TPU analogue — a host's chips already share the
array in HBM, and multi-host runs load shard-local wavenumber bands.

File format (little-endian, identical to the reference):
    i64 x4  Nmol, Ntemp, Nlayer, Nwave
    i32[Nmol]  universal molecule IDs
    f64[Ntemp] temperatures (K)
    f64[Nlayer] pressures (cgs, barye)
    f64[Nwave] wavenumbers (cm-1)
    f64[Nlayer][Ntemp][Nmol][Nwave] opacity grid
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from transit_tpu.constants import AMU, KB
from transit_tpu.grids import make_temp_sampling
from transit_tpu.numerics.spline import splinterp_np


@dataclasses.dataclass
class OpacityGrid:
    molID: np.ndarray    # (Nmol,) int32 universal molecule IDs
    temp: np.ndarray     # (Ntemp,)
    press: np.ndarray    # (Nlayer,) cgs
    wns: np.ndarray      # (Nwave,)
    grid: np.ndarray     # (Nlayer, Ntemp, Nmol, Nwave)


def write_opacity_grid(path: str, og: OpacityGrid):
    with open(path, "wb") as f:
        dims = np.array([og.molID.shape[0], og.temp.shape[0],
                         og.press.shape[0], og.wns.shape[0]], dtype="<i8")
        f.write(dims.tobytes())
        f.write(np.asarray(og.molID, dtype="<i4").tobytes())
        f.write(np.asarray(og.temp, dtype="<f8").tobytes())
        f.write(np.asarray(og.press, dtype="<f8").tobytes())
        f.write(np.asarray(og.wns, dtype="<f8").tobytes())
        f.write(np.asarray(og.grid, dtype="<f8").tobytes())


def read_opacity_grid(path: str, wn_window=None) -> OpacityGrid:
    """Read a grid file; ``wn_window=(b0, b1)`` loads only wavenumber
    columns [b0, b1) via memmap — the per-process band load of a
    multi-host run (the TPU-native replacement for the reference's SysV
    shared-memory grid distribution, opacity.c:89-201: instead of N
    processes mapping one machine's segment, each host reads only its
    band's bytes)."""
    with open(path, "rb") as f:
        hdr = f.read(32)
        nmol, ntemp, nlayer, nwave = np.frombuffer(hdr, "<i8", 4, 0)
        molID = np.frombuffer(f.read(4 * nmol), "<i4").copy()
        temp = np.frombuffer(f.read(8 * ntemp), "<f8").copy()
        press = np.frombuffer(f.read(8 * nlayer), "<f8").copy()
        wns = np.frombuffer(f.read(8 * nwave), "<f8").copy()
        off = f.tell()
    mm = np.memmap(path, dtype="<f8", mode="r", offset=off,
                   shape=(nlayer, ntemp, nmol, nwave))
    if wn_window is not None:
        b0, b1 = wn_window
        grid = np.asarray(mm[:, :, :, b0:b1])
        wns = wns[b0:b1]
    else:
        grid = np.asarray(mm)
    return OpacityGrid(molID=molID, temp=temp, press=press, wns=wns,
                       grid=grid)


def build_opacity_grid(model, path: str = None,
                       cell_batch: int = None) -> OpacityGrid:
    """calcopacity (opacity.c:281-427): per-molecule extinction on the
    (layer x temperature x molecule x wavenumber) grid via the exact
    line-by-line kernel (permol=1).

    Unlike the reference's L x T scalar loop, grid cells are computed as
    vmapped batches of ``cell_batch`` kernel instances per device
    dispatch — one compile, (L*T)/cell_batch dispatches (a 2500-cell
    host loop spends more time in dispatch latency than in compute).
    The default batch is sized from the kernel's dominant intermediate,
    ~n_lines x profile_width per instance, against a ~3 GB HBM budget."""
    from transit_tpu.opacities import lbl

    cfg = model.cfg
    tsamp = make_temp_sampling(cfg.tlow, cfg.thigh, cfg.tempdelt)
    temps = tsamp.v
    ntemp = temps.shape[0]
    atm = model.atm
    nl = atm.nlayers
    nmol_out = model.iso.nmol_out
    nwave = model.wns.n

    # Partition function at grid temperatures (opacity.c:324-339):
    Zg = np.stack([splinterp_np(t, z, temps) for t, z in model._pf])

    # Universal mol IDs in output order (opacity.c:349-361):
    seen = []
    for mi in model.iso.imol:
        mid = int(model.mol.ids[mi])
        if mid not in seen:
            seen.append(mid)
    molID = np.array(seen, dtype=np.int32)

    press_cgs = atm.press * atm.pfct
    mol_mass = jnp.asarray(model.mol.mass, dtype=model.dtype)
    mol_radius = jnp.asarray(model.mol.radius, dtype=model.dtype)
    wn0 = float(model.wns.v[0])

    # Densities at (layer, grid-temp): stateeqnford with the layer's q and
    # mm but the grid temperature (opacity.c:392-394):
    q = atm.q                      # (nmolecules, nl)
    mm = atm.mm

    fn = jax.jit(jax.vmap(lambda tt, dd, zz: lbl.layer_extinction(
        model.plan, model.iso, model.table, model.dev, tt, dd, zz,
        mol_mass, mol_radius, wn0, ethresh=cfg.ethreshold, permol=True)))

    def dens_at(r):
        """(ntemp, nmolecules) densities at layer r over the T grid
        (stateeqnford with the layer's q/mm, opacity.c:392-394)."""
        dens = (AMU * q[:, r][None, :] * press_cgs[r] / KB /
                temps[:, None])
        return dens * (mm[r] if atm.by_mass else
                       np.asarray(model.mol.mass)[None, :])

    ncells = nl * ntemp
    if cell_batch is None:
        # Dominant intermediate per instance: (n_lines-ish, profile
        # width) index/value tensors, ~4 of them live at once:
        width = 2 * int(np.max(model.table.profsize)) + 1
        per_cell = max(int(model.plan.n_groups) * width * 16, 1)
        cell_batch = int(np.clip(3e9 // per_cell, 1, ncells))

    # All (layer, temp) cells flattened, padded to a whole number of
    # fixed-shape batches (one compile):
    tt_all = np.tile(temps.astype(np.float64), nl)
    dd_all = np.concatenate([dens_at(r) for r in range(nl)])
    zz_all = np.tile(Zg.T, (nl, 1))
    npad = -(-ncells // cell_batch) * cell_batch - ncells
    if npad:
        tt_all = np.concatenate([tt_all, tt_all[-npad:]])
        dd_all = np.concatenate([dd_all, dd_all[-npad:]])
        zz_all = np.concatenate([zz_all, zz_all[-npad:]])

    rows = np.zeros((ncells + npad, nmol_out, nwave))
    for c0 in range(0, ncells + npad, cell_batch):
        sl = slice(c0, c0 + cell_batch)
        rows[sl] = np.asarray(fn(
            jnp.asarray(tt_all[sl], model.dtype),
            jnp.asarray(dd_all[sl], model.dtype),
            jnp.asarray(zz_all[sl], model.dtype)))
    grid = rows[:ncells].reshape(nl, ntemp, nmol_out, nwave)

    og = OpacityGrid(molID=molID, temp=temps, press=press_cgs,
                     wns=model.wns.v.copy(), grid=grid)
    if path:
        write_opacity_grid(path, og)
    return og


def build_opacity_grid_fast(model, path: str = None,
                            eval_budget: int = 0,
                            cell_chunk: int = 256) -> OpacityGrid:
    """Fast-path (permol) grid build: per-output-molecule tile plans and
    the on-the-fly Voigt kernel over ALL (layer x temperature) cells in
    one batched evaluation per molecule.

    This is the production builder for the reference's 'hours' workload
    (calcopacity, opacity.c:281-427; user manual: grid generation takes
    'hours' on one core): the exact builder replays the reference's
    profile-table gathers, which both compile slowly and run ~100x
    slower than the dense tile kernel.  Physics difference (documented,
    accuracy-improving, same as the fast spectrum path): true per-line
    widths instead of the 60x60 width-quantized table, so a built grid
    deviates from a reference-built one by the quantization error
    (sub-percent in the mean).

    The model may be in mode="fast" or "exact" — only its TLI/atmosphere
    data are used; plans are built here per molecule.
    """
    from transit_tpu.constants import (SQRTLN2, LS, PI)
    from transit_tpu.io.tli import select_lines
    from transit_tpu.opacities import fast
    from transit_tpu.constants import TLI_WAV_UNITS

    cfg = model.cfg
    tsamp = make_temp_sampling(cfg.tlow, cfg.thigh, cfg.tempdelt)
    temps = tsamp.v
    ntemp = temps.shape[0]
    atm = model.atm
    nl = atm.nlayers
    nmol_out = model.iso.nmol_out
    nwave = model.wns.n
    dtype = model.dtype

    Zg = np.stack([splinterp_np(t, z, temps) for t, z in model._pf])

    seen = []
    for mi in model.iso.imol:
        mid = int(model.mol.ids[mi])
        if mid not in seen:
            seen.append(mid)
    molID = np.array(seen, dtype=np.int32)

    press_cgs = atm.press * atm.pfct
    q, mm = atm.q, atm.mm

    # All L x T cells flattened as a synthetic "layer" axis (cell-major:
    # layer slow, temperature fast — the reference's write order):
    tt = np.repeat(temps[None, :], nl, axis=0).reshape(-1)      # (L*T,)
    dd = np.zeros((len(model.mol.mass), nl * ntemp))
    for r in range(nl):
        dens = (AMU * q[:, r][None, :] * press_cgs[r] / KB /
                temps[:, None])                                  # (T, nm)
        dens = dens * (mm[r] if atm.by_mass
                       else np.asarray(model.mol.mass)[None, :])
        dd[:, r * ntemp:(r + 1) * ntemp] = dens.T
    zz = np.tile(Zg, (1, nl))                                    # (niso, L*T)

    wl, isoid, elow, gf = select_lines(model.tli, model.wns.i,
                                       model.wns.f)
    wavn = 1.0 / (np.asarray(wl) * TLI_WAV_UNITS)
    iout_of_iso = model.iso.iout

    mol_mass = jnp.asarray(model.mol.mass, dtype=dtype)
    mol_radius = jnp.asarray(model.mol.radius, dtype=dtype)
    fdop = np.sqrt(2.0 * KB * tt / AMU) * float(SQRTLN2) / LS
    flor = np.sqrt(2.0 * KB * tt / PI / AMU) / (AMU * LS)

    # Cells are BANDED by width exactly like the spectrum path bands
    # layers (fast.make_banded_plans): a cell at 10 bar carries a
    # ~100x wider Lorentz halo than the median cell, and an unbanded
    # plan makes every cell pay it (measured 1530 s for the 5M-line
    # hj grid; banded: the same work drops with the width profile).
    # Within a band, cells stream in fixed-shape chunks: bounded
    # per-dispatch runtime and one compile per (molecule, band).
    ncells = nl * ntemp
    grid = np.zeros((ncells, nmol_out, nwave))
    kw = dict(wn_i=model.wns.i, dwn=model.wns.d,
              ethresh=cfg.ethreshold, nwidth=cfg.nwidth,
              eval_budget=eval_budget)

    for m in range(nmol_out):
        sel = iout_of_iso[isoid] == m
        if not np.any(sel):
            continue
        # Width bounds over this molecule's isotopes only:
        aL_m = np.zeros(ncells)
        aDf_m = np.zeros(ncells)
        for mi in np.nonzero(iout_of_iso == m)[0]:
            aDf_m = np.maximum(aDf_m,
                               fdop / np.sqrt(model.iso.mass[mi]))
            al = np.zeros_like(tt)
            for j in range(len(model.mol.mass)):
                csd = model.mol.radius[j] + \
                    model.mol.radius[model.iso.imol[mi]]
                al += (dd[j] / model.mol.mass[j] * csd * csd *
                       np.sqrt(1.0 / model.iso.mass[mi] +
                               1.0 / model.mol.mass[j]))
            aL_m = np.maximum(aL_m, flor * al)

        bplan = fast.make_banded_plans(
            wavn[sel], isoid[sel], elow[sel], gf[sel],
            wn_i=model.wns.i, dwn=model.wns.d, n_coarse=nwave,
            aL_layers=aL_m, aDf_layers=aDf_m, wn_max=model.wns.f,
            nwidth=cfg.nwidth, max_bands=4, split_far=True)
        devs = fast.banded_device_arrays(bplan, model.iso, dtype=dtype)

        for i, (a, b) in enumerate(bplan.slices):
            cells_b = bplan.perm[a:b]
            plan_i, dev_i = bplan.plans[i], devs[i]
            far = (bplan.far_plans[i]
                   if bplan.far_plans is not None else None)

            # The line tensors are jit ARGUMENTS, not closure captures:
            # captured device arrays become literal constants in the HLO,
            # which (through this environment's remote compiler) bloats
            # the compile request and the persistent-cache entries by the
            # full line-tensor payload (measured: 39 programs = 2.5 GB of
            # cache; one request exceeded the tunnel's size limit).
            def band_fn(dev, t_, d_, z_, plan=plan_i, far=far):
                prep = fast._prep_layers(plan, dev, t_, d_, z_,
                                         mol_mass, mol_radius, 512,
                                         unit_density=True)
                args = (t_, d_, z_, mol_mass, mol_radius)
                ex = fast.fast_extinction(plan, dev, *args, prep=prep,
                                          **kw)
                for (pL, pR, s), (dL, dR) in zip(far or (),
                                                 dev.get("far", ())):
                    for fp, fdt in ((pL, dL), (pR, dR)):
                        if fp is None:
                            continue
                        fd = dict(dev, **fdt)
                        ex = ex + fast.fast_extinction(
                            fp, fd, *args, prep=prep,
                            voigt_fn=fast.FAR_KERNELS[fp.wfn_tag],
                            stride=s, **kw)
                return ex

            jfn = jax.jit(band_fn)
            fn = lambda t_, d_, z_, jfn=jfn, dev=dev_i: jfn(dev, t_, d_,
                                                           z_)
            chunk = int(min(max(cell_chunk, 1), len(cells_b)))
            # NOTE: downloads stay serial (np.asarray per chunk) — an
            # async-copy variant (copy_to_host_async + deferred collect)
            # measured 3x SLOWER end-to-end on this backend (2170 s vs
            # 731 s for the 5M-line hj grid); queued host copies through
            # the tunneled device serialize pathologically.
            for c0 in range(0, len(cells_b), chunk):
                idx = cells_b[c0:c0 + chunk]
                pad = chunk - len(idx)
                if pad:
                    idx = np.concatenate([idx, idx[-1:].repeat(pad)])
                out = np.asarray(fn(jnp.asarray(tt[idx], dtype),
                                    jnp.asarray(dd[:, idx], dtype),
                                    jnp.asarray(zz[:, idx], dtype)))
                keep = idx[:chunk - pad] if pad else idx
                grid[keep, m, :] = out[:len(keep)]
    grid = grid.reshape(nl, ntemp, nmol_out, nwave)

    og = OpacityGrid(molID=molID, temp=temps, press=press_cgs,
                     wns=model.wns.v.copy(), grid=grid)
    if path:
        write_opacity_grid(path, og)
    return og


def grid_extinction(og_temp, og_grid, mol_of_m, temps_cgs, densities):
    """interpolmolext (extinction.c:534-581): per-layer extinction from the
    grid, differentiable in the layer temperatures.

    og_temp: (Ntemp,); og_grid: (Nlayer, Ntemp, Nmol, Nwave) device array;
    mol_of_m: (Nmol,) atmosphere molecule index per grid molecule;
    temps_cgs: (Nlayer,) traced; densities: (nmolecules, Nlayer).
    Returns (Nlayer, Nwave).
    """
    og_temp = jnp.asarray(og_temp)
    ntemp = og_temp.shape[0]
    # itemp: index of grid temperature immediately below temp
    # (binsearchapprox + step-down, extinction.c:562-564):
    from transit_tpu.numerics.search import nearest_index_jnp
    it = nearest_index_jnp(og_temp, temps_cgs)
    it = jnp.where(temps_cgs < og_temp[it], it - 1, it)
    it = jnp.clip(it, 0, ntemp - 2)

    t0 = og_temp[it]
    t1 = og_temp[it + 1]
    w0 = (t1 - temps_cgs) / (t1 - t0)
    w1 = (temps_cgs - t0) / (t1 - t0)

    nl = og_grid.shape[0]
    g0 = og_grid[jnp.arange(nl), it]        # (Nlayer, Nmol, Nwave)
    g1 = og_grid[jnp.arange(nl), it + 1]
    ext = g0 * w0[:, None, None] + g1 * w1[:, None, None]
    dens_m = densities[mol_of_m, :].T       # (Nlayer, Nmol)
    return jnp.sum(ext * dens_m[:, :, None], axis=1)
