"""Multi-chip execution: wavenumber-domain decomposition over a JAX mesh.

The physically parallel axis of this workload is wavenumber (the
sequence-parallelism analogue; SURVEY §2.4): the coarse grid is split into
contiguous tile blocks per device, and the line list is bucketed per tile
*with wing halos* on the host (opacities/fast.py), so every device owns
exactly the lines its block can see — boundary lines are duplicated into
both neighbors (duplication ~ (2*halo+TW)/TW) and no runtime halo exchange
is needed.  Everything downstream of extinction (CIA, scattering, clouds,
tau-as-matmul over the *local* layer axis, intensity/flux or modulation) is
pointwise in wavenumber and stays device-local; the only collective is the
final spectrum all-gather, which jax.jit inserts from the output sharding.

A second mesh axis ("batch") shards retrieval batches (the DP analogue) via
vmap composed over the sharded step.

The reference has no distributed compute at all (its only multi-process
feature is a SysV shared-memory opacity cache, transit/src/opacity.c:89-201);
this module is the TPU-native replacement.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from transit_tpu.constants import NAVOGADRO, SUNRADIUS
from transit_tpu.opacities import fast
from transit_tpu.opacities.voigt import voigt_k_humlicek, voigt_k_humlicek_r2
from transit_tpu.opacities.cia import cs_extinction
from transit_tpu.opacities.clouds import cloud_extinction
from transit_tpu.opacities.scattering import scattering_extinction
from transit_tpu.rt import tau as rt_tau
from transit_tpu.rt.emission import eclipse_intensity, flux
from transit_tpu.rt.transmission import modulation


def _pad_tiles(model, ndev):
    """Pad the fast plan's tile tensors to a multiple of ndev tiles."""
    d = model.fdev
    ntiles = model.fplan.ntiles
    npad = (-(-ntiles // ndev)) * ndev - ntiles
    if npad == 0:
        return d, ntiles
    out = dict(d)
    for k in ("wavn", "elow", "gf", "iso", "mask"):
        pad_shape = (npad,) + d[k].shape[1:]
        fill = jnp.zeros(pad_shape, dtype=d[k].dtype)
        out[k] = jnp.concatenate([d[k], fill], axis=0)
    return out, ntiles + npad


def make_sharded_forward(model, mesh: Mesh, external_kmax: bool = False):
    """Jitted sharded spectrum step: (temps_raw, q) -> spectrum.

    With ``external_kmax`` the step takes a third argument — a per-layer
    kmax (line-strength maximum) computed elsewhere.  The multi-host path
    uses this to feed the cross-process-reduced kmax so every wavenumber
    band applies the same ethresh cutoff (extinction.c:467-470).

    ``model`` must be a TransitModel in mode="fast" (banded or not) or one
    with a loaded opacity grid (cfg.opacityfile — the reference's
    production interpolation mode, extinction.c:534-581; here the 4-D
    [L,T,M,W] grid is sharded over its wavenumber axis so each device
    holds only its band).  The mesh needs a "wn" axis; radii are static
    (file atmosphere geometry).  Every device owns a contiguous block of
    ``span`` coarse bins; with banded plans each band's (power-of-two)
    tile width divides the block size, so all bands' local outputs cover
    the same bins.
    """
    grid_mode = model.ogrid is not None
    assert grid_mode or model.mode == "fast"
    ndev = mesh.shape["wn"]
    nl = model.atm.nlayers
    dtype = model.dtype
    cfg = model.cfg
    wn_i = float(model.wns.i)
    dwn = float(model.wns.d)
    n_coarse = model.wns.n

    banded = (not grid_mode and
              getattr(model, "bplan", None) is not None)
    if grid_mode:
        # Opacity grid [L, T, M, W] sharded over W; pad W to ndev blocks:
        span = -(-n_coarse // ndev)
        og = model._ogrid_dev
        pad = ndev * span - og.shape[-1]
        if pad:
            og = jnp.concatenate(
                [og, jnp.zeros(og.shape[:-1] + (pad,), og.dtype)], axis=-1)
        tile_args = {"og": og}
        og_temp = jnp.asarray(model.ogrid.temp, dtype=dtype)
        og_mol = jnp.asarray(model.grid_mol_idx)
    elif banded:
        bplan = model.bplan
        B = max(p.tw for p in bplan.plans)
        span = (-(-n_coarse // (ndev * B))) * B          # bins per device
        tile_args = {}
        band_meta = []          # per band: [(plan, ntl, keys, is_far), ...]
        for i, p in enumerate(bplan.plans):
            far = (bplan.far_plans[i]
                   if bplan.far_plans is not None else None)
            subs = [(p, False, f"b{i}_")]
            if far is not None:
                subs += [(fp, True, f"b{i}{tag}_")
                         for tag, fp in zip(("L", "R"), far)
                         if fp is not None]
            metas = []
            for sp, is_far, prefix in subs:
                assert B % sp.tw == 0, \
                    "band tile widths must divide the block"
                ntl = span // sp.tw
                ntp = ndev * ntl
                t = fast._tile_tensors(sp, np.arange(sp.ntiles), sp.lmax,
                                       dtype)
                pad = ntp - sp.ntiles
                if pad:
                    t = {k: jnp.concatenate(
                        [v, jnp.zeros((pad,) + v.shape[1:], v.dtype)],
                        axis=0) for k, v in t.items()}
                keys = {k: prefix + k for k in t}
                tile_args.update({keys[k]: v for k, v in t.items()})
                metas.append((sp, ntl, keys, is_far))
            band_meta.append(metas)
        shared = {k: v for k, v in model.bdev[0].items()
                  if k not in ("classes", "wavn", "elow", "gf", "iso",
                               "mask", "farL", "farR")}
        perm = np.asarray(bplan.perm)
        inv_perm = jnp.asarray(bplan.inv_perm)
    else:
        assert model.fplan is not None
        d, ntiles_p = _pad_tiles(model, ndev)
        plan = model.fplan
        span = (ntiles_p // ndev) * plan.tw
        tile_args = {k: d[k] for k in ("wavn", "elow", "gf", "iso", "mask")}
        shared = {k: d[k] for k in d if k not in tile_args}

    mol_mass = jnp.asarray(model.mol.mass, dtype=dtype)
    mol_radius = jnp.asarray(model.mol.radius, dtype=dtype)
    mol_pol = jnp.asarray(model.mol.pol, dtype=dtype)
    press_raw = jnp.asarray(model.atm.press, dtype=dtype)
    press_cgs = jnp.asarray(model.atm.press * model.atm.pfct, dtype=dtype)
    W = jnp.asarray(model.W, dtype=dtype)
    Wmod = (jnp.asarray(model.Wmod, dtype=dtype)
            if model.Wmod is not None else None)
    ips = jnp.asarray(model.ips_v, dtype=dtype)
    iH2 = (model.atm.species.index("H2")
           if "H2" in model.atm.species else -1)
    kw = dict(wn_i=wn_i, dwn=dwn, ethresh=cfg.ethreshold,
              nwidth=cfg.nwidth)

    def local_step(tiles, temps_raw, q, kmax_full):
        """Runs on one device: tiles holds this device's tile block(s)."""
        widx = jax.lax.axis_index("wn")
        temps_cgs = temps_raw * model.atm.tfct
        Z = model.partition_jnp(temps_raw)
        molm = mol_mass

        mm = jnp.sum(q * molm[:, None], axis=0)
        if model.atm.by_mass:
            mm = 1.0 / jnp.sum(q / molm[:, None], axis=0)
        from transit_tpu.constants import AMU, KB
        rho = AMU * q * press_cgs[None, :] / KB / temps_cgs[None, :]
        densities = rho * (mm[None, :] if model.atm.by_mass
                           else molm[:, None])

        if grid_mode:
            from transit_tpu.opacities.grid import grid_extinction
            ex = grid_extinction(og_temp, tiles["og"], og_mol,
                                 temps_cgs, densities)       # (nl, span)
        elif banded:
            rows = []
            for metas, (a, b) in zip(band_meta, bplan.slices):
                sel = jnp.asarray(perm[a:b])
                args = (temps_cgs[sel], densities[:, sel], Z[:, sel],
                        molm, mol_radius)
                kov = kmax_full[sel] if external_kmax else None
                prep = None
                ex_b = 0.0
                for p, ntl, keys, is_far in metas:
                    ldev = dict(shared,
                                **{k: tiles[keys[k]] for k in keys})
                    if prep is None:
                        prep = fast._prep_layers(p, ldev, *args,
                                                 line_chunk=512,
                                                 kmax_override=kov)
                    ex_b = ex_b + fast.fast_extinction_tiles(
                        p, ldev, *args, tile0=widx * ntl, ntiles=ntl,
                        prep=prep,
                        voigt_fn=(voigt_k_humlicek_r2 if is_far
                                  else voigt_k_humlicek), **kw)
                rows.append(ex_b)
            ex = jnp.concatenate(rows, axis=0)[inv_perm]    # (nl, span)
        else:
            ldev = dict(shared, **tiles)
            ntl = span // plan.tw
            ex = fast.fast_extinction_tiles(
                plan, ldev, temps_cgs, densities, Z, molm, mol_radius,
                tile0=widx * ntl, ntiles=ntl,
                kmax_override=(kmax_full if external_kmax else None),
                **kw)                                        # (nl, span)

        wn_local = (wn_i + dwn * (widx * span +
                                  jnp.arange(span, dtype=dtype)))
        wns_cgs = wn_local * model.wns.fct

        # Raw (file-unit) p/T, as the reference feeds computeextscat
        # (tau.c:113-114,226):
        e_s = scattering_extinction(
            model._scatter_flag, model._scatter_logext, press_raw,
            temps_raw, wns_cgs, densities, molm, mol_pol)
        mean_molar = jnp.sum(densities / molm[:, None] * q, axis=0)
        mean_mm = jnp.sum(molm[:, None] * q, axis=0)
        mean_dens = mean_molar * mean_mm
        nH = (densities[iH2] / molm[iH2] * q[iH2] * NAVOGADRO
              if iH2 >= 0 else jnp.zeros(nl, dtype=dtype))
        e_c = cloud_extinction(model._cloud, press_raw, mean_dens, nH,
                               wns_cgs)
        e_cs = (cs_extinction(model.cs_tables, model.cs_pre, wn_local,
                              temps_cgs, densities, molm, model.cs_species)
                if model.cs_tables else 0.0)

        er = ex.T + e_s + e_c + e_cs
        tau = rt_tau.optical_depth(er, W, model.rfct)
        last = rt_tau.last_index(tau, cfg.toomuch)

        if model.solution == "eclipse":
            temp_rev = temps_cgs[::-1]
            intens = jnp.stack([
                eclipse_intensity(tau, last, wns_cgs, temp_rev, a)
                for a in model.angles])
            return flux(intens, model.angles)
        srad = cfg.starrad * SUNRADIUS
        return modulation(tau, last, ips, model.rfct, srad, cfg.toomuch,
                          transparent=cfg.transparent, Wmod=Wmod)

    tile_specs = ({"og": P(None, None, None, "wn")} if grid_mode
                  else {k: P("wn") for k in tile_args})

    fn = shard_map(local_step, mesh=mesh,
                   in_specs=(tile_specs, P(), P(), P()),
                   out_specs=P("wn"), check_vma=False)

    # tile_args ride as jit ARGUMENTS (closure-captured device arrays
    # become literal constants in the HLO, bloating compile requests and
    # persistent-cache entries by the full line-tensor payload):
    if external_kmax:
        @jax.jit
        def step_impl(targs, temps_raw, q, kmax_full):
            spec = fn(targs, temps_raw, q, kmax_full)
            return spec[:n_coarse]

        def step(temps_raw, q, kmax_full):
            return step_impl(tile_args, temps_raw, q, kmax_full)
    else:
        @jax.jit
        def step_impl(targs, temps_raw, q):
            spec = fn(targs, temps_raw, q, jnp.zeros(nl, dtype=dtype))
            return spec[:n_coarse]

        def step(temps_raw, q):
            return step_impl(tile_args, temps_raw, q)

    return step
