"""TransitModel: end-to-end spectrum pipeline.

Mirrors the reference driver (transit/src/transit.c:25-214): init loads and
precomputes everything static (grids, line plan, Voigt table, path-weight
matrices) on the host; the per-spectrum computation — extinction, CIA,
scattering, clouds, optical depth, and the geometry-specific spectrum — is
jit-compiled.  ``forward(temps, q)`` is the fully differentiable retrieval
step (the analogue of run_transit, transit.c:118-122): it recomputes
densities, partition functions, hydrostatic radii, and path weights
in-graph.

Two extinction modes:
  * mode="exact": the reference's profile-table scheme (opacities/lbl.py),
    bit-faithful to the C code — used for conformance.
  * mode="fast": on-the-fly Voigt on dense tiles (opacities/fast.py) — the
    TPU production path (no width quantization, no gathers).
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from transit_tpu import grids
from transit_tpu.config import TransitConfig
from transit_tpu.constants import (AMU, KB, NAVOGADRO, SUNRADIUS,
                                   TLI_WAV_UNITS)
from transit_tpu.io.atmosphere import read_atmosphere
from transit_tpu.io.crosssec import read_cross_section
from transit_tpu.io.tli import read_tli, select_lines
from transit_tpu.numerics.spline import (splinterp_np,
                                         spline_second_derivs_np,
                                         spline_eval_jnp)
from transit_tpu.opacities import fast, lbl
from transit_tpu.opacities.cia import cs_extinction, precompute_cs
from transit_tpu.opacities.clouds import CloudParams, cloud_extinction
from transit_tpu.opacities.scattering import scattering_extinction
from transit_tpu.opacities.voigt import build_profile_table
from transit_tpu.rt import tau as rt_tau
from transit_tpu.rt import geometry as rt_geom
from transit_tpu.rt.emission import eclipse_intensities, flux
from transit_tpu.rt.transmission import (
    modulation, modulation_m1, modulation_weight_table,
    modulation_weight_table_jnp)


@dataclasses.dataclass
class SpectrumResult:
    wns: np.ndarray            # coarse wavenumber grid (cm-1)
    spectrum: jnp.ndarray      # flux (eclipse) or modulation (transit)
    intensity: jnp.ndarray = None   # (nangle, nwn), eclipse only
    tau: jnp.ndarray = None         # (nwn, nh)
    last: jnp.ndarray = None        # (nwn,)
    extinction: jnp.ndarray = None  # (nlayer, nwn) line extinction
    cia: jnp.ndarray = None         # (nwn, nlayer)
    scatt: jnp.ndarray = None       # (nwn, nlayer) scattering extinction
    cloud: jnp.ndarray = None       # (nwn, nlayer) cloud extinction
    total: jnp.ndarray = None       # (nwn, nlayer) total extinction er


class TransitModel:
    def __init__(self, cfg: TransitConfig, dtype=None, mode: str = "exact",
                 use_pallas: bool = False, bands: int = 0,
                 split_far: bool = True, far_decimate: bool = True,
                 tli=None, wn_window=None, wn_margin: float = 0.0):
        """``tli``: preloaded TliData (e.g. a wavenumber band from
        io.tli.read_tli_band) overriding cfg.linedb's full read.
        ``wn_window=(b0, b1)``: restrict the model to coarse bins
        [b0, b1) of the *global* grid — the per-process band of a
        multi-host run (parallel/multihost.py); grid values are sliced
        from the global fill so band spectra concatenate bit-exactly.
        ``wn_margin`` (cm-1) widens line selection beyond the local
        window (clipped to the global range) so boundary-line wings are
        retained, mirroring the in-file range clip of readdatarng
        (readlineinfo.c:435-436)."""
        from transit_tpu.config import validate
        self.cfg = cfg = validate(cfg)
        self.mode = mode
        self.use_pallas = use_pallas
        self.bands = bands
        self.split_far = split_far
        self.far_decimate = far_decimate
        if dtype is None:
            dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
        self.dtype = dtype

        # --- wavenumber grids (transit.c:44 makewnsample) ---
        self.wns, self.owns = grids.make_wn_sampling(
            wnlow=cfg.wnlow, wnhigh=cfg.wnhigh, wllow=cfg.wllow,
            wlhigh=cfg.wlhigh, wndelt=cfg.wndelt, wnosamp=cfg.wnosamp,
            wnfct=(cfg.wnfct if cfg.wnfct > 0 else 1.0), wlfct=cfg.wlfct)
        self.wns_global = self.wns
        self.wn_window = wn_window
        self._wn_margin = wn_margin
        if wn_window is not None:
            b0, b1 = wn_window
            if not (0 <= b0 < b1 <= self.wns.n):
                raise ValueError(f"wn_window {wn_window} outside the "
                                 f"global grid of {self.wns.n} bins")
            v = self.wns.v
            self.wns = grids.Sampling(
                i=float(v[b0]), f=float(v[b1 - 1]), d=self.wns.d, o=1,
                v=v[b0:b1].copy(), fct=self.wns.fct)
            o = self.owns.o
            ov = self.owns.v
            self.owns = grids.Sampling(
                i=float(ov[b0 * o]), f=float(ov[(b1 - 1) * o]),
                d=self.owns.d, o=o,
                v=ov[b0 * o:(b1 - 1) * o + 1].copy(), fct=self.owns.fct)

        # --- atmosphere (transit.c:49 getatm) ---
        qmol = cfg.qmol.split(",") if cfg.qmol else None
        qscale = ([float(x) for x in cfg.qscale.split(",")]
                  if cfg.qscale else None)
        self.atm, self.mol = read_atmosphere(cfg.atm, cfg.molfile,
                                             qmol=qmol, qscale=qscale,
                                             allowq=cfg.allowq)

        # --- radius sampling: default keeps the atmosphere grid
        #     (makesample.c:472-482, raddelt = -1); positive raddelt
        #     resamples to an equidistant grid and splines every
        #     atmospheric quantity onto it (makesample.c:483-531) ---
        self.rfct = cfg.radfct if cfg.radfct > 0 else self.atm.rfct
        self._atm0 = None
        if cfg.raddelt == -1.0:
            self.rads_v = self.atm.radius
        else:
            if cfg.gsurf and cfg.refpress and cfg.refradius:
                from transit_tpu.config import ConfigError
                raise ConfigError(
                    "raddelt > 0 combined with hydrostatic retrieval "
                    "(gsurf/refpress/refradius) is not supported: the "
                    "radius grid would change every step while the "
                    "resampling target is fixed.  Use raddelt -1 (keep "
                    "the atmosphere grid, the reference's default).")
            ini = cfg.radlow if cfg.radlow > 0 else self.atm.radius[0]
            fin = cfg.radhigh if cfg.radhigh > 0 else self.atm.radius[-1]
            rs = grids.make_sampling(ini, fin, cfg.raddelt)
            old = self.atm.radius
            # Original layer grid, for reloadatm-style forward() inputs
            # (readatm.c:722-784: T/q arrive on the *atmosphere-file*
            # layers; makeradsample re-splines onto the radius grid):
            self._atm0 = {"radius": old.copy(),
                          "press": self.atm.press.copy()}
            a = self.atm
            a.temp = splinterp_np(old, a.temp, rs.v)
            a.press = splinterp_np(old, a.press, rs.v)
            a.mm = splinterp_np(old, a.mm, rs.v)
            a.q = np.stack([splinterp_np(old, qi, rs.v) for qi in a.q])
            a.d = np.stack([splinterp_np(old, di, rs.v) for di in a.d])
            a.radius = rs.v
            self.rads_v = rs.v
        self.ips_v = self.rads_v[::-1].copy()

        # --- opacity grid (transit.c:58 opacity; mode c: file exists) ---
        self.ogrid = None
        self.grid_mol_idx = None
        import os as _os
        if cfg.opacityfile and _os.path.exists(cfg.opacityfile) \
                and not cfg.justOpacity:
            from transit_tpu.opacities.grid import read_opacity_grid
            self.ogrid = read_opacity_grid(cfg.opacityfile,
                                           wn_window=wn_window)
            ids = list(self.mol.ids)
            self.grid_mol_idx = np.array(
                [ids.index(int(m)) for m in self.ogrid.molID],
                dtype=np.int32)
            self._ogrid_dev = jnp.asarray(self.ogrid.grid, dtype=self.dtype)

        # --- line list (transit.c:52 readlineinfo; skipped when an opacity
        #     grid is present, readlineinfo.c:586-603) ---
        if tli is not None:
            self.tli = tli
        else:
            self.tli = (read_tli(cfg.linedb)
                        if cfg.linedb and self.ogrid is None else None)
        self._setup_isotopes()

        # --- line plans / profile table ---
        self.table = None
        self.plan = None
        self.dev = None
        self.fplan = None
        self.fdev = None
        self.bplan = None
        self.bdev = None
        if self.tli is not None:
            # Band models widen the selection by wn_margin (clipped to
            # the global range) so wings of out-of-window lines land in
            # the edge tiles exactly as in a single-process run:
            sel_lo = max(self.wns_global.i, self.wns.i - wn_margin)
            sel_hi = min(self.wns_global.f, self.wns.f + wn_margin)
            wl, isoid, elow, gf = select_lines(self.tli, sel_lo, sel_hi)
            if mode == "exact":
                fine_dwn = self.wns.d / self.owns.o
                self.table = build_profile_table(
                    dwn=fine_dwn, nwave=self.owns.n, nwidth=cfg.nwidth,
                    ndop=cfg.ndop, nlor=cfg.nlor, dmin=cfg.dmin,
                    dmax=cfg.dmax, lmin=cfg.lmin, lmax=cfg.lmax)
                self.plan = lbl.plan_lines(
                    wl, isoid, elow, gf, TLI_WAV_UNITS,
                    wn_i=self.wns.i, odwn=self.owns.d / self.owns.o,
                    dwn=self.wns.d / self.wns.o, owns_v=self.owns.v,
                    n_coarse=self.wns.n, ofactor=self.owns.o)
                self.dev = lbl.device_arrays(self.plan, self.iso, self.table,
                                             dtype=self.dtype)
            elif mode == "fast":
                wavn = 1.0 / (np.asarray(wl) * TLI_WAV_UNITS)
                if bands > 0:
                    aL, aDf = fast.layer_width_bounds(
                        self.atm, self.mol, self.iso.mass, self.iso.imol)
                    self.bplan = fast.make_banded_plans(
                        wavn, isoid, elow, gf, wn_i=self.wns.i,
                        dwn=self.wns.d, n_coarse=self.wns.n, aL_layers=aL,
                        aDf_layers=aDf, wn_max=self.wns.f,
                        nwidth=cfg.nwidth, max_bands=bands,
                        split_far=split_far, far_decimate=far_decimate)
                    self.bdev = fast.banded_device_arrays(
                        self.bplan, self.iso, dtype=self.dtype)
                else:
                    mw = fast.max_width_bound(self.atm, self.mol,
                                              self.iso.mass, self.wns.f,
                                              self.iso.imol)
                    self.fplan = fast.make_fast_plan(
                        wavn, isoid, elow, gf, wn_i=self.wns.i,
                        dwn=self.wns.d, n_coarse=self.wns.n, max_width=mw,
                        nwidth=cfg.nwidth)
                    self.fdev = fast.fast_device_arrays(
                        self.fplan, self.iso, dtype=self.dtype)
            else:
                raise ValueError(f"unknown mode {mode!r}")

        # --- cross sections (transit.c:63 readcs) ---
        self.cs_tables = []
        self.cs_species = []
        if cfg.csfile:
            for f in cfg.csfile.split(","):
                tb = read_cross_section(f.strip())
                self.cs_tables.append(tb)
                self.cs_species.append(
                    np.array([self.atm.species.index(s)
                              for s in tb.species]))
        self.cs_pre = precompute_cs(self.cs_tables)

        # --- geometry / path weights (static-radius case) ---
        self.solution = cfg.solution
        self.angles = cfg.raygrid_list()
        if self.solution == "eclipse":
            self.W = rt_tau.eclipse_weights(self.rads_v)
            self.Wmod = None
        elif self.solution == "transit":
            self.W = rt_tau.transit_weights(self.rads_v, self.ips_v)
            ipv_asc = (self.ips_v[::-1] * self.rfct).copy()
            self.Wmod = modulation_weight_table(ipv_asc)
        else:
            raise ValueError(f"unknown solution {self.solution!r}")

        self._scatter_flag, self._scatter_logext = self._parse_scattering()
        self._cloud = self._parse_cloud()

        # Partition-function spline coefficients (static; evaluated at the
        # layer temperatures in-graph):
        self._setup_partition()
        self.Z_layers = np.stack(
            [splinterp_np(t, z, self.atm.temp)
             for t, z in self._pf] ) if self._pf else np.zeros((0, self.atm.nlayers))

    # ------------------------------------------------------------------
    def _setup_isotopes(self):
        """Cumulative isotope constants (readlineinfo.c:134-244, setimol
        readlineinfo.c:249-278, and calcopacity's molID ordering
        opacity.c:349-361)."""
        if self.tli is None:
            self.iso = lbl.IsoConst(mass=np.zeros(0), ratio=np.zeros(0),
                                    imol=np.zeros(0, np.int32),
                                    iout=np.zeros(0, np.int32), nmol_out=0)
            return
        names, masses, ratios, dbidx, mols = self.tli.iso_index()
        imol = np.array([self.atm.species.index(m) for m in mols],
                        dtype=np.int32)
        iout = np.zeros(len(names), dtype=np.int32)
        seen = []
        for i, mi in enumerate(imol):
            mid = self.mol.ids[mi]
            if mid not in seen:
                seen.append(mid)
            iout[i] = seen.index(mid)
        self.iso = lbl.IsoConst(mass=masses, ratio=ratios, imol=imol,
                                iout=iout, nmol_out=len(seen))
        self.iso_names = names

    def _setup_partition(self):
        """(temps, z) pairs per isotope plus static spline coefficients for
        in-graph evaluation (makesample.c:533-543)."""
        self._pf = []
        self._pf_z2 = []
        if self.tli is None:
            return
        for db in self.tli.databases:
            for iso in db.isotopes:
                self._pf.append((db.temps, iso.partition))
                self._pf_z2.append(spline_second_derivs_np(db.temps,
                                                           iso.partition))

    def partition_jnp(self, temps_raw):
        """Z (niso, nl) at traced layer temperatures (natural spline, the
        reference evaluates at unscaled atmosphere temperatures)."""
        if not self._pf:
            return jnp.zeros((0, jnp.shape(temps_raw)[0]), dtype=self.dtype)
        cols = []
        for (t, z), z2 in zip(self._pf, self._pf_z2):
            cols.append(spline_eval_jnp(jnp.asarray(t, self.dtype),
                                        jnp.asarray(z, self.dtype),
                                        jnp.asarray(z2, self.dtype),
                                        temps_raw))
        return jnp.stack(cols)

    def _parse_scattering(self):
        s = self.cfg.scattering
        if s is None:
            return 0, 0.0
        if s.strip() == "polar":
            return 2, 0.0
        return 1, float(s)

    def _parse_cloud(self):
        """argum.c:636-718: 'type,ext,top,bot[,extra...]' with type one of
        ext/opa/B17/F18/P19 (reference syntax) or the numeric flag 1-5."""
        c = self.cfg.cloud
        if c is None:
            if self.cfg.cloudtop is not None:
                # Standalone --cloudtop (argum.c CLA_CLOUDTOP, 720-726):
                # an opaque constant-extinction deck from cloudtop down
                # 10 dex, cloudext = 100:
                return CloudParams(flag=1, cloudext=100.0,
                                   cloudtop=self.cfg.cloudtop,
                                   cloudbot=self.cfg.cloudtop + 10.0)
            return CloudParams()
        names = {"ext": 1, "opa": 2, "B17": 3, "F18": 4, "P19": 5}
        head, *rest = c.split(",")
        flag = names.get(head.strip(), None)
        if flag is None:
            flag = int(float(head))
        parts = [float(flag)] + [float(x) for x in rest]
        p = CloudParams(flag=flag, cloudext=parts[1], cloudtop=parts[2],
                        cloudbot=parts[3])
        extra = parts[4:]
        if flag == 3 and extra:
            p.gamma = extra[0]
        elif flag == 4 and len(extra) >= 3:
            p.gamma, p.Q, p.r = extra[0], extra[1], extra[2]
        elif flag == 5 and len(extra) >= 3:
            p.gamma, p.sig, p.refwn = extra[0], extra[1], extra[2]
        return p

    # ------------------------------------------------------------------
    def device_tree(self):
        """The (potentially large) device arrays the spectrum step reads:
        line tile tensors or the opacity grid.  Pass this through
        ``forward(..., dev=...)`` from inside your own jit so the arrays
        ride as *arguments* — closure-captured device arrays become
        literal constants in the compiled program, which bloats compile
        requests and persistent-cache entries by the full line-data
        payload (hundreds of MB for real line lists)."""
        if self.ogrid is not None:
            return self._ogrid_dev
        if self.bands > 0 and getattr(self, "bplan", None) is not None:
            return self.bdev
        return self.fdev

    def make_forward(self):
        """Jitted ``(temps_raw, q) -> spectrum`` with the line tensors
        bound as arguments (see device_tree)."""
        jfn = jax.jit(lambda dev, t, q: self.forward(t, q, dev=dev))
        dev = self.device_tree()
        return lambda t, q: jfn(dev, t, q)

    def line_extinction(self, temps_cgs, densities, Z, dev=None,
                        use_saveext: bool = False):
        """Per-layer line extinction (nlayer, nwn).  ``dev`` overrides
        the model's stored device arrays (device_tree) so jitted callers
        can pass them as arguments instead of closure constants.

        ``use_saveext`` gates the extinction-checkpoint restore: the
        reference's savefile is valid only while the atmosphere (T, q)
        is unchanged — e.g. radius-scale-only re-runs
        (extinction.c:62-137, doc/changelog:28-30).  Only ``compute()``
        (the static file atmosphere) enables it; ``forward`` never does,
        because a restored host array would enter the traced graph as a
        CONSTANT and silently zero all T/q gradients through the line
        term."""
        nl = jnp.shape(temps_cgs)[0]
        # Extinction checkpoint (tau.c:155-156, extinction.c:96-137):
        if use_saveext and self.cfg.saveext:
            from transit_tpu.utils.savefiles import load_extinction
            cached = load_extinction(self.cfg.saveext, self.atm.nlayers,
                                     self.wns.n)
            if cached is not None:
                return jnp.asarray(cached[0], dtype=self.dtype)
        if self.ogrid is not None:
            from transit_tpu.opacities.grid import grid_extinction
            og = dev if dev is not None else self._ogrid_dev
            return grid_extinction(
                jnp.asarray(self.ogrid.temp, self.dtype), og,
                jnp.asarray(self.grid_mol_idx), temps_cgs, densities)
        mol_mass = jnp.asarray(self.mol.mass, dtype=self.dtype)
        mol_radius = jnp.asarray(self.mol.radius, dtype=self.dtype)
        if self.mode == "fast":
            kw = dict(wn_i=self.wns.i, dwn=self.wns.d,
                      ethresh=self.cfg.ethreshold, nwidth=self.cfg.nwidth)
            if self.bands > 0 and getattr(self, "bplan", None) is not None:
                return fast.banded_extinction(
                    self.bplan, dev if dev is not None else self.bdev,
                    temps_cgs, densities, Z, mol_mass, mol_radius, **kw)
            if self.fplan is None:
                return jnp.zeros((nl, self.wns.n), dtype=self.dtype)
            fdev = dev if dev is not None else self.fdev
            if self.use_pallas:
                from transit_tpu.opacities.pallas_lbl import pallas_extinction
                return pallas_extinction(self.fplan, fdev, temps_cgs,
                                         densities, Z, mol_mass, mol_radius,
                                         **kw)
            return fast.fast_extinction(self.fplan, fdev, temps_cgs,
                                        densities, Z, mol_mass, mol_radius,
                                        **kw)
        if self.plan is None or self.plan.n_lines == 0:
            return jnp.zeros((nl, self.wns.n), dtype=self.dtype)
        wn0 = float(self.wns.v[0])
        eth = self.cfg.ethreshold

        def one_layer(args):
            t, dens, z = args
            out = lbl.layer_extinction(
                self.plan, self.iso, self.table, self.dev,
                t, dens, z, mol_mass, mol_radius, wn0,
                ethresh=eth, permol=False)
            return out[0]

        return jax.lax.map(one_layer, (temps_cgs, densities.T, Z.T))

    # ------------------------------------------------------------------
    def _spectrum(self, temps_raw, q, densities, radii, W, Wmod,
                  full_result: bool, dev=None,
                  use_saveext: bool = False):
        """Shared spectrum core; all array args may be traced."""
        temps_cgs = temps_raw * self.atm.tfct
        Z = self.partition_jnp(temps_raw)
        ex = self.line_extinction(temps_cgs, densities, Z, dev=dev,
                                  use_saveext=use_saveext)   # (nl, nwn)
        return self._assemble(temps_raw, q, densities, radii, W, Wmod,
                              ex, full_result)

    def _assemble(self, temps_raw, q, densities, radii, W, Wmod,
                  ex, full_result: bool):
        """Everything downstream of the line extinction: scattering,
        clouds, CIA, optical depth, geometry-specific spectrum.  Cheap
        relative to extinction; vmapped per batch element by
        forward_batch."""
        atm = self.atm
        nl = atm.nlayers
        temps_cgs = temps_raw * atm.tfct

        wns_cgs = jnp.asarray(self.wns.v * self.wns.fct, dtype=self.dtype)
        # The reference feeds computeextscat the *raw* (file-unit) pressure
        # and temperature arrays (tau.c:113-114,226), not cgs:
        e_s = scattering_extinction(
            self._scatter_flag, self._scatter_logext,
            jnp.asarray(self.atm.press, self.dtype), temps_raw,
            wns_cgs, densities, jnp.asarray(self.mol.mass, self.dtype),
            jnp.asarray(self.mol.pol, self.dtype))

        # Mean mass density and H2 number density for cloud models
        # (tau.c:193-213; the reference leaves mean_dens uninitialized —
        # we compute the intended quantity):
        molm = jnp.asarray(self.mol.mass, dtype=self.dtype)
        mean_molar = jnp.sum(densities / molm[:, None] * q, axis=0)
        mean_mm = jnp.sum(molm[:, None] * q, axis=0)
        mean_dens = mean_molar * mean_mm
        iH2 = (self.atm.species.index("H2")
               if "H2" in self.atm.species else -1)
        nH = (densities[iH2] / molm[iH2] * q[iH2] * NAVOGADRO
              if iH2 >= 0 else jnp.zeros(nl, dtype=self.dtype))

        e_c = cloud_extinction(self._cloud,
                               jnp.asarray(atm.press, self.dtype),
                               mean_dens, nH, wns_cgs)

        e_cs = (cs_extinction(self.cs_tables, self.cs_pre, self.wns.v,
                              temps_cgs, densities, molm, self.cs_species)
                if self.cs_tables else
                jnp.zeros((self.wns.n, nl), dtype=self.dtype))

        er = ex.T + e_s + e_c + e_cs            # (nwn, nl)

        tau = rt_tau.optical_depth(er, W, self.rfct)
        last = rt_tau.last_index(tau, self.cfg.toomuch)

        if self.solution == "eclipse":
            temp_rev = temps_cgs[::-1]
            intens = eclipse_intensities(tau, last, wns_cgs, temp_rev,
                                         self.angles)
            spec = flux(intens, self.angles)
            if not full_result:
                return spec
            return SpectrumResult(wns=self.wns.v, spectrum=spec,
                                  intensity=intens, tau=tau, last=last,
                                  extinction=ex, cia=e_cs,
                                  scatt=jnp.broadcast_to(e_s, er.shape),
                                  cloud=jnp.broadcast_to(e_c, er.shape),
                                  total=er)
        else:
            srad = self.cfg.starrad * SUNRADIUS
            ips = radii[::-1]
            if self.cfg.modlevel == -1:
                spec = modulation_m1(tau, last, ips, self.rfct,
                                     srad, self.cfg.toomuch)
            else:
                spec = modulation(tau, last, ips, self.rfct, srad,
                                  self.cfg.toomuch,
                                  transparent=self.cfg.transparent,
                                  Wmod=Wmod)
            if not full_result:
                return spec
            return SpectrumResult(wns=self.wns.v, spectrum=spec, tau=tau,
                                  last=last, extinction=ex, cia=e_cs,
                                  scatt=jnp.broadcast_to(e_s, er.shape),
                                  cloud=jnp.broadcast_to(e_c, er.shape),
                                  total=er)

    # ------------------------------------------------------------------
    def _batched_bplan(self, B: int):
        """Batched VIEW of the banded plan for forward_batch: band i of
        the view covers every batch member's copy of band i's layers
        (pseudo-layer index b*nl + layer), sharing the tile plans and
        device tensors unchanged."""
        bp = self.bplan
        nl = self.atm.nlayers
        cache = self.__dict__.setdefault("_bplan_batch_cache", {})
        if B not in cache:
            perm_parts, slices, off = [], [], 0
            for (a, b) in bp.slices:
                band = np.concatenate([bp.perm[a:b] + k * nl
                                       for k in range(B)])
                perm_parts.append(band)
                slices.append((off, off + band.shape[0]))
                off += band.shape[0]
            perm = np.concatenate(perm_parts)
            inv = np.empty_like(perm)
            inv[perm] = np.arange(perm.shape[0])
            cache[B] = dataclasses.replace(bp, perm=perm, inv_perm=inv,
                                           slices=slices)
        return cache[B]

    def forward_batch(self, temps_raw, q, dev=None):
        """Batched retrieval step: (B, nl) temperatures x (B, nmol, nl)
        abundances -> (B, nwn) spectra.

        Unlike ``jax.vmap(forward)``, the line extinction treats the
        batch as EXTRA LAYERS: one kernel invocation over B*nl
        pseudo-layers through the same tile plans (the kernel is
        independent per layer), so the hot path and its analytic VJP
        run exactly as in the single-profile case — no vmap batching
        rules, and the tile-block budget adapts to the bigger layer
        axis automatically.  Only the cheap spectrum assembly
        (scattering, clouds, CIA, tau, geometry) is vmapped.

        Requires mode="fast"; the raddelt resampling path is not
        supported (use jax.vmap(model.forward) there).
        """
        if self.mode != "fast" or self._atm0 is not None:
            raise ValueError("forward_batch requires mode='fast' and "
                             "raddelt -1; use jax.vmap(model.forward)")
        atm = self.atm
        temps_raw = jnp.asarray(temps_raw, self.dtype)     # (B, nl)
        q = jnp.asarray(q, self.dtype)                     # (B, nm, nl)
        B, nl = temps_raw.shape
        molm = jnp.asarray(self.mol.mass, dtype=self.dtype)
        mol_radius = jnp.asarray(self.mol.radius, dtype=self.dtype)

        if atm.by_mass:
            mm = 1.0 / jnp.sum(q / molm[None, :, None], axis=1)
        else:
            mm = jnp.sum(q * molm[None, :, None], axis=1)
        press_cgs = jnp.asarray(atm.press * atm.pfct, dtype=self.dtype)
        rho = (AMU * q * press_cgs[None, None, :] / KB /
               (temps_raw * atm.tfct)[:, None, :])
        densities = rho * (mm[:, None, :] if atm.by_mass
                           else molm[None, :, None])       # (B, nm, nl)

        temps_cgs = temps_raw * atm.tfct
        tflat = temps_cgs.reshape(B * nl)
        dflat = jnp.moveaxis(densities, 1, 0).reshape(molm.shape[0],
                                                      B * nl)
        Zflat = self.partition_jnp(temps_raw.reshape(B * nl))
        kw = dict(wn_i=self.wns.i, dwn=self.wns.d,
                  ethresh=self.cfg.ethreshold, nwidth=self.cfg.nwidth)
        if self.bands > 0 and getattr(self, "bplan", None) is not None:
            ex = fast.banded_extinction(
                self._batched_bplan(B),
                dev if dev is not None else self.bdev,
                tflat, dflat, Zflat, molm, mol_radius, **kw)
        elif self.fplan is not None:
            ex = fast.fast_extinction(
                self.fplan, dev if dev is not None else self.fdev,
                tflat, dflat, Zflat, molm, mol_radius, **kw)
        else:
            ex = jnp.zeros((B * nl, self.wns.n), dtype=self.dtype)
        ex = ex.reshape(B, nl, self.wns.n)

        cfg = self.cfg
        if cfg.gsurf and cfg.refpress and cfg.refradius:
            def one(t_r, qq, dd, e):
                radii = rt_geom.radpress_jnp(
                    cfg.gsurf, cfg.refpress, cfg.refradius, t_r,
                    (1.0 / jnp.sum(qq / molm[:, None], axis=0)
                     if atm.by_mass
                     else jnp.sum(qq * molm[:, None], axis=0)),
                    atm.press, self.rfct)
                if self.solution == "eclipse":
                    W = rt_geom.eclipse_weights_jnp(radii)
                    Wmod = None
                else:
                    W = rt_geom.transit_weights_jnp(radii)
                    Wmod = modulation_weight_table_jnp(radii * self.rfct)
                return self._assemble(t_r, qq, dd, radii, W, Wmod, e,
                                      full_result=False)
        else:
            radii = jnp.asarray(self.rads_v, dtype=self.dtype)
            W = jnp.asarray(self.W, dtype=self.dtype)
            Wmod = (jnp.asarray(self.Wmod, dtype=self.dtype)
                    if self.Wmod is not None else None)

            def one(t_r, qq, dd, e):
                return self._assemble(t_r, qq, dd, radii, W, Wmod, e,
                                      full_result=False)

        return jax.vmap(one)(temps_raw, q, densities, ex)

    # ------------------------------------------------------------------
    def run_transit(self, flat_input):
        """Drop-in analogue of the reference's retrieval entry point
        (transit.c:118-122 run_transit via SWIG, transit.i:103): one flat
        array [T_0..T_nl-1, q_mol0_0.., ..., q_molN_..] of length
        nlayers*(nmol+1) -> spectrum.  Jittable/differentiable."""
        nl = (len(self._atm0["radius"]) if self._atm0 is not None
              else self.atm.nlayers)
        nmol = len(self.atm.species)
        flat_input = jnp.asarray(flat_input, dtype=self.dtype)
        temps = flat_input[:nl]
        q = flat_input[nl:nl * (nmol + 1)].reshape(nmol, nl)
        return self.forward(temps, q)

    # ------------------------------------------------------------------
    # Embedding API parity with the reference's re-entrant interface
    # (transit.c:98-115 set_radius/set_cloudtop/set_scattering):
    def set_radius(self, refradius: float):
        """Set the reference ('surface') radius for hydrostatic solves."""
        self.cfg.refradius = refradius

    def set_cloudtop(self, cloudtop: float):
        """Set the cloud-deck top pressure (log10 of the pressure in the
        atmosphere file's units)."""
        self._cloud.cloudtop = cloudtop

    def set_scattering(self, logext: float):
        """Set the Lecavelier H2-Rayleigh log-extinction parameter."""
        self._scatter_flag = 1
        self._scatter_logext = logext

    # ------------------------------------------------------------------
    def compute(self):
        """Spectrum for the file atmosphere (static radii)."""
        atm = self.atm
        temps_raw = jnp.asarray(atm.temp, dtype=self.dtype)
        q = jnp.asarray(atm.q, dtype=self.dtype)
        densities = jnp.asarray(atm.d, dtype=self.dtype)
        W = jnp.asarray(self.W, dtype=self.dtype)
        Wmod = (jnp.asarray(self.Wmod, dtype=self.dtype)
                if self.Wmod is not None else None)
        radii = jnp.asarray(self.rads_v, dtype=self.dtype)
        res = self._spectrum(temps_raw, q, densities, radii, W, Wmod,
                             full_result=True, use_saveext=True)
        if self.cfg.saveext:
            from transit_tpu.utils.savefiles import (save_extinction,
                                                     load_extinction)
            if load_extinction(self.cfg.saveext, self.atm.nlayers,
                               self.wns.n) is None:
                save_extinction(self.cfg.saveext, np.asarray(res.extinction))
        return res

    def forward(self, temps_raw, q, dev=None):
        """Differentiable retrieval step: new T/q profiles -> spectrum.

        Reproduces reloadatm (readatm.c:722-784): mean molecular mass,
        ideal-gas densities, hydrostatic radii (when gsurf/refpress/
        refradius are configured), re-derived path weights, then the full
        spectrum.  Jit/grad/vmap-able.  ``dev`` optionally supplies the
        line/grid device arrays as traced arguments (see device_tree /
        make_forward) so jitted callers avoid embedding them as program
        constants.
        """
        atm = self.atm
        temps_raw = jnp.asarray(temps_raw, dtype=self.dtype)
        q = jnp.asarray(q, dtype=self.dtype)
        molm = jnp.asarray(self.mol.mass, dtype=self.dtype)

        if atm.by_mass:
            mm = 1.0 / jnp.sum(q / molm[:, None], axis=0)
        else:
            mm = jnp.sum(q * molm[:, None], axis=0)
        if self._atm0 is not None:
            # raddelt > 0: inputs are on the original atmosphere layers;
            # compute densities there, then re-spline T/q/d onto the
            # fixed resampled radius grid (reloadatm readatm.c:722-784 +
            # makeradsample makesample.c:483-531), all in-graph:
            from transit_tpu.numerics.spline import splinterp_jnp
            r0 = jnp.asarray(self._atm0["radius"], dtype=self.dtype)
            p0_cgs = jnp.asarray(self._atm0["press"] * atm.pfct,
                                 dtype=self.dtype)
            rho0 = AMU * q * p0_cgs[None, :] / KB / (temps_raw *
                                                     atm.tfct)[None, :]
            d0 = rho0 * (mm[None, :] if atm.by_mass else molm[:, None])
            rs = jnp.asarray(self.rads_v, dtype=self.dtype)
            temps_raw = splinterp_jnp(r0, temps_raw, rs)
            q = jnp.stack([splinterp_jnp(r0, qi, rs) for qi in q])
            densities = jnp.stack([splinterp_jnp(r0, di, rs) for di in d0])
        else:
            press_cgs = jnp.asarray(atm.press * atm.pfct, dtype=self.dtype)
            rho = AMU * q * press_cgs[None, :] / KB / (temps_raw *
                                                       atm.tfct)[None, :]
            densities = rho * (mm[None, :] if atm.by_mass else molm[:, None])

        cfg = self.cfg
        if cfg.gsurf and cfg.refpress and cfg.refradius:
            radii = rt_geom.radpress_jnp(cfg.gsurf, cfg.refpress,
                                         cfg.refradius, temps_raw, mm,
                                         atm.press, self.rfct)
            if self.solution == "eclipse":
                W = rt_geom.eclipse_weights_jnp(radii)
                Wmod = None
            else:
                W = rt_geom.transit_weights_jnp(radii)
                Wmod = modulation_weight_table_jnp(radii * self.rfct)
        else:
            radii = jnp.asarray(self.rads_v, dtype=self.dtype)
            W = jnp.asarray(self.W, dtype=self.dtype)
            Wmod = (jnp.asarray(self.Wmod, dtype=self.dtype)
                    if self.Wmod is not None else None)

        return self._spectrum(temps_raw, q, densities, radii, W, Wmod,
                              full_result=False, dev=dev)
