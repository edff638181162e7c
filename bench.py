"""Benchmark: steady-state spectrum throughput on the standard workload.

Workload (benchmarks/make_workload.py): 100 layers x 2000 coarse
wavenumbers (2000-2500 cm-1, dnu=0.25) x 20k lines, eclipse geometry —
the BASELINE extinction+tau metric shape.

Metric: wavenumber-points x layers / second for one full jitted forward
step (extinction for all layers + CIA + tau + intensity + flux) in the
fast (float32, on-the-fly Voigt) mode on one chip.

Baseline: the reference C transit on the identical workload files runs the
whole spectrum in 0.80 s single-core (measured 2026-08-17, this machine:
`transit -c bench_ref.cfg`, includes its setup; its lazy evaluation computes
all layers here since toomuch is never reached) =
2000*100/0.80 = 2.5e5 points*layers/s.

Prints one JSON line.
"""

import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)

from transit_tpu import enable_compilation_cache  # noqa: E402
enable_compilation_cache()

BASELINE_C_POINTS_PER_S = 2000 * 100 / 0.80


def time_steps(forward, temps, q, runs, dev=None, windows=7):
    """Steady-state seconds per full forward step: the MEDIAN over
    ``windows`` independently timed windows of ``runs`` steps each, with
    the IQR as the dispersion estimate (a single-window number on a
    tunneled backend was seen to scatter +-10% round-to-round).
    Returns (dt_median, dt_iqr, windows).

    The ``runs`` steps (each a complete spectrum with its own temperature
    profile) run as one device program via lax.scan, so the measurement is
    device throughput: this environment reaches the TPU through a tunnel
    whose ~3.5 ms per-dispatch round-trip would otherwise dominate a
    multi-ms step (production retrieval loops likewise keep the chain of
    steps on device).

    ``dev``: the model's device_tree(), passed through the jit boundary
    as an argument so the line tensors aren't embedded as program
    constants (which bloats the compile request and the persistent
    compilation cache by the full line-data payload).
    """
    import jax
    import jax.numpy as jnp

    tstack = jnp.stack([temps + np.float32(0.01 * i) for i in range(runs)])

    @jax.jit
    def scan_steps(dev, ts, q):
        def body(c, tt):
            out = (forward(tt, q, dev) if dev is not None
                   else forward(tt, q))
            return c, out
        _, out = jax.lax.scan(body, 0, ts)
        # Scalar result: the host read that fences the timing then moves
        # 4 bytes, not runs x nwn spectra (tunnel transfers would
        # otherwise inflate a multi-ms step by ~10%):
        return jnp.sum(out)

    # Warm up twice and synchronize by MATERIALIZING the result: on this
    # environment's tunneled backend, block_until_ready() can return
    # before execution when large argument buffers are first staged
    # (measured: a "0.5 ms" blocked call whose np.asarray then waited
    # 154 s), so only a host read is a trustworthy fence.  The second
    # warmup absorbs the one-time argument-staging cost.
    out0 = np.asarray(scan_steps(dev, tstack, q))  # compile + warmup
    # The fence scalar is also a NaN tripwire: a non-finite spectrum
    # would otherwise time perfectly and go unnoticed (a round-4 kernel
    # regression NaN'd 95 hot-Jupiter bins without touching any rate):
    assert np.all(np.isfinite(out0)), "benchmark spectrum is not finite"
    np.asarray(scan_steps(dev, tstack, q))  # absorb arg staging
    dts = []
    for _ in range(windows):
        t0 = time.perf_counter()
        out = scan_steps(dev, tstack, q)
        np.asarray(out)
        dts.append((time.perf_counter() - t0) / runs)
    dts = np.asarray(dts)
    q25, q75 = np.percentile(dts, [25, 75])
    return float(np.median(dts)), float(q75 - q25), windows


def emit(metric, value, unit, vs, dt, dt_iqr, nwin):
    """One benchmark JSON line, with the dispersion of the timing windows
    (median-of-n with IQR; see time_steps)."""
    print(json.dumps({
        "metric": metric, "value": value, "unit": unit,
        "vs_baseline": vs, "n_windows": nwin,
        "iqr_pct": round(100.0 * dt_iqr / dt, 2),
    }))


def _model():
    from benchmarks.make_workload import (make, DATA, WN_LO, WN_HI,
                                          WN_DELT, WNOSAMP)
    if not os.path.exists(os.path.join(DATA, "bench.tli")):
        make()
    import jax.numpy as jnp
    from transit_tpu.config import TransitConfig
    from transit_tpu.model import TransitModel
    cfg = TransitConfig(
        atm=f"{DATA}/bench.atm", linedb=f"{DATA}/bench.tli",
        csfile=f"{DATA}/bench_cia.dat", molfile=f"{DATA}/molecules.dat",
        wnlow=WN_LO, wnhigh=WN_HI, wndelt=WN_DELT, wnosamp=WNOSAMP,
        wnfct=1.0, nwidth=20.0, ethreshold=1e-8,
        solution="eclipse", toomuch=1e30)
    # Layer-banded plans (+ tile line-count classes): ~2.3x less Voigt
    # work than the single global-halo plan, identical results:
    return TransitModel(cfg, dtype=jnp.float32, mode="fast", bands=6)


def main():
    import jax
    import jax.numpy as jnp

    model = _model()
    temps = jnp.asarray(model.atm.temp, dtype=model.dtype)
    q = jnp.asarray(model.atm.q, dtype=model.dtype)

    dt, dt_iqr, nwin = time_steps(model.forward, temps, q, runs=20,
                                  dev=model.device_tree())

    nwn = model.wns.n
    nl = model.atm.nlayers
    value = nwn * nl / dt
    emit("wn_points_x_layers_per_s", round(value, 1),
         f"points*layers/s (full step, {nwn}wn x {nl}layers, "
         f"20k lines, f32, median of {nwin} 20-step scans)",
         round(value / BASELINE_C_POINTS_PER_S, 3), dt, dt_iqr, nwin)


def retrieval_bench(batch=64):
    """BART-style batched retrieval: vmap over atmospheric profiles.
    The reference runs one MCMC sample per process; here a whole batch is
    one device program.  Reports spectra/s."""
    import jax
    import jax.numpy as jnp

    model = _model()
    t0v = jnp.asarray(model.atm.temp, dtype=model.dtype)
    q0 = jnp.asarray(model.atm.q, dtype=model.dtype)
    temps = jnp.stack([t0v + 0.5 * i for i in range(batch)])
    qs = jnp.stack([q0] * batch)
    # forward_batch folds the batch into the extinction kernel's layer
    # axis (one unbatched kernel invocation) instead of vmapping:
    dt, dt_iqr, nwin = time_steps(model.forward_batch, temps, qs, runs=3,
                                  dev=model.device_tree())
    value = batch / dt
    emit("retrieval_spectra_per_s", round(value, 2),
         f"spectra/s (vmap batch {batch}, {model.wns.n}wn x "
         f"{model.atm.nlayers}layers, f32)",
         round(value / (1.0 / 0.80), 3), dt, dt_iqr, nwin)


def transit_bench():
    """BASELINE workload 2: CH4 transmission + H2-H2/H2-He CIA (transit
    geometry, active toomuch=20 — exercises the modulation1 opaque-radius
    endpoint semantics).  Same line list/atmosphere as the standard
    workload; reference C baseline measured on the identical files."""
    import jax
    import jax.numpy as jnp
    from benchmarks.make_workload import (make, DATA, WN_LO, WN_HI,
                                          WN_DELT, WNOSAMP)
    from transit_tpu.config import TransitConfig
    from transit_tpu.model import TransitModel

    if not os.path.exists(os.path.join(DATA, "bench_cia_H2He.dat")):
        make()
    cfg = TransitConfig(
        atm=f"{DATA}/bench.atm", linedb=f"{DATA}/bench.tli",
        csfile=f"{DATA}/bench_cia.dat,{DATA}/bench_cia_H2He.dat",
        molfile=f"{DATA}/molecules.dat",
        wnlow=WN_LO, wnhigh=WN_HI, wndelt=WN_DELT, wnosamp=WNOSAMP,
        wnfct=1.0, nwidth=20.0, ethreshold=1e-8,
        solution="transit", toomuch=20.0)
    model = TransitModel(cfg, dtype=jnp.float32, mode="fast", bands=6)
    temps = jnp.asarray(model.atm.temp, dtype=model.dtype)
    q = jnp.asarray(model.atm.q, dtype=model.dtype)
    dt, dt_iqr, nwin = time_steps(model.forward, temps, q, runs=20,
                                  dev=model.device_tree())
    nwn, nl = model.wns.n, model.atm.nlayers
    value = nwn * nl / dt
    c_seconds = TRANSIT_C_SECONDS
    vs = (round(value / (nwn * nl / c_seconds), 3) if c_seconds else 0.0)
    emit("transmission_wn_points_x_layers_per_s", round(value, 1),
         f"points*layers/s (transit geometry, {nwn}wn x "
         f"{nl}layers, 20k lines, 2 CIA, f32)",
         vs, dt, dt_iqr, nwin)


# Reference C transit (solution transit, toomuch 20, both CIA files) on
# the identical files, single core, -O3, median of 5 (measured
# 2026-08-18 on this machine):
TRANSIT_C_SECONDS = 0.95


def hotjupiter_bench():
    """BASELINE workload 3: H2O+CO+CO2+CH4 hot Jupiter, 1-20 um
    (500-10000 cm-1, dnu=0.5 -> 19001 wn), 100 layers, 200k lines,
    H2-H2 + H2-He CIA, eclipse.  Reference C baseline measured on the
    identical files: see benchmarks/RESULTS.md."""
    import jax
    import jax.numpy as jnp
    from benchmarks.make_hotjupiter import make, DATA as HJ, WN_LO, WN_HI
    from transit_tpu.config import TransitConfig
    from transit_tpu.model import TransitModel

    if not os.path.exists(os.path.join(HJ, "hj.tli")):
        make()
    cfg = TransitConfig(
        atm=f"{HJ}/hj.atm", linedb=f"{HJ}/hj.tli",
        csfile=f"{HJ}/cia_H2_H2.dat,{HJ}/cia_H2_He.dat",
        molfile=f"{HJ}/molecules.dat",
        wnlow=WN_LO, wnhigh=WN_HI, wndelt=0.5, wnosamp=2160, wnfct=1.0,
        nwidth=20.0, ethreshold=1e-8, solution="eclipse", toomuch=1e30)
    model = TransitModel(cfg, dtype=jnp.float32, mode="fast", bands=6)
    temps = jnp.asarray(model.atm.temp, dtype=model.dtype)
    q = jnp.asarray(model.atm.q, dtype=model.dtype)
    dt, dt_iqr, nwin = time_steps(model.forward, temps, q, runs=5,
                                  dev=model.device_tree())
    nwn, nl = model.wns.n, model.atm.nlayers
    value = nwn * nl / dt
    # Reference C on the same files (hj_ref.cfg): measured wall time,
    # single core (see benchmarks/RESULTS.md):
    c_seconds = HOTJUPITER_C_SECONDS
    vs = (round(value / (nwn * nl / c_seconds), 3) if c_seconds else 0.0)
    emit("hotjupiter_wn_points_x_layers_per_s", round(value, 1),
         f"points*layers/s (full step, {nwn}wn x {nl}layers, "
         f"200k lines, 4 molecules, f32)",
         vs, dt, dt_iqr, nwin)


# Reference C transit on the identical hot-Jupiter files (hj_ref.cfg),
# single core, -O3, measured 2026-08-18 on this machine:
HOTJUPITER_C_SECONDS = 5.4


def wide_bench():
    """BASELINE scale target on one chip: ~10^6 output wavenumbers
    (500-10000 cm-1, dnu=0.01) x 100 layers x 10^6 lines, full
    line-by-line (no opacity grid), eclipse."""
    import jax
    import jax.numpy as jnp
    from benchmarks.make_hotjupiter import (make_wide, DATA_WIDE as HJ,
                                            WN_LO, WN_HI)
    from transit_tpu.config import TransitConfig
    from transit_tpu.model import TransitModel

    if not os.path.exists(os.path.join(HJ, "hj.tli")):
        make_wide()
    cfg = TransitConfig(
        atm=f"{HJ}/hj.atm", linedb=f"{HJ}/hj.tli",
        csfile=f"{HJ}/cia_H2_H2.dat,{HJ}/cia_H2_He.dat",
        molfile=f"{HJ}/molecules.dat",
        wnlow=WN_LO, wnhigh=WN_HI, wndelt=0.01, wnosamp=216, wnfct=1.0,
        nwidth=20.0, ethreshold=1e-8, solution="eclipse", toomuch=1e30)
    model = TransitModel(cfg, dtype=jnp.float32, mode="fast", bands=6)
    temps = jnp.asarray(model.atm.temp, dtype=model.dtype)
    q = jnp.asarray(model.atm.q, dtype=model.dtype)
    dt, dt_iqr, nwin = time_steps(model.forward, temps, q, runs=2,
                                  dev=model.device_tree(), windows=5)
    nwn, nl = model.wns.n, model.atm.nlayers
    value = nwn * nl / dt
    c_seconds = WIDE_C_SECONDS
    vs = (round(value / (nwn * nl / c_seconds), 3) if c_seconds else 0.0)
    emit("wide_wn_points_x_layers_per_s", round(value, 1),
         f"points*layers/s (full step, {nwn}wn x {nl}layers, "
         f"1e6 lines, 4 molecules, f32)",
         vs, dt, dt_iqr, nwin)


# Reference C transit on the identical wide files (hj_ref.cfg in
# benchmarks/data/hj_wide), single core, measured 2026-08-18:
WIDE_C_SECONDS = 130.8


def opacity_bench(exact: bool = False):
    """Opacity-grid generation (the reference's 'hours' mode): build the
    full (layer x temperature x molecule x wavenumber) grid; wall time
    includes compile (the C number includes its setup too).

    Default builder = build_opacity_grid_fast (permol tile kernel, true
    per-line widths); --opacity-exact uses the conformance-exact
    profile-table kernel (its vmapped gather graph compiles impractically
    slowly through this environment's remote-tunnel TPU compiler — run
    that variant on CPU)."""
    import jax
    import jax.numpy as jnp
    from benchmarks.make_workload import (make, DATA, WN_LO, WN_HI,
                                          WN_DELT, WNOSAMP)
    from transit_tpu.config import TransitConfig
    from transit_tpu.model import TransitModel
    from transit_tpu.opacities.grid import (build_opacity_grid,
                                            build_opacity_grid_fast)

    if not os.path.exists(os.path.join(DATA, "bench.tli")):
        make()
    cfg = TransitConfig(
        atm=f"{DATA}/bench.atm", linedb=f"{DATA}/bench.tli",
        csfile=f"{DATA}/bench_cia.dat", molfile=f"{DATA}/molecules.dat",
        wnlow=WN_LO, wnhigh=WN_HI, wndelt=WN_DELT, wnosamp=WNOSAMP,
        wnfct=1.0, nwidth=20.0, ethreshold=1e-8,
        solution="eclipse", toomuch=1e30,
        tlow=500.0, thigh=2900.0, tempdelt=100.0)
    model = TransitModel(cfg, mode="exact" if exact else "fast",
                         dtype=jnp.float32)
    t0 = time.perf_counter()
    if exact:
        grid = build_opacity_grid(model)
    else:
        grid = build_opacity_grid_fast(model)
    dt = time.perf_counter() - t0
    L, T, M, W = grid.grid.shape
    value = L * T * W / dt
    c_seconds = OPACITY_C_SECONDS
    vs = (round(value / (L * T * W / c_seconds), 3) if c_seconds else 0.0)
    print(json.dumps({
        "metric": "opacity_grid_cells_per_s",
        "value": round(value, 1),
        "unit": f"layer*temp*wn cells/s (grid {L}x{T}x{M}x{W}, 20k lines, "
                f"{'exact' if exact else 'fast permol'} kernel, "
                f"incl. compile)",
        "vs_baseline": vs,
    }))


# Reference C transit --justOpacity on the identical bench files
# (100 layers x 25 temps x 2001 wn grid), single core, -O3, measured
# 2026-08-18 on this machine (includes its setup, as ours includes
# compile):
OPACITY_C_SECONDS = 6.75


def gridstep_bench():
    """Opacity-grid interpolation mode — the reference's production
    retrieval mode ('a few seconds' per spectrum, interpolmolext
    extinction.c:534-581): full forward step with the line extinction
    interpolated from a precomputed [L,T,M,W] grid (built once, cached on
    disk; byte-compatible with the reference's format)."""
    import jax
    import jax.numpy as jnp
    from benchmarks.make_workload import (make, DATA, WN_LO, WN_HI,
                                          WN_DELT, WNOSAMP)
    from transit_tpu.config import TransitConfig
    from transit_tpu.model import TransitModel

    if not os.path.exists(os.path.join(DATA, "bench.tli")):
        make()
    gridfile = os.path.join(DATA, "bench_grid.bin")
    base = dict(
        atm=f"{DATA}/bench.atm", linedb=f"{DATA}/bench.tli",
        csfile=f"{DATA}/bench_cia.dat", molfile=f"{DATA}/molecules.dat",
        wnlow=WN_LO, wnhigh=WN_HI, wndelt=WN_DELT, wnosamp=WNOSAMP,
        wnfct=1.0, nwidth=20.0, ethreshold=1e-8,
        solution="eclipse", toomuch=1e30,
        tlow=500.0, thigh=2900.0, tempdelt=100.0)
    if not os.path.exists(gridfile):
        from transit_tpu.opacities.grid import build_opacity_grid
        bm = TransitModel(TransitConfig(**base), mode="exact",
                          dtype=jnp.float32)
        build_opacity_grid(bm, gridfile)
    cfg = TransitConfig(opacityfile=gridfile, **base)
    model = TransitModel(cfg, dtype=jnp.float32)
    temps = jnp.asarray(model.atm.temp, dtype=model.dtype)
    q = jnp.asarray(model.atm.q, dtype=model.dtype)
    dt, dt_iqr, nwin = time_steps(model.forward, temps, q, runs=50,
                                  dev=model.device_tree())
    nwn, nl = model.wns.n, model.atm.nlayers
    value = nwn * nl / dt
    c_seconds = GRIDSTEP_C_SECONDS
    vs = (round(value / (nwn * nl / c_seconds), 3) if c_seconds else 0.0)
    emit("gridmode_wn_points_x_layers_per_s", round(value, 1),
         f"points*layers/s (grid-interpolation step, {nwn}wn x "
         f"{nl}layers, 25-temp grid, f32)",
         vs, dt, dt_iqr, nwin)


# Reference C transit in opacity-grid interpolation mode on the identical
# files (same 25-temperature grid file), single core, -O3, median of 5
# (measured 2026-08-20 on this machine):
GRIDSTEP_C_SECONDS = 0.139


def _ab_cfg_kwargs(wide: bool):
    """Workload config kwargs for the A/B harness — mirrors main()
    (standard) / wide_bench() exactly."""
    if wide:
        from benchmarks.make_hotjupiter import (make_wide,
                                                DATA_WIDE as HJ,
                                                WN_LO, WN_HI)
        if not os.path.exists(os.path.join(HJ, "hj.tli")):
            make_wide()
        return dict(
            atm=f"{HJ}/hj.atm", linedb=f"{HJ}/hj.tli",
            csfile=f"{HJ}/cia_H2_H2.dat,{HJ}/cia_H2_He.dat",
            molfile=f"{HJ}/molecules.dat",
            wnlow=WN_LO, wnhigh=WN_HI, wndelt=0.01, wnosamp=216,
            wnfct=1.0, nwidth=20.0, ethreshold=1e-8,
            solution="eclipse", toomuch=1e30), 2
    from benchmarks.make_workload import (make, DATA, WN_LO, WN_HI,
                                          WN_DELT, WNOSAMP)
    if not os.path.exists(os.path.join(DATA, "bench.tli")):
        make()
    return dict(
        atm=f"{DATA}/bench.atm", linedb=f"{DATA}/bench.tli",
        csfile=f"{DATA}/bench_cia.dat", molfile=f"{DATA}/molecules.dat",
        wnlow=WN_LO, wnhigh=WN_HI, wndelt=WN_DELT, wnosamp=WNOSAMP,
        wnfct=1.0, nwidth=20.0, ethreshold=1e-8,
        solution="eclipse", toomuch=1e30), 20


def _ab_build_window(build_path, cfg_kwargs, runs):
    """Construct one build's timed window inside a module-swap scope.

    The old build's ``transit_tpu`` is imported from ``build_path`` with
    the current package temporarily removed from sys.modules; the model
    is constructed AND its scan step traced + compiled inside the scope
    (so every import the trace performs resolves against that build),
    then the module table is restored.  The returned closure only calls
    the already-compiled executable, so no cross-build imports can
    happen afterwards.
    """
    import importlib
    import jax
    import jax.numpy as jnp

    saved = {k: sys.modules.pop(k) for k in list(sys.modules)
             if k == "transit_tpu" or k.startswith("transit_tpu.")}
    sys.path.insert(0, build_path)
    importlib.invalidate_caches()
    try:
        from transit_tpu.config import TransitConfig
        from transit_tpu.model import TransitModel
        model = TransitModel(TransitConfig(**cfg_kwargs),
                             dtype=jnp.float32, mode="fast", bands=6)
        dev = model.device_tree()
        temps = jnp.asarray(model.atm.temp, dtype=model.dtype)
        q = jnp.asarray(model.atm.q, dtype=model.dtype)
        tstack = jnp.stack([temps + np.float32(0.01 * i)
                            for i in range(runs)])

        @jax.jit
        def scan_steps(d, ts, qq):
            def body(c, tt):
                return c, model.forward(tt, qq, dev=d)
            _, out = jax.lax.scan(body, 0, ts)
            return jnp.sum(out)

        out0 = np.asarray(scan_steps(dev, tstack, q))     # trace+compile
        assert np.all(np.isfinite(out0)), "A/B spectrum not finite"
        np.asarray(scan_steps(dev, tstack, q))            # stage args

        def window():
            t0 = time.perf_counter()
            np.asarray(scan_steps(dev, tstack, q))
            return (time.perf_counter() - t0) / runs
        return window
    finally:
        sys.path.remove(build_path)
        for k in [k for k in list(sys.modules)
                  if k == "transit_tpu" or k.startswith("transit_tpu.")]:
            del sys.modules[k]
        sys.modules.update(saved)


def ab_bench(ref: str, wide: bool = False, npairs: int = 9):
    """Paired interleaved A/B against another git ref (VERDICT r4 #7).

    Cross-version claims from same-day medians are confounded by
    tunnel/backend drift (~+-5% between runs).  This mode times BOTH
    builds in ONE process, strictly alternating A/B windows, and
    reports the per-pair relative delta with an exact two-sided sign
    test — drift affects adjacent windows nearly equally, so the
    pairing cancels it.

    The old build comes from a detached git worktree; its model is
    built and compiled inside a module-swap scope (_ab_build_window).
    """
    import glob
    import math
    import shutil
    import subprocess

    wt = os.path.join("/tmp", "ab_worktree_" + ref.replace("/", "_"))
    if not os.path.exists(wt):
        subprocess.run(["git", "-C", HERE, "worktree", "add", "--detach",
                        wt, ref], check=True)
    # The native helper .so is built per checkout; the lazily-imported
    # lineread/exact paths aren't used by this benchmark, but copy it so
    # an old build that imports it eagerly still works:
    for so in glob.glob(os.path.join(HERE, "transit_tpu", "_native*.so")):
        dst = os.path.join(wt, "transit_tpu", os.path.basename(so))
        if not os.path.exists(dst):
            shutil.copy(so, dst)

    cfg_kwargs, runs = _ab_cfg_kwargs(wide)
    win_old = _ab_build_window(wt, cfg_kwargs, runs)
    win_new = _ab_build_window(HERE, cfg_kwargs, runs)

    deltas = []
    for i in range(npairs):
        da = win_old()
        db = win_new()
        deltas.append((db - da) / da)
    deltas = np.asarray(deltas)
    wins = int((deltas < 0).sum())          # new build faster
    n = len(deltas)
    # Exact two-sided sign test p-value:
    p = sum(math.comb(n, k) for k in
            range(min(wins, n - wins) + 1)) / 2.0 ** (n - 1)
    p = min(p, 1.0)
    print(json.dumps({
        "metric": "ab_paired_step_delta_pct",
        "value": round(100.0 * float(np.median(deltas)), 2),
        "unit": (f"% step-time change vs {ref} "
                 f"({'wide' if wide else 'standard'} workload, paired "
                 f"interleaved windows; negative = HEAD faster)"),
        "vs_baseline": 0.0,
        "n_pairs": n, "new_faster_in": wins,
        "sign_test_p": round(p, 4),
        "deltas_pct": [round(100.0 * d, 2) for d in deltas.tolist()],
    }))


if __name__ == "__main__":
    if "--ab" in sys.argv:
        i = sys.argv.index("--ab")
        ab_bench(sys.argv[i + 1], wide="--wide" in sys.argv)
    elif "--transit" in sys.argv:
        transit_bench()
    elif "--retrieval" in sys.argv:
        i = sys.argv.index("--retrieval")
        batch = (int(sys.argv[i + 1])
                 if len(sys.argv) > i + 1 and sys.argv[i + 1].isdigit()
                 else 64)
        retrieval_bench(batch=batch)
    elif "--hotjupiter" in sys.argv:
        hotjupiter_bench()
    elif "--wide" in sys.argv:
        wide_bench()
    elif "--opacity-exact" in sys.argv:
        opacity_bench(exact=True)
    elif "--opacity" in sys.argv:
        opacity_bench()
    elif "--gridstep" in sys.argv:
        gridstep_bench()
    else:
        main()
