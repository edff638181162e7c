"""ExoMol-scale line-list demo: 1e8-line TLI, band-sharded loading.

BASELINE workload 4 is a ~1e9-line (Yurchenko CH4 via repack) list sharded
across hosts.  This script demonstrates the machinery at 1e8 lines
(2.6 GB TLI) on one machine:

  1. compile a synthetic 1e8-line TLI (once; ~2.6 GB on disk),
  2. per-"host" band loading with io.tli.read_tli_band — memmap binary
     search per isotope, so a host touches only its band's bytes
     (O(band) IO, independent of total list size; the 1e9-line case is
     the same call),
  3. band-local fast-plan build (the per-device tile bucketing),
  4. optional: one extinction block on the default device (--compute).

Usage: python benchmarks/exomol_scale.py [--nlines N] [--hosts H] [--compute]
"""

import os
import resource
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
DATA = os.path.join(HERE, "data", "exomol")
sys.path.insert(0, os.path.dirname(HERE))


def rss_gb():
    """Peak RSS of this process in GB."""
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6

WN_LO, WN_HI = 500.0, 10000.0
CENTERS = [(1306.0, 250.0), (3019.0, 300.0), (4300.0, 250.0),
           (6000.0, 250.0), (1600.0, 500.0), (3750.0, 400.0)]


def make(nlines=100_000_000, data_dir=DATA):
    from transit_tpu.io.tli import (TliData, TliDatabase, TliIsotope,
                                    write_tli)
    os.makedirs(data_dir, exist_ok=True)
    path = os.path.join(data_dir, f"exomol_{nlines}.tli")
    if os.path.exists(path):
        return path
    rng = np.random.default_rng(7)
    t0 = time.time()
    # Band-clustered wavenumbers, generated in chunks:
    nuni = int(0.15 * nlines)
    per = (nlines - nuni) // len(CENTERS)
    parts = [rng.uniform(WN_LO, WN_HI, nuni)]
    for c, w in CENTERS:
        parts.append(np.clip(rng.normal(c, w, per), WN_LO - 20, WN_HI + 20))
        print(f"  + cluster {c}: {time.time()-t0:.1f}s "
              f"(RSS {rss_gb():.1f} GB)", flush=True)
    wn = np.concatenate(parts)[:nlines]
    del parts
    n = wn.shape[0]
    wl = 1e4 / wn
    del wn
    print(f"  wl ready: {time.time()-t0:.1f}s (RSS {rss_gb():.1f} GB)",
          flush=True)
    isoid = (rng.random(n) < 0.02).astype(np.int16)   # 2% secondary isotope
    elow = rng.uniform(0.0, 9000.0, n)
    print(f"  elow ready: {time.time()-t0:.1f}s (RSS {rss_gb():.1f} GB)",
          flush=True)
    gf = 10.0 ** rng.uniform(-10.0, -2.0, n)
    print(f"generated {n} lines in {time.time()-t0:.1f}s "
          f"(RSS {rss_gb():.1f} GB)", flush=True)

    # sort by (isotope, wavelength) — the TLI contract (native radix
    # argsort; falls back to np.lexsort without the extension):
    t0 = time.time()
    from transit_tpu.lineread.compile import sort_iso_wl
    order = sort_iso_wl(isoid, wl)
    wl = wl[order]; isoid = isoid[order]
    elow = elow[order]; gf = gf[order]
    del order
    isotran = np.bincount(isoid, minlength=2).astype(np.uint64)
    print(f"sorted in {time.time()-t0:.1f}s (RSS {rss_gb():.1f} GB)",
          flush=True)

    t_pf = np.arange(70.0, 3020.0, 50.0)
    dbs = [TliDatabase("synth-exomol-ch4", "CH4", t_pf, [
        TliIsotope("CH4-1", 16.0425, 0.98842, 600.0 * (t_pf / 296.0) ** 1.6),
        TliIsotope("CH4-2", 17.0423, 0.01110, 620.0 * (t_pf / 296.0) ** 1.6),
    ])]
    t0 = time.time()
    write_tli(path, TliData(version=6, iwav=float(wl.min()),
                            fwav=float(wl.max()), databases=dbs, wl=wl,
                            isoid=isoid, elow=elow, gf=gf,
                            isotran=isotran))
    print(f"wrote {os.path.getsize(path)/1e9:.2f} GB in "
          f"{time.time()-t0:.1f}s (RSS {rss_gb():.1f} GB)", flush=True)
    return path


def main():
    nlines = 100_000_000
    hosts = 8
    if "--nlines" in sys.argv:
        nlines = int(sys.argv[sys.argv.index("--nlines") + 1])
    if "--hosts" in sys.argv:
        hosts = int(sys.argv[sys.argv.index("--hosts") + 1])
    path = make(nlines)

    from transit_tpu.io.tli import read_tli_band
    from transit_tpu.parallel.multihost import balanced_blocks

    # Line-count-balanced per-host bands via memmap bisection (the
    # production split, parallel/multihost.py; O(hosts*log N) page
    # touches regardless of list size):
    dwn_split = 0.01
    wns_v = np.arange(WN_LO, WN_HI + dwn_split / 2, dwn_split)
    t0 = time.time()
    bounds = balanced_blocks(path, wns_v, hosts)
    print(f"balanced_blocks: {hosts} bands over {len(wns_v):,} bins in "
          f"{time.time()-t0:.2f}s (RSS {rss_gb():.1f} GB)", flush=True)
    edges = wns_v[np.clip(bounds, 0, len(wns_v) - 1)].astype(float)
    edges[0], edges[-1] = WN_LO, WN_HI
    total = 0
    t_all = time.time()
    sizes = []
    for h in range(hosts):
        wn_lo, wn_hi = edges[h], edges[h + 1]
        t0 = time.time()
        band = read_tli_band(path, 1e4 / wn_hi, 1e4 / wn_lo)
        dt = time.time() - t0
        sizes.append(band.wl.shape[0])
        total += band.wl.shape[0]
        print(f"host {h}: band {wn_lo:7.1f}-{wn_hi:7.1f} cm-1  "
              f"{band.wl.shape[0]:>11,} lines in {dt:5.2f}s "
              f"({band.wl.shape[0]*26/dt/1e6:7.1f} MB/s)", flush=True)
    print(f"all {hosts} bands: {total:,} lines "
          f"(imbalance max/mean {max(sizes)/ (total/hosts):.2f}) in "
          f"{time.time()-t_all:.1f}s (RSS {rss_gb():.1f} GB)", flush=True)

    # Band-local plan build for one host (tile bucketing, host-side):
    from transit_tpu.opacities import fast
    h = hosts // 2
    band = read_tli_band(path, 1e4 / edges[h + 1], 1e4 / edges[h])
    wavn = 1.0 / (band.wl * 1e-4)
    dwn = 0.05
    n_coarse = int((edges[h + 1] - edges[h]) / dwn)
    t0 = time.time()
    plan = fast.make_fast_plan(wavn, band.isoid, band.elow, band.gf,
                               wn_i=float(edges[h]), dwn=dwn,
                               n_coarse=n_coarse, max_width=0.05,
                               nwidth=20.0, classes=True)
    print(f"band plan: {plan.ntiles} tiles x lmax {plan.lmax} "
          f"(tw {plan.tw}) built in {time.time()-t0:.1f}s", flush=True)

    if "--compute" in sys.argv:
        import jax
        import jax.numpy as jnp
        iso = type("I", (), {})()
        iso.mass = np.array([16.0425, 17.0423])
        iso.ratio = np.array([0.98842, 0.0111])
        iso.imol = np.array([0, 0])
        d = fast.fast_device_arrays(plan, iso, dtype=jnp.float32)
        nl = 8
        temps = jnp.linspace(1500.0, 1700.0, nl)
        dens = jnp.full((1, nl), 1e-6)
        Z = jnp.full((2, nl), 600.0)
        molm = jnp.asarray([16.0425]); molr = jnp.asarray([2.0e-8])
        f = jax.jit(lambda t, dd, z: fast.fast_extinction(
            plan, d, t, dd, z, molm, molr, wn_i=float(edges[h]), dwn=dwn,
            ethresh=1e-8, nwidth=20.0))
        out = f(temps, dens, Z); out.block_until_ready()
        t0 = time.time()
        out = f(temps + 1.0, dens, Z); out.block_until_ready()
        dt = time.time() - t0
        print(f"band extinction ({nl} layers x {n_coarse} bins x "
              f"{band.wl.shape[0]:,} lines): {dt:.2f}s", flush=True)


def spectrum_step(nlines, hosts):
    """BASELINE workload 4, executed: one host's band of an nlines-line
    TLI through the FULL production path — balanced_blocks split,
    read_tli_band wing-margined band load, band-local banded tile plans,
    and a complete spectrum step (extinction + tau + intensity + flux)
    on the default device.  Every other host runs the identical program
    on its own band (tests/test_multihost.py proves the N-process
    assembly); this measures the per-host cost at scale."""
    path = make(nlines)
    import jax.numpy as jnp
    from transit_tpu import enable_compilation_cache
    enable_compilation_cache()
    from transit_tpu.config import TransitConfig
    from transit_tpu.parallel.multihost import build_band_model
    from benchmarks.make_workload import make as make_small, DATA as WDATA
    if not os.path.exists(os.path.join(WDATA, "bench.atm")):
        make_small()
    cfg = TransitConfig(
        atm=f"{WDATA}/bench.atm", linedb=path,
        molfile=f"{WDATA}/molecules.dat",
        wnlow=WN_LO, wnhigh=WN_HI, wndelt=0.02, wnosamp=216, wnfct=1.0,
        nwidth=20.0, ethreshold=1e-8, solution="eclipse", toomuch=1e30)
    pid = hosts // 2
    t0 = time.time()
    model, blk, _ = build_band_model(cfg, hosts, pid, bands=4)
    print(f"band model (host {pid}/{hosts}): bins {blk}, "
          f"{model.tli.n_lines:,} lines, built in {time.time()-t0:.1f}s "
          f"(RSS {rss_gb():.1f} GB)", flush=True)
    temps = jnp.asarray(model.atm.temp, model.dtype)
    q = jnp.asarray(model.atm.q, model.dtype)
    fwd = model.make_forward()
    t0 = time.time()
    spec = np.asarray(fwd(temps, q))
    print(f"band spectrum: compile + first step {time.time()-t0:.1f}s "
          f"(RSS {rss_gb():.1f} GB)", flush=True)
    t0 = time.time()
    spec = np.asarray(fwd(temps + 1.0, q))
    dt = time.time() - t0
    nl = model.atm.nlayers
    assert np.all(np.isfinite(spec))
    print(f"band spectrum step: {model.wns.n} bins x {nl} layers x "
          f"{model.tli.n_lines:,} lines in {dt:.2f}s "
          f"({model.wns.n * nl / dt:.3g} points*layers/s)", flush=True)


def par_stream_demo(nlines=20_000_000, data_dir=DATA):
    """HITEMP-scale .par route: write a synthetic multi-GB
    wavenumber-sorted .par in chunks, then compile a window through the
    streamed HitranReader (binary-search record bounds + chunked parse)
    and report peak RSS — constant in file size.

    20M records = 3.2 GB (HITEMP H2O is ~10 GB at the same layout).
    Usage: python benchmarks/exomol_scale.py --par [--nlines N]
    """
    import resource
    from transit_tpu.lineread.hitran import HitranReader

    os.makedirs(data_dir, exist_ok=True)
    path = os.path.join(data_dir, f"par_{nlines}.par")
    if not os.path.exists(path):
        t0 = time.time()
        rng = np.random.default_rng(11)
        chunk = 1_000_000
        wn_lo, wn_hi = 500.0, 10000.0
        edges = np.linspace(wn_lo, wn_hi, nlines // chunk + 1)
        with open(path, "w") as f:
            for c in range(nlines // chunk):
                wn = np.sort(rng.uniform(edges[c], edges[c + 1], chunk))
                el = rng.uniform(0.0, 3000.0, chunk)
                a21 = 10.0 ** rng.uniform(-3, 1, chunk)
                rows = [
                    f" 61{w:12.6f}{1e-20:10.3E}{a:10.3E}0.0500"
                    f"0.070{e:10.4f}0.75" + f"{0.0:8.6f}" + " " * 60 +
                    "000000" + " " * 12 + " " + f"{10.0:7.1f}"
                    f"{11.0:7.1f}"
                    for w, e, a in zip(wn, el, a21)]
                f.write("\n".join(rows) + "\n")
        print(f"wrote {path} ({os.path.getsize(path)/1e9:.2f} GB) in "
              f"{time.time()-t0:.0f}s", flush=True)

    size_gb = os.path.getsize(path) / 1e9
    rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    r = HitranReader(path)
    t0 = time.time()
    wl, gf, elow, isoid = r.read(1e4 / 3300.0, 1e4 / 2700.0)
    dt = time.time() - t0
    rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    print(f".par streamed window read: {wl.shape[0]:,} lines from a "
          f"{size_gb:.2f} GB file in {dt:.1f}s; peak RSS {rss1:.2f} GB "
          f"(start {rss0:.2f} GB) — constant in file size "
          f"(chunk = {r.CHUNK_RECORDS:,} records)", flush=True)


if __name__ == "__main__":
    if "--par" in sys.argv:
        n = (int(sys.argv[sys.argv.index("--nlines") + 1])
             if "--nlines" in sys.argv else 20_000_000)
        par_stream_demo(nlines=n)
    elif "--spectrum" in sys.argv:
        n = (int(sys.argv[sys.argv.index("--nlines") + 1])
             if "--nlines" in sys.argv else 100_000_000)
        h = (int(sys.argv[sys.argv.index("--hosts") + 1])
             if "--hosts" in sys.argv else 32)
        spectrum_step(n, h)
    else:
        main()
