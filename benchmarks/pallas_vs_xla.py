"""Pallas-vs-XLA extinction kernel comparison (the BASELINE north-star
question: does a hand-scheduled Pallas kernel beat XLA's fusion on the
Voigt extinction?).

Methodology of benchmarks/RESULTS.md: same unbanded plan, 20-step
lax.scan over distinct temperature profiles (device-resident, dispatch
amortized), one TPU chip, f32.  The production banded+far-split jnp path
is measured alongside as the bar the Pallas kernel would have to clear
to become the default.

Run: python benchmarks/pallas_vs_xla.py
"""

import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))

from transit_tpu import enable_compilation_cache  # noqa: E402
enable_compilation_cache()

RUNS = 20


def time_scan(fn, temps, dens, Z, runs=RUNS):
    import jax
    import jax.numpy as jnp
    tstack = jnp.stack([temps + np.float32(0.01 * i)
                        for i in range(runs)])

    @jax.jit
    def scan_steps(ts):
        def body(c, tt):
            return c, fn(tt, dens, Z)
        _, out = jax.lax.scan(body, 0, ts)
        return out

    out = scan_steps(tstack)
    out.block_until_ready()
    t0 = time.perf_counter()
    out = scan_steps(tstack)
    out.block_until_ready()
    return (time.perf_counter() - t0) / runs


def main():
    import jax
    import jax.numpy as jnp
    from benchmarks.make_workload import (make, DATA, WN_LO, WN_HI,
                                          WN_DELT, WNOSAMP)
    from transit_tpu.config import TransitConfig
    from transit_tpu.model import TransitModel
    from transit_tpu.opacities import fast
    from transit_tpu.opacities.pallas_lbl import pallas_extinction

    if not os.path.exists(os.path.join(DATA, "bench.tli")):
        make()
    cfg = TransitConfig(
        atm=f"{DATA}/bench.atm", linedb=f"{DATA}/bench.tli",
        csfile=f"{DATA}/bench_cia.dat", molfile=f"{DATA}/molecules.dat",
        wnlow=WN_LO, wnhigh=WN_HI, wndelt=WN_DELT, wnosamp=WNOSAMP,
        wnfct=1.0, nwidth=20.0, ethreshold=1e-8,
        solution="eclipse", toomuch=1e30)
    m = TransitModel(cfg, mode="fast", dtype=jnp.float32)
    mb = TransitModel(cfg, mode="fast", dtype=jnp.float32, bands=4)
    temps = jnp.asarray(m.atm.temp * m.atm.tfct, jnp.float32)
    dens = jnp.asarray(m.atm.d, jnp.float32)
    Z = jnp.asarray(m.Z_layers, jnp.float32)
    mm = jnp.asarray(m.mol.mass, jnp.float32)
    mr = jnp.asarray(m.mol.radius, jnp.float32)
    kw = dict(wn_i=m.wns.i, dwn=m.wns.d, ethresh=cfg.ethreshold,
              nwidth=cfg.nwidth)

    t_jnp = time_scan(
        lambda t, d_, z: fast.fast_extinction(
            m.fplan, m.fdev, t, d_, z, mm, mr, **kw), temps, dens, Z)
    t_pal = time_scan(
        lambda t, d_, z: pallas_extinction(
            m.fplan, m.fdev, t, d_, z, mm, mr, **kw), temps, dens, Z)
    t_banded = time_scan(
        lambda t, d_, z: fast.banded_extinction(
            mb.bplan, mb.bdev, t, d_, z, mm, mr, **kw), temps, dens, Z)

    # Numerical agreement (pallas vs jnp, same plan):
    a = np.asarray(fast.fast_extinction(m.fplan, m.fdev, temps, dens, Z,
                                        mm, mr, **kw))
    b = np.asarray(pallas_extinction(m.fplan, m.fdev, temps, dens, Z,
                                     mm, mr, **kw))
    rel = float(np.max(np.abs(a - b) / (np.abs(a) + 1e-6 * a.max())))

    print(json.dumps({
        "metric": "pallas_vs_xla_extinction_ms",
        "pallas_ms": round(t_pal * 1e3, 2),
        "xla_same_plan_ms": round(t_jnp * 1e3, 2),
        "xla_banded_split_ms": round(t_banded * 1e3, 2),
        "pallas_max_rel_vs_xla": rel,
        "unit": "ms/step, 100 layers x 2001 wn x 20k lines, f32, "
                f"{RUNS}-step scan",
    }))


if __name__ == "__main__":
    main()
