"""TPU sweep: extinction-only step time vs banding/tile-width choices.

Times just the line-extinction kernel (the dominant cost) on the standard
workload for several plan configurations, to pick defaults for real
hardware.  Usage: python benchmarks/sweep_tw.py [cpu]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    if len(sys.argv) > 1 and sys.argv[1] == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from benchmarks.make_workload import (make, DATA, WN_LO, WN_HI,
                                          WN_DELT, WNOSAMP)
    from transit_tpu.config import TransitConfig
    from transit_tpu.model import TransitModel
    from transit_tpu.opacities import fast

    if not os.path.exists(os.path.join(DATA, "bench.tli")):
        make()
    cfg = TransitConfig(
        atm=f"{DATA}/bench.atm", linedb=f"{DATA}/bench.tli",
        csfile=f"{DATA}/bench_cia.dat", molfile=f"{DATA}/molecules.dat",
        wnlow=WN_LO, wnhigh=WN_HI, wndelt=WN_DELT, wnosamp=WNOSAMP,
        wnfct=1.0, nwidth=20.0, ethreshold=1e-8,
        solution="eclipse", toomuch=1e30)
    model = TransitModel(cfg, dtype=jnp.float32, mode="fast")
    temps = jnp.asarray(model.atm.temp * model.atm.tfct, model.dtype)
    q = jnp.asarray(model.atm.q, model.dtype)
    dens = jnp.asarray(model.atm.d, model.dtype)
    Z = model.partition_jnp(jnp.asarray(model.atm.temp, model.dtype))
    molm = jnp.asarray(model.mol.mass, model.dtype)
    molr = jnp.asarray(model.mol.radius, model.dtype)
    kw = dict(wn_i=model.wns.i, dwn=model.wns.d,
              ethresh=cfg.ethreshold, nwidth=cfg.nwidth)
    aL, aDf = fast.layer_width_bounds(model.atm, model.mol,
                                      model.iso.mass, model.iso.imol)
    lines = (model.fplan.wavn, model.fplan.isoid, model.fplan.elow,
             model.fplan.gf)

    def timeit(fn, *args, runs=20):
        """Steady-state per-step time: ``runs`` steps as one lax.scan
        device program (the tunnel's ~3.5 ms dispatch round-trip would
        otherwise dominate a multi-ms kernel)."""
        tstack = jnp.stack([args[0] + np.float32(0.01 * i)
                            for i in range(runs)])

        @jax.jit
        def scan_steps(ts, *rest):
            def body(c, tt):
                return c, fn(tt, *rest)[0, ::64]
            _, out = jax.lax.scan(body, 0, ts)
            return out

        out = scan_steps(tstack, *args[1:])
        out.block_until_ready()
        t0 = time.perf_counter()
        out = scan_steps(tstack, *args[1:])
        out.block_until_ready()
        return (time.perf_counter() - t0) / runs

    # unbanded baseline:
    f0 = jax.jit(lambda t, d_, z: fast.fast_extinction(
        model.fplan, model.fdev, t, d_, z, molm, molr, **kw))
    dt = timeit(f0, temps, dens, Z)
    print(f"unbanded tw={model.fplan.tw}: {dt*1e3:8.2f} ms", flush=True)

    for tw_scale in (0.5, 1.0, 2.0, 4.0):
        for split in (False, True):
            bp = fast.make_banded_plans(
                *lines, wn_i=model.wns.i, dwn=model.wns.d,
                n_coarse=model.wns.n, aL_layers=aL, aDf_layers=aDf,
                wn_max=model.wns.f, nwidth=cfg.nwidth, max_bands=6,
                tw_scale=tw_scale, split_far=split)
            bd = fast.banded_device_arrays(bp, model.iso, dtype=model.dtype)
            fb = jax.jit(lambda t, d_, z: fast.banded_extinction(
                bp, bd, t, d_, z, molm, molr, **kw))
            dt = timeit(fb, temps, dens, Z)
            shape = ",".join(f"{p.tw}x{p.ntiles}" for p in bp.plans)
            print(f"banded tw_scale={tw_scale:4.1f} split={int(split)} "
                  f"[{shape}]: {dt*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
