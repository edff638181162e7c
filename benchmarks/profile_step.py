"""Per-stage timing of the forward step on the current default device.

Times each pipeline stage as its own jitted function on the standard
workload, to find where the full-step wall time goes.
Usage: python benchmarks/profile_step.py [cpu]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, runs=10):
    out = fn(*args)
    jax_block(out)
    t0 = time.perf_counter()
    for _ in range(runs):
        out = fn(*args)
    jax_block(out)
    return (time.perf_counter() - t0) / runs


def jax_block(x):
    import jax
    jax.tree_util.tree_map(
        lambda a: a.block_until_ready() if hasattr(a, "block_until_ready")
        else a, x)


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
    from transit_tpu.opacities.cia import cs_extinction
    from transit_tpu.rt import tau as rt_tau
    from transit_tpu.rt.emission import eclipse_intensity, flux

    if not os.path.exists(os.path.join(DATA, "bench.tli")):
        make()
    cfg = TransitConfig(
        atm=f"{DATA}/bench.atm", linedb=f"{DATA}/bench.tli",
        csfile=f"{DATA}/bench_cia.dat", molfile=f"{DATA}/molecules.dat",
        wnlow=WN_LO, wnhigh=WN_HI, wndelt=WN_DELT, wnosamp=WNOSAMP,
        wnfct=1.0, nwidth=20.0, ethreshold=1e-8,
        solution="eclipse", toomuch=1e30)
    model = TransitModel(cfg, dtype=jnp.float32, mode="fast", bands=6)
    dt_ = model.dtype
    temps_raw = jnp.asarray(model.atm.temp, dt_)
    q = jnp.asarray(model.atm.q, dt_)
    temps = temps_raw * model.atm.tfct
    dens = jnp.asarray(model.atm.d, dt_)
    Z = model.partition_jnp(temps_raw)
    molm = jnp.asarray(model.mol.mass, dt_)
    molr = jnp.asarray(model.mol.radius, dt_)
    W = jnp.asarray(model.W, dt_)
    wns_cgs = jnp.asarray(model.wns.v * model.wns.fct, dt_)
    kw = dict(wn_i=model.wns.i, dwn=model.wns.d,
              ethresh=cfg.ethreshold, nwidth=cfg.nwidth)

    ex_f = jax.jit(lambda t, d_, z: fast.banded_extinction(
        model.bplan, model.bdev, t, d_, z, molm, molr, **kw))
    print(f"extinction:      {timeit(ex_f, temps, dens, Z)*1e3:8.2f} ms",
          flush=True)

    pf_f = jax.jit(model.partition_jnp)
    print(f"partition:       {timeit(pf_f, temps_raw)*1e3:8.2f} ms",
          flush=True)

    cs_f = jax.jit(lambda t, d_: cs_extinction(
        model.cs_tables, model.cs_pre, model.wns.v, t, d_, molm,
        model.cs_species))
    print(f"cia:             {timeit(cs_f, temps, dens)*1e3:8.2f} ms",
          flush=True)

    ex0 = ex_f(temps, dens, Z)
    er = ex0.T
    tau_f = jax.jit(lambda e: rt_tau.optical_depth(e, W, model.rfct))
    print(f"tau matmul:      {timeit(tau_f, er)*1e3:8.2f} ms", flush=True)

    tau0 = tau_f(er)
    last_f = jax.jit(lambda tt: rt_tau.last_index(tt, cfg.toomuch))
    print(f"last_index:      {timeit(last_f, tau0)*1e3:8.2f} ms", flush=True)
    last0 = last_f(tau0)

    def em(tt, ll, T):
        temp_rev = T[::-1]
        intens = jnp.stack([eclipse_intensity(tt, ll, wns_cgs, temp_rev, a)
                            for a in model.angles])
        return flux(intens, model.angles)
    em_f = jax.jit(em)
    print(f"emission(5 ang): {timeit(em_f, tau0, last0, temps)*1e3:8.2f} ms",
          flush=True)

    fwd = jax.jit(model.forward)
    print(f"full forward:    {timeit(fwd, temps_raw, q)*1e3:8.2f} ms",
          flush=True)

    # dispatch floor: trivial jitted fn
    triv = jax.jit(lambda a: a * 2.0)
    print(f"trivial jit:     {timeit(triv, temps)*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
