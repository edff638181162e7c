"""Subprocess worker for the multi-host tests.

Usage: python multihost_worker.py PID NPROC PORT OUTPREFIX [exact|local]

Initializes jax.distributed with 2 virtual CPU devices per process, runs
the band-parallel spectrum (parallel/multihost.py) on the standard test
fixture, and writes OUTPREFIX.p{PID}.npz with the gathered spectrum,
block bounds, and the per-process line count / step timing.
"""

import os
import sys
import time


def main():
    pid, nproc = int(sys.argv[1]), int(sys.argv[2])
    port, out = sys.argv[3], sys.argv[4]
    ethresh_mode = sys.argv[5] if len(sys.argv) > 5 else "exact"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    jax.distributed.initialize(f"localhost:{port}", num_processes=nproc,
                               process_id=pid)
    assert jax.process_count() == nproc
    assert jax.device_count() == 2 * nproc

    import numpy as np
    import jax.numpy as jnp
    from transit_tpu.config import TransitConfig
    from transit_tpu.parallel.multihost import MultihostForward

    fix = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "fixtures")
    cfg = TransitConfig(
        atm=f"{fix}/test.atm", linedb=f"{fix}/test.tli",
        csfile=f"{fix}/test_cia.dat", molfile=f"{fix}/molecules.dat",
        wnlow=2000.0, wnhigh=2100.0, wndelt=1.0, wnosamp=216, wnfct=1.0,
        ndop=15, nlor=15, nwidth=20.0, ethreshold=1e-8,
        solution="eclipse", toomuch=1e30)
    runner = MultihostForward(cfg, bands=4,
                              exact_ethresh=(ethresh_mode == "exact"))
    temps = jnp.asarray(runner.model.atm.temp, runner.model.dtype)
    q = jnp.asarray(runner.model.atm.q, runner.model.dtype)
    spec = runner.forward(temps, q)          # includes compile
    t0 = time.perf_counter()
    spec = runner.forward(temps, q)
    dt = time.perf_counter() - t0

    # Differentiable path: global chi^2-style loss against a synthetic
    # deterministic observation, grads cross-summed over processes
    # (value_and_grad keeps the DCN reductions outside autodiff):
    wns_n = runner.model.wns_global.n
    obs = 0.5 * np.max(spec) * (1.0 + 0.1 * np.sin(
        np.linspace(0.0, 6.0, wns_n)))
    obs_j = jnp.asarray(obs, runner.model.dtype)

    def loss_fn(band_spec, blk):
        return jnp.sum((band_spec - obs_j[blk[0]:blk[1]]) ** 2)

    t1 = time.perf_counter()
    loss, (gt, gq) = runner.value_and_grad(loss_fn, temps, q)
    dgrad = time.perf_counter() - t1
    np.savez(f"{out}.p{pid}.npz", spec=spec, bounds=runner.bounds,
             n_local_lines=runner.n_local_lines, step_seconds=dt,
             block=np.asarray(runner.block),
             loss=np.asarray(loss), grad_t=np.asarray(gt),
             grad_q=np.asarray(gq), grad_seconds=dgrad, obs=obs)
    print(f"worker {pid}/{nproc}: block={runner.block} "
          f"lines={runner.n_local_lines} step={dt * 1e3:.1f} ms",
          flush=True)


if __name__ == "__main__":
    main()
