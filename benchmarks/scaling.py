"""Scaling-efficiency measurement for the wavenumber-sharded path.

Real multi-chip hardware is not available in this environment; this script
measures the sharded step on an N-way virtual CPU device mesh
(xla_force_host_platform_device_count), which validates the decomposition
and load balance.  CAVEAT: virtual CPU devices share the machine's physical
cores (XLA CPU already multithreads a single device across all of them), so
wall-clock "efficiency" here reflects core contention, not the
decomposition — per-device compute is what scales on a real slice, where
each mesh entry owns a whole chip.  On a real slice, run unchanged with
JAX's default TPU devices.
"""

import os
import sys
import time

if __name__ == "__main__":
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                               " --xla_force_host_platform_device_count=8")

import numpy as np


def main(platform="cpu"):
    import jax
    if platform:
        jax.config.update("jax_platforms", platform)
    import jax.numpy as jnp
    from jax.sharding import Mesh
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from benchmarks.make_workload import (make, DATA, WN_LO, WN_HI,
                                          WN_DELT, WNOSAMP)
    from transit_tpu.config import TransitConfig
    from transit_tpu.model import TransitModel
    from transit_tpu.parallel.sharded import make_sharded_forward

    if not os.path.exists(os.path.join(DATA, "bench.tli")):
        make()
    cfg = TransitConfig(
        atm=f"{DATA}/bench.atm", linedb=f"{DATA}/bench.tli",
        csfile=f"{DATA}/bench_cia.dat", molfile=f"{DATA}/molecules.dat",
        wnlow=WN_LO, wnhigh=WN_HI, wndelt=WN_DELT, wnosamp=WNOSAMP,
        wnfct=1.0, nwidth=20.0, ethreshold=1e-8,
        solution="eclipse", toomuch=1e30)
    model = TransitModel(cfg, dtype=jnp.float32, mode="fast")
    temps = jnp.asarray(model.atm.temp, dtype=model.dtype)
    q = jnp.asarray(model.atm.q, dtype=model.dtype)

    results = {}
    devs = jax.devices()
    for n in (1, 2, 4, 8):
        if n > len(devs):
            break
        mesh = Mesh(np.array(devs[:n]).reshape(1, n), ("batch", "wn"))
        step = make_sharded_forward(model, mesh)
        out = step(temps, q)
        out.block_until_ready()
        t0 = time.perf_counter()
        for i in range(3):
            out = step(temps + np.float32(0.01 * i), q)
        out.block_until_ready()
        dt = (time.perf_counter() - t0) / 3
        results[n] = dt
        eff = results[1] / (n * dt) if 1 in results else 1.0
        print(f"n={n}  step={dt:.3f}s  speedup={results[1]/dt:.2f}x  "
              f"efficiency={eff*100:.0f}%")
    return results


if __name__ == "__main__":
    main()
