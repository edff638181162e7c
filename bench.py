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

BASELINE_C_POINTS_PER_S = 2000 * 100 / 0.80


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

    step = jax.jit(model.forward)
    out = step(temps, q)
    out.block_until_ready()          # compile + warmup

    runs = 5
    t0 = time.perf_counter()
    for i in range(runs):
        out = step(temps + np.float32(0.01 * i), q)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / runs

    nwn = model.wns.n
    nl = model.atm.nlayers
    value = nwn * nl / dt
    print(json.dumps({
        "metric": "wn_points_x_layers_per_s",
        "value": round(value, 1),
        "unit": f"points*layers/s (full step, {nwn}wn x {nl}layers, "
                f"20k lines, f32)",
        "vs_baseline": round(value / BASELINE_C_POINTS_PER_S, 3),
    }))


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
    step = jax.jit(jax.vmap(model.forward))
    out = step(temps, qs)
    out.block_until_ready()
    runs = 3
    t0 = time.perf_counter()
    for i in range(runs):
        out = step(temps + np.float32(0.01 * i), qs)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / runs
    value = batch / dt
    print(json.dumps({
        "metric": "retrieval_spectra_per_s",
        "value": round(value, 2),
        "unit": f"spectra/s (vmap batch {batch}, {model.wns.n}wn x "
                f"{model.atm.nlayers}layers, f32)",
        "vs_baseline": round(value / (1.0 / 0.80), 3),
    }))


if __name__ == "__main__":
    if "--retrieval" in sys.argv:
        retrieval_bench()
    else:
        main()
