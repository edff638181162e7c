"""Multi-process (multi-host analogue) scaling measurement.

Unlike benchmarks/scaling.py (virtual devices inside ONE process, where
XLA CPU already multithreads each dispatch across every core), this
drives real OS processes through jax.distributed + the band-parallel
runner (parallel/multihost.py), with each process PINNED TO ITS OWN CORE
(sched_setaffinity) and one single-threaded XLA CPU device.  That makes
the 2-process run a faithful miniature of 2 hosts: disjoint compute
resources, line-balanced wavenumber bands, and the two DCN collectives
(kmax max-reduce + spectrum all-gather) on the wire.

    efficiency(N) = T(1 process) / (N * T(N processes, wall))

Run:  python benchmarks/multihost_scaling.py            # driver
      (spawns its own workers; prints a table + JSON line)
"""

import json
import os
import socket
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
STEPS = 5


def worker(pid, nproc, port):
    os.sched_setaffinity(0, {pid % os.cpu_count()})
    os.environ["XLA_FLAGS"] = (
        "--xla_force_host_platform_device_count=1 "
        "--xla_cpu_multi_thread_eigen=false intra_op_parallelism_threads=1")
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(f"localhost:{port}", num_processes=nproc,
                               process_id=pid)
    import jax.numpy as jnp
    sys.path.insert(0, REPO)
    from benchmarks.make_workload import (make, DATA, WN_LO, WN_HI,
                                          WN_DELT, WNOSAMP)
    from transit_tpu.config import TransitConfig
    from transit_tpu.parallel.multihost import MultihostForward

    if not os.path.exists(os.path.join(DATA, "bench.tli")):
        make()
    cfg = TransitConfig(
        atm=os.path.join(DATA, "bench.atm"),
        linedb=os.path.join(DATA, "bench.tli"),
        csfile=os.path.join(DATA, "bench_cia.dat"),
        molfile=os.path.join(DATA, "molecules.dat"),
        wnlow=WN_LO, wnhigh=WN_HI, wndelt=WN_DELT, wnosamp=WNOSAMP,
        wnfct=1.0, solution="eclipse", toomuch=1e30, ethreshold=1e-8)
    runner = MultihostForward(cfg, bands=4, dtype=jnp.float32)
    temps = jnp.asarray(runner.model.atm.temp, runner.model.dtype)
    q = jnp.asarray(runner.model.atm.q, runner.model.dtype)
    runner.forward(temps, q)                      # compile
    t0 = time.perf_counter()
    for _ in range(STEPS):
        spec = runner.forward(temps, q)
    dt = (time.perf_counter() - t0) / STEPS

    # Component decomposition for the N>=8 crossover model: band-local
    # compute (no DCN) vs the two collectives at their real payload
    # sizes (the kmax (nl,) max-reduce and the (span_max,) spectrum
    # gather):
    import numpy as np
    kg = runner._global_kmax(temps)
    args = (temps, q, kg) if kg is not None else (temps, q)
    np.asarray(runner._step(*args))
    t0 = time.perf_counter()
    for _ in range(STEPS):
        np.asarray(runner._step(*args))
    t_local = (time.perf_counter() - t0) / STEPS
    t_coll = 0.0
    if nproc > 1:
        from jax.experimental import multihost_utils
        nl = runner.model.atm.nlayers
        payloads = [jnp.zeros(nl, runner.model.dtype) + pid,
                    jnp.zeros(runner.span_max, runner.model.dtype) + pid]
        for _ in range(3):                       # warm both
            for p in payloads:
                np.asarray(multihost_utils.process_allgather(p))
        reps = 10
        t0 = time.perf_counter()
        for _ in range(reps):
            for p in payloads:
                np.asarray(multihost_utils.process_allgather(p))
        t_coll = (time.perf_counter() - t0) / reps
    print(json.dumps({
        "pid": pid, "nproc": nproc, "step_s": dt, "local_s": t_local,
        "collective_s": t_coll,
        "n_local_lines": int(runner.n_local_lines),
        "block": [int(b) for b in runner.block],
        "spec_sum": float(spec.sum())}), flush=True)


def run_config(nproc):
    port = None
    s = socket.socket(); s.bind(("localhost", 0))
    port = s.getsockname()[1]; s.close()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    procs = [subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--worker", str(i),
         str(nproc), str(port)], env=env, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True) for i in range(nproc)]
    rows = []
    for p in procs:
        out, _ = p.communicate(timeout=3600)
        if p.returncode != 0:
            raise RuntimeError(f"worker failed:\n{out[-3000:]}")
        rows.append(json.loads(out.strip().splitlines()[-1]))
    return rows


def main():
    import math
    model = "--model" in sys.argv
    configs = (1, 2, 4) if model else (1, 2)
    results = {}
    for nproc in configs:
        rows = run_config(nproc)
        step = max(r["step_s"] for r in rows)
        lines = [r["n_local_lines"] for r in rows]
        results[nproc] = {
            "step_s": step, "lines": lines,
            "local_s": max(r["local_s"] for r in rows),
            "coll_s": max(r["collective_s"] for r in rows),
            "spec_sum": rows[0]["spec_sum"]}
        print(f"nproc={nproc}: step {step * 1e3:.1f} ms "
              f"(local {results[nproc]['local_s'] * 1e3:.1f} ms, "
              f"collectives {results[nproc]['coll_s'] * 1e3:.2f} ms), "
              f"per-process lines {lines}")
    t1 = results[1]["step_s"]
    t2 = results[2]["step_s"]
    eff = t1 / (2.0 * t2)
    agree = abs(results[1]["spec_sum"] / results[2]["spec_sum"] - 1.0)
    print(json.dumps({
        "metric": "multihost_scaling_efficiency_2proc",
        "value": round(eff, 4), "unit": "T1/(2*T2), core-pinned CPU",
        "t1_ms": round(t1 * 1e3, 1), "t2_ms": round(t2 * 1e3, 1),
        "line_balance": results[2]["lines"],
        "spectrum_rel_agreement": agree}))

    if model:
        # Crossover model (VERDICT r3 item 8).  Per-step wall at N
        # processes: T(N) = T_compute(1)/N * balance + C(N), with C(N)
        # the two collectives.  C is latency-dominated at these payload
        # sizes (nl + W/N floats); fit C(N) = c0 + c1*log2(N) from the
        # measured N=2 and N=4 collective times (N=4 is 2x
        # oversubscribed on this 2-core host, which inflates its
        # scheduling latency — the fit is therefore conservative):
        c2, c4 = results[2]["coll_s"], results[4]["coll_s"]
        c1 = (c4 - c2) / (math.log2(4) - math.log2(2))
        c0 = c2 - c1 * math.log2(2)
        tc1 = results[1]["local_s"]
        bal = max(results[2]["lines"]) / (
            sum(results[2]["lines"]) / len(results[2]["lines"]))
        print("\n  N    T_comp(ms)  C(ms)   T(ms)    efficiency")
        table = {}
        for n in (2, 4, 8, 16, 32):
            cn = max(c0 + c1 * math.log2(n), 0.0)
            tn = tc1 / n * bal + cn
            e = tc1 / (n * tn)
            table[n] = e
            print(f"{n:4d}   {tc1 / n * bal * 1e3:9.1f}  {cn * 1e3:6.2f}"
                  f"  {tn * 1e3:7.1f}   {e:8.3f}")
        print(json.dumps({
            "metric": "multihost_efficiency_model",
            "c0_ms": round(c0 * 1e3, 3), "c1_ms": round(c1 * 1e3, 3),
            "t_compute1_ms": round(tc1 * 1e3, 1),
            "line_balance_factor": round(bal, 3),
            "predicted_efficiency": {str(n): round(e, 3)
                                     for n, e in table.items()}}))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])
    else:
        main()
