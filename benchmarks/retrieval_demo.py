"""End-to-end gradient retrieval demo on TPU (VERDICT r3 item 1c).

Recovers an injected temperature profile from a synthetic observation
with optax Adam on the jitted, batched forward — the gradient-based
upgrade of the loop BART drives through run_transit
(/root/reference/transit/src/transit.c:118-122), where the reference
evaluates one gradient-free spectrum per MCMC sample per process.

Reports: convergence (max |T/T*-1|) and optimizer throughput in
gradient steps/s and spectra/s (batch x value_and_grad per step).

Usage: python benchmarks/retrieval_demo.py [--batch N] [--steps N] [--cpu]
                                           [--hj] [--hmc]

--hmc runs the gradient-based POSTERIOR SAMPLER instead of Adam point
estimation: vectorized-chain HMC (transit_tpu/retrieval.py) over an
8-knot log-temperature parametrization through the differentiable
forward, reporting acceptance, ESS/s, and credible-interval recovery of
the injected truth — the capability the reference's gradient-free BART
loop (transit.c:118-122, ~1 spectrum/sample/core) cannot offer.

--hj swaps in the multi-molecule hot-Jupiter workload (19001 wn x
100 layers x 200k lines, H2O+CO+CO2+CH4) — the BASELINE workload-3
shape — to show gradient retrieval at production scale.
"""

import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))


def main():
    batch = 32
    steps = 200
    if "--batch" in sys.argv:
        batch = int(sys.argv[sys.argv.index("--batch") + 1])
    if "--steps" in sys.argv:
        steps = int(sys.argv[sys.argv.index("--steps") + 1])
    import jax
    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax

    from transit_tpu import enable_compilation_cache
    enable_compilation_cache()
    from transit_tpu.config import TransitConfig
    from transit_tpu.model import TransitModel

    if "--hj" in sys.argv:
        from benchmarks.make_hotjupiter import make, DATA as HJ, WN_LO, \
            WN_HI
        if not os.path.exists(os.path.join(HJ, "hj.tli")):
            make()
        cfg = TransitConfig(
            atm=f"{HJ}/hj.atm", linedb=f"{HJ}/hj.tli",
            csfile=f"{HJ}/cia_H2_H2.dat,{HJ}/cia_H2_He.dat",
            molfile=f"{HJ}/molecules.dat",
            wnlow=WN_LO, wnhigh=WN_HI, wndelt=0.5, wnosamp=2160,
            wnfct=1.0, nwidth=20.0, ethreshold=1e-8,
            solution="eclipse", toomuch=1e30)
    else:
        from benchmarks.make_workload import (make, DATA, WN_LO, WN_HI,
                                              WN_DELT, WNOSAMP)
        if not os.path.exists(os.path.join(DATA, "bench.tli")):
            make()
        cfg = TransitConfig(
            atm=f"{DATA}/bench.atm", linedb=f"{DATA}/bench.tli",
            csfile=f"{DATA}/bench_cia.dat",
            molfile=f"{DATA}/molecules.dat",
            wnlow=WN_LO, wnhigh=WN_HI, wndelt=WN_DELT, wnosamp=WNOSAMP,
            wnfct=1.0, nwidth=20.0, ethreshold=1e-8,
            solution="eclipse", toomuch=1e30)
    model = TransitModel(cfg, dtype=jnp.float32, mode="fast", bands=6)
    dev = model.device_tree()
    t_true = jnp.asarray(model.atm.temp, model.dtype)
    q = jnp.asarray(model.atm.q, model.dtype)

    @jax.jit
    def spectrum(dev, t):
        return model.forward(t, q, dev=dev)

    target = spectrum(dev, t_true)
    norm = jnp.mean(target ** 2)

    if "--hmc" in sys.argv:
        return hmc_demo(model, dev, t_true, q, target, batch, steps)

    qs = jnp.broadcast_to(q[None], (batch,) + q.shape)

    def loss_batch(dev, logt):
        """Per-chain losses (batch,).  forward_batch folds the batch
        into the extinction kernel's layer axis — the hot path and its
        analytic VJP run unbatched (no vmap batching rules); summing
        the independent chain losses yields per-chain gradients."""
        spec = model.forward_batch(jnp.exp(logt), qs, dev=dev)
        return jnp.mean((spec - target[None, :]) ** 2, axis=1) / norm

    # A batch of independent chains from different perturbed starts
    # (the batched-sampler shape): one device program per Adam step
    # evaluates batch x (spectrum + gradient):
    opt = optax.adam(1e-2)
    rng = np.random.default_rng(5)
    x0 = jnp.asarray(np.log(np.asarray(t_true))[None, :] +
                     rng.uniform(-0.08, 0.08, (batch, t_true.shape[0])),
                     model.dtype)

    from functools import partial

    @partial(jax.jit, static_argnums=(2,))
    def chain(dev, x0, nsteps):
        def update(carry, _):
            x, state = carry
            (_, vals), grads = jax.value_and_grad(
                lambda lt: (lambda l: (jnp.sum(l), l))(
                    loss_batch(dev, lt)), has_aux=True)(x)
            ups, new_state = opt.update(grads, state)
            return (optax.apply_updates(x, ups), new_state), jnp.mean(vals)
        state = opt.init(x0)
        (x, _), losses = jax.lax.scan(update, (x0, state), None,
                                      length=nsteps)
        return x, losses

    # Compile + warm:
    x, losses = chain(dev, x0, 2)
    np.asarray(losses)
    t0 = time.perf_counter()
    x, losses = chain(dev, x0, steps)
    losses = np.asarray(losses)
    dt = time.perf_counter() - t0
    rel = np.abs(np.exp(np.asarray(x)) / np.asarray(t_true)[None, :] - 1.0)
    print(f"retrieval: batch={batch} steps={steps} "
          f"loss {losses[0]:.3e} -> {losses[-1]:.3e}")
    print(f"recovered |T/T*-1|: median {np.median(rel):.2e} "
          f"p95 {np.percentile(rel, 95):.2e}")
    print(f"throughput: {steps / dt:.2f} grad-steps/s = "
          f"{steps * batch / dt:.1f} grad-spectra/s "
          f"({dt / steps * 1e3:.1f} ms/step)")


def hmc_demo(model, dev, t_true, q, target, nchain, n_samples):
    import jax
    import jax.numpy as jnp
    from transit_tpu.retrieval import (hmc_sample, ess, gaussian_logprob,
                                       knot_profile)

    nchain = max(nchain, 64)
    nl = model.atm.nlayers
    nk = 8

    def fwd(z):
        return model.forward(knot_profile(jnp.exp(z), nl), q, dev=dev)

    z_true = jnp.log(jnp.full(
        (nk,), jnp.asarray(np.mean(np.asarray(t_true)), model.dtype)))
    obs = fwd(z_true)
    # ~1% photometric noise: a realistic likelihood width whose
    # posterior scale sets the leapfrog step below:
    sigma = 1e-2 * float(np.abs(np.asarray(obs)).mean())
    logprob = gaussian_logprob(fwd, obs, sigma,
                               prior_mean=float(z_true[0]),
                               prior_sigma=0.5)

    # Batched value-and-grad through forward_batch: the extinction
    # kernel sees the chains as extra layers (no vmap in the hot path):
    qs = jnp.broadcast_to(q[None], (nchain,) + q.shape)
    pm = jnp.asarray(float(z_true[0]), model.dtype)

    def vg_fn(X):
        def f(Xf):
            T = jax.vmap(lambda z: knot_profile(jnp.exp(z), nl))(Xf)
            spec = model.forward_batch(T, qs, dev=dev)
            r = (spec - obs[None, :]) / sigma
            pr = (Xf - pm) / 0.5
            lp = -0.5 * (jnp.sum(r * r, axis=1) + jnp.sum(pr * pr,
                                                          axis=1))
            return jnp.sum(lp), lp
        (_, lp), g = jax.value_and_grad(f, has_aux=True)(X)
        return lp, g

    key = jax.random.PRNGKey(7)
    kx, ks = jax.random.split(key)
    x0 = z_true[None, :] + 0.01 * jax.random.normal(
        kx, (nchain, nk), model.dtype)

    # Sampling runs in fixed-size chunks (one modest compiled program;
    # a single n_samples-long scan of leapfrog grads exceeds this
    # environment's remote-compile request limits), chaining the final
    # state into the next chunk:
    chunk = 10
    sample = jax.jit(lambda x0_, k_: hmc_sample(
        logprob, x0_, k_, step_size=1e-4, n_leapfrog=8,
        n_samples=chunk, vg_fn=vg_fn))
    s_, a_, st_ = sample(x0, ks)              # compile + warm
    np.asarray(a_)
    t0 = time.perf_counter()
    chunks, accepts = [], []
    x_cur = x0
    for i in range(-(-n_samples // chunk)):
        ks, kc = jax.random.split(ks)
        s_c, a_c, (x_cur, _) = sample(x_cur, kc)
        chunks.append(np.asarray(s_c))
        accepts.append(np.asarray(a_c))
    samples = np.concatenate(chunks)[:n_samples]
    accept = np.concatenate(accepts)[:n_samples]
    dt = time.perf_counter() - t0

    acc = float(np.asarray(accept, dtype=np.float64).mean())
    warm = max(n_samples // 5, 1)
    e = ess(samples[warm:])
    zt = np.asarray(z_true)
    flat = samples[warm:].reshape(-1, nk)
    mean, std = flat.mean(axis=0), flat.std(axis=0)
    cover = np.abs(mean - zt) < 3.0 * std + 1e-4
    grad_evals = n_samples * 8 * nchain          # leapfrog spectra+grads
    print(f"hmc: chains={nchain} samples={n_samples} knots={nk} "
          f"accept={acc:.2f}")
    print(f"posterior recovery: max |mean-z*| {np.abs(mean-zt).max():.2e}"
          f" (log-T), 3-sigma coverage {cover.sum()}/{nk}")
    print(f"throughput: {samples.shape[0] * nchain / dt:.1f} samples/s, "
          f"min ESS {e.min():.0f} -> {e.min() / dt:.1f} ESS/s "
          f"({grad_evals / dt:.0f} grad-spectra/s inside leapfrog)")
    print(f"wall {dt:.1f}s; reference frame: BART-style gradient-free "
          f"MCMC evaluates ~1.25 spectra/s/core with O(ndim) "
          f"random-walk mixing")


if __name__ == "__main__":
    main()
