"""Benchmark: batched GP log-likelihood throughput at N=5000.

Primary metric (BASELINE.md): GP log-likelihood evaluations/sec at
N = 5k points with a DRW+Lorentzian (null+QPO) kernel — the kernel every
MCMC step of the LRT bootstrap executes, batched over
(simulations x walkers).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the reference publishes no numbers (BASELINE.md), so the
baseline is an explicit estimate of the celerite+emcee CPU pipeline the
reference runs: ~8k evals/s/core for celerite's C++ O(N) solver at
N=5k, R=4 (~0.2 ms/eval) on the reference's typical 12-core setup
-> 96,000 evals/s.  vs_baseline = measured / 96,000.  (The >= 100x
target of BASELINE.md corresponds to vs_baseline >= 100.)
"""
from __future__ import annotations

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

CPU_PIPELINE_BASELINE_EVALS_PER_SEC = 96_000.0


def main():
    from mind_the_gaps_tpu.kernels import DampedRandomWalk, Lorentzian
    from mind_the_gaps_tpu.solver import log_likelihood

    n_points = 5000
    rng = np.random.default_rng(0)
    t = jnp.asarray(np.cumsum(rng.uniform(2.0, 8.0, n_points)))
    y = jnp.asarray(rng.normal(0.0, 2.0, n_points))
    diag = jnp.full(n_points, 0.09)

    kernel = DampedRandomWalk(log_S0=1.0, log_omega0=-3.0) + Lorentzian(
        log_S0=-1.0, log_Q=2.0, log_omega0=-2.0
    )
    theta0 = jnp.asarray(kernel.get_parameter_vector())

    batch = 16384  # simulations x walkers evaluated per sweep

    from mind_the_gaps_tpu.solver.batched import batched_log_likelihood

    @jax.jit
    def sweep(thetas):
        return batched_log_likelihood(
            jax.vmap(kernel.coefficients)(thetas), t, y, diag, unroll=1
        )

    thetas = theta0 + 0.05 * jax.random.normal(
        jax.random.key(1), (batch, theta0.shape[0]), dtype=theta0.dtype
    )

    # compile + warmup
    sweep(thetas).block_until_ready()

    reps = 3
    start = time.perf_counter()
    for _ in range(reps):
        out = sweep(thetas)
    out.block_until_ready()
    elapsed = time.perf_counter() - start

    evals_per_sec = batch * reps / elapsed
    print(
        json.dumps(
            {
                "metric": "GP loglike evals/sec (N=5k, R=4, f64)",
                "value": round(evals_per_sec, 1),
                "unit": "evals/s",
                "vs_baseline": round(evals_per_sec / CPU_PIPELINE_BASELINE_EVALS_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
