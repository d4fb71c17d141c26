"""Sweep Pallas kernel tile/time_block/unroll at the bench shape
(N=5k, B=64k, DRW+QPO).  Round-3 best: tile=2048 tb=512 unroll=4 carry
-> 2.04-2.12M evals/s.  Candidates: tile=4096 (more latency hiding, but
carry heuristic disables vreg carry), tb variations, unroll 2/8.

Timing rules: fresh input per rep, device-side accumulate, one fetch,
discarded first loop.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import mind_the_gaps_tpu  # noqa: F401
from mind_the_gaps_tpu.kernels import DampedRandomWalk, Lorentzian
from mind_the_gaps_tpu.ops import pallas_log_likelihood

n_points = 5000
rng = np.random.default_rng(0)
t = np.cumsum(rng.uniform(2.0, 8.0, n_points))
y = rng.normal(0.0, 2.0, n_points)
diag = np.full(n_points, 0.09)
kernel = DampedRandomWalk(log_S0=1.0, log_omega0=-3.0) + Lorentzian(
    log_S0=-1.0, log_Q=2.0, log_omega0=-2.0
)
theta0 = kernel.get_parameter_vector()

batch = 65536
dtype = jnp.float32
tt = jnp.asarray(t, dtype=dtype)
yy = jnp.asarray(y, dtype=dtype)
dd = jnp.asarray(diag, dtype=dtype)

REPS = 3


def run(label, tile, tb, unroll):
    @jax.jit
    def sweep(th):
        return pallas_log_likelihood(
            jax.vmap(kernel.coefficients)(th), tt, yy, dd,
            tile=tile, time_block=tb, unroll=unroll,
        )

    try:
        th0 = jnp.asarray(theta0, dtype=dtype) + 0.05 * jax.random.normal(
            jax.random.key(0), (batch, len(theta0)), dtype=dtype)
        float(jnp.sum(sweep(th0)))
    except Exception as e:
        print(f"{label:36s} FAIL {type(e).__name__}: {str(e)[:80]}", flush=True)
        return

    best = 0.0
    for loop in range(3):
        inputs = [
            jnp.asarray(theta0, dtype=dtype) + 0.05 * jax.random.normal(
                jax.random.key(1000 * loop + r), (batch, len(theta0)), dtype=dtype)
            for r in range(REPS)
        ]
        _ = [float(x[0, 0]) for x in inputs]
        start = time.perf_counter()
        acc = 0.0
        for th in inputs:
            acc = acc + jnp.sum(sweep(th))
        float(acc)
        el = time.perf_counter() - start
        rate = batch * REPS / el
        if loop > 0:
            best = max(best, rate)
    print(f"{label:36s} {best/1e6:8.3f} M evals/s", flush=True)


run("tile=2048 tb=512 unroll=4 (baseline)", 2048, 512, 4)
run("tile=2048 tb=512 unroll=8", 2048, 512, 8)
run("tile=2048 tb=1024 unroll=4", 2048, 1024, 4)
run("tile=4096 tb=256 unroll=4", 4096, 256, 4)
run("tile=4096 tb=128 unroll=4", 4096, 128, 4)
run("tile=2048 tb=256 unroll=4", 2048, 256, 4)
run("tile=2048 tb=512 unroll=2", 2048, 512, 2)
