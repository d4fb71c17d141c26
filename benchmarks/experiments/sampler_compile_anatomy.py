"""What makes the observed-fit sampler program cost ~30 s to compile?

segment_compile_split.py measured (warm pool, fresh entries): trivial
program 0.4-0.9 s, masked autocorr 5-8 s, sampler-only segment ~30-35 s
— the sampler scan is the whole cost and it is NOT the per-compile
floor.  This experiment isolates the candidates inside the sampler:

  1. bare Pallas kernel call at the observed-fit layout (one eval)
  2. minimal 500-step scan over the bare kernel (no ensemble machinery)
  3. the full sampler-only segment, Pallas path
  4. the full sampler-only segment, XLA f64 path (no Mosaic at all)
  5. (2) again at 50 steps (scan length should not matter: one body)

Run with a FRESH cache dir so every entry is a genuine compile:
  JAX_COMPILATION_CACHE_DIR=/tmp/cc_$RANDOM python benchmarks/experiments/sampler_compile_anatomy.py
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import jax
import jax.numpy as jnp

from mind_the_gaps_tpu import GappyLightcurve
from mind_the_gaps_tpu.gpmodelling import GPModelling
from mind_the_gaps_tpu.sampler.ensemble import sample_ensemble_impl

print("cache dir:", jax.config.jax_compilation_cache_dir, flush=True)

n_points = 5000
rng = np.random.default_rng(0)
t = np.cumsum(rng.uniform(2.0, 8.0, n_points))
y = rng.normal(0.0, 2.0, n_points) + 10.0
lc = GappyLightcurve(t, y, np.full(n_points, 0.3), exposures=1.0)

from mind_the_gaps_tpu.kernels import DampedRandomWalk, Lorentzian

kernel = DampedRandomWalk(log_S0=1.0, log_omega0=-3.0, bounds=[(-5, 10), (-8, 2)]) + Lorentzian(
    log_S0=-1.0, log_Q=2.0, log_omega0=-2.0, bounds=[(-8, 5), (0, 6), (-5, 0)]
)
model = GPModelling(lc, kernel)
D = model._ndim
W = 32


def timed(label, fn):
    t0 = time.perf_counter()
    fn()
    dt = time.perf_counter() - t0
    print(f"{label:55s} {dt:8.1f} s", flush=True)
    return dt


def main():
    x = jnp.ones((8,))
    timed("warmup (eager add)", lambda: jax.block_until_ready(x + 1))

    # 1. bare fast logprob at the sampler's half-update batch (W/2 thetas)
    thetas = jnp.zeros((W // 2, D))
    timed(
        "bare fast logprob (one half-update batch)",
        lambda: jax.jit(model._logprob_batch_fast).lower(thetas).compile(),
    )

    # 2. minimal scan over the bare kernel: 500 steps, no ensemble
    def mk_scan(n):
        def step(carry, _):
            th = carry
            lp = model._logprob_batch_fast(th)
            return th + 1e-6 * lp[:, None], None

        return jax.jit(lambda th: jax.lax.scan(step, th, None, length=n)[0]).lower(thetas)

    timed("minimal 500-step scan over kernel", mk_scan(500).compile)
    timed("minimal  50-step scan over kernel", mk_scan(50).compile)

    # 3/4. the full sampler (ensemble machinery), Pallas vs XLA logprob
    def mk_sampler(logprob, label):
        def run(key, state):
            chain, lps, acc, state = sample_ensemble_impl(key, logprob, state, 500)
            return chain[-1], lps[-1], acc, state

        return jax.jit(run).lower(jax.random.key(0), jnp.zeros((W, D)))

    timed("full sampler 500 steps (Pallas logprob)", mk_sampler(model._logprob_batch_fast, "pallas").compile)
    timed("full sampler 500 steps (XLA f64 logprob)", mk_sampler(model._logprob_batch, "xla").compile)

    # two kernel calls per scan body (the sampler's red-black structure)
    def mk_scan2(n):
        def step(carry, _):
            th = carry
            lp1 = model._logprob_batch_fast(th)
            th = th + 1e-6 * lp1[:, None]
            lp2 = model._logprob_batch_fast(th)
            return th + 1e-6 * lp2[:, None], None

        return jax.jit(lambda th: jax.lax.scan(step, th, None, length=n)[0]).lower(thetas)

    timed("minimal scan, TWO kernel calls per body", mk_scan2(500).compile)

    # f32 ensemble state: does dropping the f64 stretch-move arithmetic
    # (TPU f64 is emulated) deflate the compile?
    def mk_sampler32():
        def run(key, state):
            chain, lps, acc, state = sample_ensemble_impl(key, model._logprob_batch_fast, state, 500)
            return chain[-1], lps[-1], acc, state

        return jax.jit(run).lower(jax.random.key(0), jnp.zeros((W, D), dtype=jnp.float32))

    timed("full sampler 500 steps (Pallas, f32 state)", mk_sampler32().compile)

    timed("floor: trivial scan", lambda: jax.jit(
        lambda c: jax.lax.scan(lambda a, _: (a * 1.000001 + 0.1, None), c, None, length=100)[0]
    ).lower(jnp.zeros((8,))).compile())


if __name__ == "__main__":
    main()
