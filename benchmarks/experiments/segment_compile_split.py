"""Where does the derive_posteriors segment-program compile time go?

Round-4 left the segment-program compile (~30-45 s) as the cold-start
critical path of the 10k LRT (CLAUDE.md roadmap #3), with "shrink that
one program" as the only remaining lever.  But the same study measured
a per-compile FLOOR of 4-30 s through the remote-compile tunnel
regardless of program size — if the segment compile is floor-dominated,
splitting or shrinking it buys nothing (two floors, concurrent, is
still one floor... which is what one program already costs).

This experiment times, in ONE process (after a warmup compile that
absorbs the intermittent first-interaction stall):
  1. a trivial 1-op scan            -> the floor sample
  2. the full production segment    -> sampler scan + masked autocorr
  3. a sampler-only segment         -> same program minus the autocorr
  4. the masked autocorr alone      -> FFT tau over the (10000, 32, D) buffer
for the null (D=2) and alt (D=5) observed-fit shapes of the 10k LRT.

Run: JAX_COMPILATION_CACHE_DIR=/tmp/cc_$RANDOM python benchmarks/experiments/segment_compile_split.py
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
from mind_the_gaps_tpu.kernels import DampedRandomWalk, Lorentzian
from mind_the_gaps_tpu.sampler.autocorr import integrated_autocorr_time_masked
from mind_the_gaps_tpu.sampler.ensemble import sample_ensemble_impl

print("cache dir:", jax.config.jax_compilation_cache_dir, flush=True)

n_points = 5000
rng = np.random.default_rng(0)
t = np.cumsum(rng.uniform(2.0, 8.0, n_points))
y = rng.normal(0.0, 2.0, n_points) + 10.0
dy = np.full(n_points, 0.3)
lc = GappyLightcurve(t, y, dy, exposures=1.0)

null_kernel = DampedRandomWalk(log_S0=1.0, log_omega0=-3.0, bounds=[(-5, 10), (-8, 2)])
alt_kernel = null_kernel + Lorentzian(
    log_S0=-1.0, log_Q=2.0, log_omega0=-2.0, bounds=[(-8, 5), (0, 6), (-5, 0)]
)

MAX_STEPS, SEG, W = 10000, 500, 32


def timed(label, fn):
    t0 = time.perf_counter()
    fn()
    dt = time.perf_counter() - t0
    print(f"{label:55s} {dt:8.1f} s", flush=True)
    return dt


def sampler_only_lower(logprob_fn, state, chain_buf, lp_buf):
    """The segment program minus the autocorr tail: key split, SEG
    stretch-move steps, buffer writes.  Mirrors _advance_segment."""

    def seg(key, state, chain_buf, lp_buf, offset):
        key, sub = jax.random.split(key)
        chain, lps, acc, state = sample_ensemble_impl(sub, logprob_fn, state, SEG)
        zero = jnp.zeros((), dtype=offset.dtype)
        chain_buf = jax.lax.dynamic_update_slice(
            chain_buf, chain.astype(chain_buf.dtype), (offset, zero, zero)
        )
        lp_buf = jax.lax.dynamic_update_slice(lp_buf, lps.astype(lp_buf.dtype), (offset, zero))
        return key, state, chain_buf, lp_buf, acc

    return jax.jit(seg).lower(
        jax.random.key(0), state, chain_buf, lp_buf, jnp.asarray(0, dtype=jnp.int32)
    )


def main():
    # warmup: absorb the first-device-interaction stall + one floor sample
    x = jnp.ones((8,))
    timed("warmup (eager add)", lambda: jax.block_until_ready(x + 1))

    def trivial():
        def f(c, _):
            return c * 1.0000001 + 1.0, None

        return jax.jit(
            lambda c: jax.lax.scan(f, c, None, length=100)[0]
        ).lower(jnp.zeros((8,))).compile()

    timed("floor: trivial 100-step scan", trivial)

    for name, kernel in (("null D=2", null_kernel), ("alt  D=5", alt_kernel)):
        model = GPModelling(lc, kernel)
        D = model._ndim
        state = jnp.zeros((W, D))
        chain_buf = jnp.zeros((MAX_STEPS, W, D))
        lp_buf = jnp.zeros((MAX_STEPS, W))

        timed(
            f"{name}: FULL segment (sampler+autocorr)",
            lambda: model._segment_exec(True, SEG, jax.random.key(0), state, chain_buf, lp_buf),
        )
        lowered = sampler_only_lower(model._logprob_batch_fast, state, chain_buf, lp_buf)
        timed(f"{name}: sampler-only segment", lowered.compile)
        timed(
            f"{name}: masked autocorr alone",
            lambda: jax.jit(integrated_autocorr_time_masked)
            .lower(chain_buf, jnp.asarray(SEG, dtype=jnp.int32))
            .compile(),
        )

    # second floor sample (the floor is noisy; bracket the measurements)
    def trivial2():
        def f(c, _):
            return c * 0.9999 + 0.5, None

        return jax.jit(
            lambda c: jax.lax.scan(f, c, None, length=100)[0]
        ).lower(jnp.zeros((16,))).compile()

    timed("floor: trivial scan (2nd sample)", trivial2)


if __name__ == "__main__":
    main()
