"""Where does the truly-cold observed-fit segment-program compile time go?

Round-4 roadmap #1: the 10k LRT truly-cold is ~415 s, ~319 s of which is
the two observed-fit segment-program compiles through the remote-compile
tunnel.  This script compiles the pieces separately against a FRESH
compilation cache (set JAX_COMPILATION_CACHE_DIR=/tmp/something_new) and
times each .lower().compile().

Run:  JAX_COMPILATION_CACHE_DIR=/tmp/cc_$RANDOM python _scratch/compile_breakdown.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import mind_the_gaps_tpu  # noqa: F401  (x64 + cache config)
from mind_the_gaps_tpu import GappyLightcurve
from mind_the_gaps_tpu.gpmodelling import GPModelling, _advance_segment
from mind_the_gaps_tpu.kernels import DampedRandomWalk, Lorentzian
from mind_the_gaps_tpu.sampler.autocorr import integrated_autocorr_time_masked
from mind_the_gaps_tpu.sampler.ensemble import sample_ensemble_impl

print("cache dir:", jax.config.jax_compilation_cache_dir, flush=True)

n_points = 5000
rng = np.random.default_rng(0)
t = np.cumsum(rng.uniform(2.0, 8.0, n_points))
y = rng.normal(0.0, 2.0, n_points) + 10.0
dy = np.full(n_points, 0.3)
lc = GappyLightcurve(t, y, dy)

null_kernel = DampedRandomWalk(log_S0=1.0, log_omega0=-3.0, bounds=[(-5, 10), (-8, 2)])
alt_kernel = null_kernel + Lorentzian(log_S0=-1.0, log_Q=2.0, log_omega0=-2.0,
                                      bounds=[(-8, 5), (0, 6), (-5, 0)])

WALKERS, MAX_STEPS, SEG = 32, 10000, 500


def timed(label, fn):
    t0 = time.perf_counter()
    out = fn()
    el = time.perf_counter() - t0
    print(f"{label:55s} {el:8.1f} s", flush=True)
    return out


for name, kern in (("null(D=2)", null_kernel), ("alt(D=5)", alt_kernel)):
    gp = GPModelling(lc, kern)
    D = gp._ndim
    logprob = gp._logprob_batch_fast
    logprob_d = gp._logprob_batch_fast_d
    model = gp
    state = jnp.zeros((WALKERS, D))
    chain_buf = jnp.zeros((MAX_STEPS, WALKERS, D))
    lp_buf = jnp.zeros((MAX_STEPS, WALKERS))
    key = jax.random.key(0)
    off = jnp.asarray(0, dtype=jnp.int32)

    # 1. the bare Pallas log-prob program (one call)
    timed(f"{name} bare logprob_batch_fast (W=32)",
          lambda: jax.jit(logprob).lower(state).compile())

    # 2. the sampler scan alone (no buffers / autocorr)
    def samp():
        return jax.jit(
            lambda k, s: sample_ensemble_impl(k, logprob, s, SEG)
        ).lower(key, state).compile()
    timed(f"{name} sampler scan only ({SEG} steps)", samp)

    # 3. masked autocorr alone over the full buffer
    def ac():
        return jax.jit(
            lambda cb, n: integrated_autocorr_time_masked(cb, n)
        ).lower(chain_buf, off + SEG).compile()
    timed(f"{name} masked autocorr ({MAX_STEPS},{WALKERS},{D})", ac)

    # 4. the full segment program (what derive_posteriors compiles)
    def seg():
        return _advance_segment.lower(
            key, state, chain_buf, lp_buf, off, *model._seg_data(),
            log_prob_fn=logprob_d, n_steps=SEG
        ).compile()
    timed(f"{name} FULL _advance_segment", seg)
