"""What drives the 27-40 s sampler-scan compile? Isolate:
- n_steps (scan length should be ~free),
- the Pallas logprob vs a trivial logprob vs the XLA-scan logprob,
- walkers count.

Run: JAX_COMPILATION_CACHE_DIR=/tmp/cc_$RANDOM python _scratch/compile_breakdown2.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import mind_the_gaps_tpu  # noqa: F401
from mind_the_gaps_tpu import GappyLightcurve
from mind_the_gaps_tpu.gpmodelling import GPModelling
from mind_the_gaps_tpu.kernels import DampedRandomWalk, Lorentzian
from mind_the_gaps_tpu.sampler.ensemble import sample_ensemble_impl

print("cache dir:", jax.config.jax_compilation_cache_dir, flush=True)

n_points = 5000
rng = np.random.default_rng(0)
t = np.cumsum(rng.uniform(2.0, 8.0, n_points))
y = rng.normal(0.0, 2.0, n_points) + 10.0
dy = np.full(n_points, 0.3)
lc = GappyLightcurve(t, y, dy)
alt_kernel = DampedRandomWalk(log_S0=1.0, log_omega0=-3.0, bounds=[(-5, 10), (-8, 2)]) + \
    Lorentzian(log_S0=-1.0, log_Q=2.0, log_omega0=-2.0, bounds=[(-8, 5), (0, 6), (-5, 0)])

gp = GPModelling(lc, alt_kernel)
D = gp._ndim
logprob_pallas = gp._logprob_batch_fast
logprob_xla = gp._logprob_batch
state = jnp.zeros((32, D))


def timed(label, fn):
    t0 = time.perf_counter()
    fn()
    print(f"{label:55s} {time.perf_counter() - t0:8.1f} s", flush=True)


def trivial_logprob(thetas):
    return -jnp.sum(thetas**2, axis=-1)


def comp(lp, steps):
    return jax.jit(
        lambda k, s: sample_ensemble_impl(k, lp, s, steps)
    ).lower(jax.random.key(0), state).compile()


timed("scan(trivial, 500)", lambda: comp(trivial_logprob, 500))
timed("scan(trivial, 501)", lambda: comp(trivial_logprob, 501))
timed("scan(pallas, 10)", lambda: comp(logprob_pallas, 10))
timed("scan(pallas, 500)", lambda: comp(logprob_pallas, 500))
timed("scan(pallas, 501)", lambda: comp(logprob_pallas, 501))
timed("scan(xla-f64, 10)", lambda: comp(logprob_xla, 10))
timed("scan(xla-f64, 500)", lambda: comp(logprob_xla, 500))
