"""Which Pallas probe shape is pathologically slow to compile?

Run: JAX_COMPILATION_CACHE_DIR=/tmp/cc_$RANDOM python _scratch/probe_cost.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import mind_the_gaps_tpu  # noqa: F401
from mind_the_gaps_tpu.kernels import RealTerm
from mind_the_gaps_tpu.ops import pallas_log_likelihood

print("cache:", jax.config.jax_compilation_cache_dir, flush=True)


def timed(label, fn):
    t0 = time.perf_counter()
    fn()
    print(f"{label:50s} {time.perf_counter() - t0:8.1f} s", flush=True)


term = RealTerm(0.0, -1.0)
th = jnp.zeros((128, 2), dtype=jnp.float32)
co = jax.vmap(term.coefficients)(th)

# a plain first compile to absorb any per-process first-compile cost
timed("warm: trivial jit", lambda: jax.jit(lambda x: x * 2 + 1).lower(th).compile())

for n in (16, 128, 1024):
    tN = jnp.arange(float(n))
    yN = jnp.zeros((n,), dtype=jnp.float32)
    y2d = jnp.zeros((128, n), dtype=jnp.float32)

    timed(f"probe shared  N={n}",
          lambda: jax.jit(lambda c: pallas_log_likelihood(c, tN, yN, yN + 1.0)).lower(co).compile())
    timed(f"probe grouped N={n}",
          lambda: jax.jit(lambda c: pallas_log_likelihood(c, tN, y2d, yN + 1.0)).lower(co).compile())
