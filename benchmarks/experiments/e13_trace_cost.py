"""How expensive is TRACING/LOWERING the E13 chunk program at production scale?

The warm lognormal 10k LRT (2026-08-19, post HBM-tiled-sort work) still
showed a ~101 s gap between "observed fits done" and the first bootstrap
chunk dispatch even with the chunk-pipeline executable already in the
persistent compile cache (exactly one jit_chunk_pipeline entry after two
runs — the second run cache-hit).  The remaining suspects are the jit
dispatch's re-trace/lower of the chunk program (the two-level bitonic
remap at m=65536 unrolls log2(m)=16 outer stages) and pool-state stall.
This probe times, in order:

  1. build (Python)               — _build_chunk_pipeline
  2. lower()                      — trace + StableHLO/Mosaic lowering
  3. compile()                    — backend compile (cache-hit if warm)
  4. first dispatch + block       — jit path end to end
  5. second dispatch + block      — steady-state execution

MEASURED (v5e single chip, 2026-08-19, cut=65536 chunk=128
n_freq=250001, while a cold bench.py run shared the pool):

    build      0.000 s
    lower     15.730 s   <-- the trace alone (the 16-outer-stage bitonic
    compile   66.603 s       unroll); paid by EVERY process's first
    dispatch1  0.744 s       dispatch, cache hit or not
    dispatch2  0.704 s

compile here was a persistent-cache MISS despite the LRT runs having
just compiled the same shapes: cache keys embed global-trace-order-
dependent symbol names (see CLAUDE.md traps), so a probe process whose
trace order differs from the LRT's gets a different key — identical
RERUNS of one pipeline do hit.  dispatch1 being fast shows
``pipe.lower(avals).compile()`` seeds the jit fast path in-process, so
``Simulator.precompile_batch`` (added with this probe) moves the whole
trace+compile off the bootstrap's critical path: at LRT entry it
overlaps the observed fits like every other entry precompile.  Of the
measured ~101 s warm gap between "observed fits done" and the first
chunk dispatch, ~16 s was this re-trace + the psd/noise program traces;
the rest was pool-state stall (the same runs read the observed fits at
167-175 s vs the recorded 14-17 s — a 10x-slow pool phase).
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
from mind_the_gaps_tpu.kernels import DampedRandomWalk


def main():
    rng = np.random.default_rng(0)
    n = 5_000
    t = np.cumsum(rng.uniform(2.0, 8.0, n))
    y = rng.normal(10.0, 1.0, n)
    dy = np.full(n, 0.3)
    lc = GappyLightcurve(t, y, dy, exposures=1.0)
    kern = DampedRandomWalk(log_S0=1.0, log_omega0=-3.0)

    sim = lc.get_simulator(kern.get_psd, "Lognormal")
    chunk = sim._e13_chunk_default()
    print(f"cut={sim._e13_cut_len} chunk={chunk} n_freq={sim._omega.shape[0]}")

    t0 = time.perf_counter()
    pipe = sim._build_chunk_pipeline("pallas")
    print(f"build     {time.perf_counter() - t0:8.3f} s")

    keys_aval = jax.eval_shape(lambda: jax.random.split(jax.random.key(0), chunk))
    psd_aval = jax.ShapeDtypeStruct((chunk, sim._omega.shape[0]), jnp.float64)
    mean_aval = jax.ShapeDtypeStruct((), jnp.float64)
    t0 = time.perf_counter()
    lowered = pipe.lower(keys_aval, psd_aval, mean_aval)
    print(f"lower     {time.perf_counter() - t0:8.3f} s")
    t0 = time.perf_counter()
    lowered.compile()
    print(f"compile   {time.perf_counter() - t0:8.3f} s")

    psd_vals = jnp.tile(sim._psd_values()[None, :], (chunk, 1))
    keys = jax.random.split(jax.random.key(1), chunk)
    mean_v = jnp.asarray(10.0, dtype=jnp.float64)
    t0 = time.perf_counter()
    out = pipe(keys, psd_vals, mean_v)
    out.block_until_ready()
    print(f"dispatch1 {time.perf_counter() - t0:8.3f} s")
    keys2 = jax.random.split(jax.random.key(2), chunk)
    t0 = time.perf_counter()
    out2 = pipe(keys2, psd_vals, mean_v)
    out2.block_until_ready()
    print(f"dispatch2 {time.perf_counter() - t0:8.3f} s")
    print(f"out mean {float(out2.mean()):.3f}")


if __name__ == "__main__":
    main()
