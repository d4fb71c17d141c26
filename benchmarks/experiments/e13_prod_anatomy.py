"""E13 production-chunk anatomy OUTSIDE the lock-step loop.

With the Pallas remap the loop runs ~2x faster per iteration (13.4 vs
24.2 ms at m=65536 — e13_periter_probe.py + pallas remap), but the
pipeline only moved 74.9 -> 86-91 lcs/s (1.15x).  At ~47 mean iters the
loop-only rate would be ~200 lcs/s, so roughly HALF the production
generation cost now sits outside the loop.  Candidate owners, all at
(128, 65536) per chunk:

  - TK95 synthesis: c64 irfft on the FULL fine grid (~131k) + dynamic
    slice, vmapped over the chunk.
  - draws prep: lognormal sample in f64, a (128, 65536) f64 SORT
    (TPU f64 is emulated ~8x), and the f32 amplitude rfft.
  - tail: the final inverse-permutation SCATTER in f64 and the f64
    cumsum-downsample.

This probe times jitted sub-programs sharing the same keys so the
differences attribute cost: cut-only, cut+prep, the full batched E13
(loop via e13_adjust_batch), and the full chunk pipeline (+downsample).
It then times the three suspect primitives in isolation.  Timing per
runtime rules: fresh keys per rep, device accumulate, ONE fetch, first
loop discarded.

MEASURED (v5e single chip, 2026-08-19, pre-fix code; within one
process — cross-process varies +-2-3x):

  production scenario: m_cut=65536, fine grid 131072
    cut-only (TK95+slice)     :     78.6 ms/chunk
    cut+prep (+draws/sort/A)  :    114.7 ms/chunk
    full E13 batch (loop)     :   1391.4 ms/chunk
    full chunk pipeline       :   1400.2 ms/chunk
    mean iters 15.1
    iso f64 sort (128,65536)  :     53.5 ms
    iso f32 sort (128,65536)  :     37.3 ms
    iso f64 scatter by order  :   1125.6 ms   <-- 80% of the chunk
    iso f64 cumsum+window     :     52.4 ms

The "half the cost is outside the loop" hypothesis was WRONG in an
interesting way: the cost was the final f64 SCATTER inside
e13_adjust_batch (counted as "loop" in the earlier split).  Fix +
acceptance: e13_outofloop_fix.py (scatter -> i32-keyed sort_key_val,
1093.5 -> 18.0 ms, chunk 1400 -> 344 ms = 4.1x).
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import jax
import jax.numpy as jnp

from mind_the_gaps_tpu.kernels import DampedRandomWalk
from mind_the_gaps_tpu.simulator import Simulator
from mind_the_gaps_tpu.simulator.core import (
    downsample_cumsum,
    e13_adjust_batch,
    tk95_rates,
)
from mind_the_gaps_tpu.stats import sample_pdf

CHUNK = 128
MAX_ITER = 400
MEAN = 10.0
REPS = 3


def build_scenario(n_points=5000):
    rng = np.random.default_rng(0)
    t = np.cumsum(rng.uniform(4.0, 9.0, n_points))
    kernel = DampedRandomWalk(log_S0=1.0, log_omega0=-3.0)
    theta0 = kernel.get_parameter_vector()
    sim = Simulator(
        lambda w: np.asarray(kernel.get_psd(jnp.asarray(w), jnp.asarray(theta0))),
        t, exposures=1.0, mean=MEAN, pdf="lognormal", extension_factor=2,
        max_iter=MAX_ITER,
    )
    omega = jnp.asarray(sim.omega)
    thetas = theta0[None, :] + 0.15 * rng.standard_normal((CHUNK, 2))

    @jax.jit
    def psd_batch(ths):
        def one(th):
            v = kernel.get_psd(omega[1:], th)
            return jnp.concatenate([jnp.zeros((1,), v.dtype), v])
        return jax.vmap(one)(ths)

    return sim, psd_batch(jnp.asarray(thetas))


def timed(prog, psd_b, seed0):
    best = None
    for rep in range(REPS + 1):
        keys = jax.random.split(jax.random.key(seed0 + rep), CHUNK)
        start = time.perf_counter()
        float(prog(keys, psd_b))
        wall = time.perf_counter() - start
        if rep > 0:
            best = wall if best is None else min(best, wall)
    return best


def main():
    sim, psd_b = build_scenario()
    m_cut = sim._e13_cut_len
    namp = m_cut // 2 + 1
    print(f"production scenario: m_cut={m_cut}, fine grid {len(sim.sim_timestamps)}",
          flush=True)
    cut = sim._cut_segment_fn
    starts, ends = sim._starts_j, sim._ends_j
    mean_v = jnp.asarray(MEAN, dtype=jnp.float64)

    @jax.jit
    def cut_only(keys, psd_b):
        _, segs = jax.vmap(cut, in_axes=(0, 0, None))(keys, psd_b, mean_v)
        return jnp.sum(segs)

    @jax.jit
    def cut_prep(keys, psd_b):
        k_pdfs, segs = jax.vmap(cut, in_axes=(0, 0, None))(keys, psd_b, mean_v)
        std = jnp.std(segs, axis=-1)
        xsim = jax.vmap(lambda k, s: sample_pdf(k, "lognormal", MEAN, s, (m_cut,)))(
            k_pdfs, std)
        A = jnp.abs(jnp.fft.rfft(segs.astype(jnp.float32), axis=-1)) / namp
        sorted_draws = -jnp.sort(-xsim, axis=-1)
        return jnp.sum(sorted_draws) + jnp.sum(A).astype(jnp.float64)

    @jax.jit
    def full_e13(keys, psd_b):
        k_pdfs, segs = jax.vmap(cut, in_axes=(0, 0, None))(keys, psd_b, mean_v)
        adj, iters = e13_adjust_batch(
            k_pdfs, segs, "lognormal", mean_v, MAX_ITER, sort_impl="pallas")
        return jnp.sum(adj) + jnp.sum(iters).astype(jnp.float64)

    @jax.jit
    def full_pipeline(keys, psd_b):
        k_pdfs, segs = jax.vmap(cut, in_axes=(0, 0, None))(keys, psd_b, mean_v)
        adj, _ = e13_adjust_batch(
            k_pdfs, segs, "lognormal", mean_v, MAX_ITER, sort_impl="pallas")
        return jnp.sum(downsample_cumsum(adj, starts, ends))

    @jax.jit
    def mean_iters(keys, psd_b):
        k_pdfs, segs = jax.vmap(cut, in_axes=(0, 0, None))(keys, psd_b, mean_v)
        _, iters = e13_adjust_batch(
            k_pdfs, segs, "lognormal", mean_v, MAX_ITER, sort_impl="pallas")
        return jnp.mean(iters.astype(jnp.float64))

    progs = [
        ("cut-only (TK95+slice)", cut_only),
        ("cut+prep (+draws/sort/A)", cut_prep),
        ("full E13 batch (loop)", full_e13),
        ("full chunk pipeline", full_pipeline),
    ]
    timed(cut_only, psd_b, seed0=90)  # session warmup, discarded
    rows = {}
    for tag, prog in progs:
        rows[tag] = timed(prog, psd_b, seed0=17)
        print(f"  {tag:26s}: {rows[tag] * 1e3:8.1f} ms/chunk", flush=True)
    mi = float(mean_iters(jax.random.split(jax.random.key(18), CHUNK), psd_b))
    print(f"  mean iters {mi:.1f}", flush=True)

    # isolated suspects (fresh input per rep — the runtime memoizes
    # executions on identical buffers)
    def iso(tag, fn, fresh, nreps=4):
        f = jax.jit(fn)
        ins = [fresh(r) for r in range(nreps)]
        for args in ins:
            _ = [float(a.ravel()[0]) for a in args]  # materialize
        float(jnp.sum(f(*ins[0])))  # compile (rep 0 discarded below)
        best = None
        for args in ins[1:]:
            start = time.perf_counter()
            float(jnp.sum(f(*args)))
            wall = time.perf_counter() - start
            best = wall if best is None or wall < best else best
        print(f"  iso {tag:24s}: {best * 1e3:8.1f} ms", flush=True)

    def fresh_x(dtype):
        return lambda r: (jax.random.normal(
            jax.random.key(1000 + r), (CHUNK, m_cut), dtype=dtype),)

    def fresh_scatter(r):
        kk = jax.random.key(2000 + r)
        ordr = jax.vmap(lambda k1: jax.random.permutation(k1, m_cut))(
            jax.random.split(kk, CHUNK))
        return ordr, jax.random.normal(kk, (CHUNK, m_cut), dtype=jnp.float64)

    iso("f64 sort (128,65536)", lambda a: -jnp.sort(-a, axis=-1), fresh_x(jnp.float64))
    iso("f32 sort (128,65536)", lambda a: -jnp.sort(-a, axis=-1), fresh_x(jnp.float32))
    iso("f64 scatter by order", lambda o, sd: jax.vmap(
        lambda oo, ss: jnp.zeros_like(ss).at[oo].set(ss))(o, sd), fresh_scatter)
    iso("f64 cumsum+window", lambda a: downsample_cumsum(a, starts, ends),
        fresh_x(jnp.float64))


if __name__ == "__main__":
    main()
