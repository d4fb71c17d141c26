"""Acceptance probe for the E13 out-of-loop rewrites (round 8).

e13_prod_anatomy.py isolated the production (128, 65536) chunk cost:
the final f64 SCATTER applying the rank permutation to the f64 draws was
1125.6 ms — 80% of the 1400 ms chunk — with the loop, TK95 cut, draws
prep, and downsample sharing the rest (78.6 / 36 / ~300 / 52 ms).  Fixes:

  1. `_apply_rank_permutation`: the scatter becomes an i32-keyed
     sort_key_val (sorting the permutation applies its inverse) — the
     same trick the loop's remap has used since round 3.
  2. two-f32-key lexicographic f64 sort (head + residual of the
     float-float emulated f64, original value as payload) — exact on
     this runtime, native comparisons (candidate for the draws sort).

This probe asserts BIT-parity of both rewrites on chip, then times: the
old scatter vs the key-sort, the old f64 sort vs the two-key sort, and
the full production chunk pipeline (new code).  Timing per runtime
rules: fresh inputs per rep, device accumulate, one fetch, first loop
discarded.

MEASURED (v5e single chip, 2026-08-19, m=65536, chunk=128; pre-fix
anatomy in the same pool phase: scatter 1125.6 ms iso, f64 sort 53.5,
chunk pipeline 1400.2 ms — e13_prod_anatomy.py):

  key-sort == scatter      BIT-exact on chip
  two-key  == f64 sort     BIT-exact on chip
  scatter -> key-sort      1093.5 -> 18.0 ms   (61x)    -> ADOPTED
  f64 -> two-key sort        21.9 -> 21.7 ms   (wash)   -> REJECTED
                             (the sort is HBM-bound, not comparator-
                              bound; plain -sort(-x) stays)
  full chunk pipeline       344.0 ms/chunk  (was 1400.2 = 4.1x; this
                             scenario's mean iters 15.1)

The two-key sort was removed from core.py after the wash; it is kept
inline here so the negative stays reproducible.
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import jax
import jax.numpy as jnp

from mind_the_gaps_tpu.simulator.core import _apply_rank_permutation


def _sort_descending_f64(x, axis: int = -1):
    """Two-f32-key exact f64 descending sort (REJECTED: measured wash).

    TPU f64 is emulated as a float32 pair (~47-bit), so an f64 sort's
    comparisons expand to multi-op f32 sequences.  Splitting each value
    into its round-to-nearest f32 head and the residual (the emulation's
    low word — fits f32 exactly) and sorting lexicographically by
    (head, residual) with the original f64 as payload is bit-exact:
    nearest rounding is monotone and equal key pairs are equal values.
    Measured on chip: no faster than the plain sort (HBM-bound)."""
    neg = -x
    hi = neg.astype(jnp.float32)
    lo = (neg - hi.astype(x.dtype)).astype(jnp.float32)
    _, _, s = jax.lax.sort((hi, lo, neg), dimension=axis % x.ndim, num_keys=2)
    return -s

CHUNK = 128
M = 65536
REPS = 6


def timed(fn, ins):
    t0 = time.perf_counter()
    acc = None
    for args in ins:
        r = jnp.sum(fn(*args))
        acc = r if acc is None else acc + r
    float(acc)
    return (time.perf_counter() - t0) / len(ins)


def fresh_scatter_inputs(nreps, seed0):
    ins = []
    for r in range(nreps):
        kk = jax.random.key(seed0 + r)
        order = jax.vmap(lambda k1: jax.random.permutation(k1, M))(
            jax.random.split(kk, CHUNK)
        ).astype(jnp.int32)
        draws = jnp.exp(2.0 + 0.7 * jax.random.normal(kk, (CHUNK, M), dtype=jnp.float64))
        ins.append((order, draws))
    _ = [float(o[0, 0]) + float(d[0, 0]) for o, d in ins]
    return ins


def main():
    print(f"devices: {jax.devices()}", flush=True)

    scatter = jax.jit(
        jax.vmap(lambda o, sd: jnp.zeros_like(sd).at[o].set(sd))
    )
    keysort = jax.jit(_apply_rank_permutation)
    ins = fresh_scatter_inputs(REPS, 100)
    a = np.asarray(scatter(*ins[0]))
    b = np.asarray(keysort(*ins[0]))
    np.testing.assert_array_equal(a, b)
    print("ON-CHIP key-sort == scatter (bit-exact)", flush=True)

    sort64 = jax.jit(lambda x: -jnp.sort(-x, axis=-1))
    sort2k = jax.jit(_sort_descending_f64)
    xs = [d for _, d in ins]
    np.testing.assert_array_equal(np.asarray(sort64(xs[0])), np.asarray(sort2k(xs[0])))
    print("ON-CHIP two-key f64 sort == plain f64 sort (bit-exact)", flush=True)

    timed(keysort, ins)  # session warmup, discarded
    t_sc = timed(scatter, fresh_scatter_inputs(REPS, 200))
    t_ks = timed(keysort, fresh_scatter_inputs(REPS, 300))
    print(f"scatter {t_sc*1e3:8.1f} ms   key-sort {t_ks*1e3:8.1f} ms", flush=True)

    sins = [(x,) for x in xs]
    t_64 = timed(sort64, [(d,) for _, d in fresh_scatter_inputs(REPS, 400)])
    t_2k = timed(sort2k, [(d,) for _, d in fresh_scatter_inputs(REPS, 500)])
    print(f"f64 sort {t_64*1e3:7.1f} ms   two-key {t_2k*1e3:7.1f} ms", flush=True)

    # full production chunk pipeline with the new code, same scenario as
    # e13_prod_anatomy.py
    from mind_the_gaps_tpu.kernels import DampedRandomWalk
    from mind_the_gaps_tpu.simulator import Simulator

    rng = np.random.default_rng(0)
    t = np.cumsum(rng.uniform(4.0, 9.0, 5000))
    kernel = DampedRandomWalk(log_S0=1.0, log_omega0=-3.0)
    theta0 = kernel.get_parameter_vector()
    sim = Simulator(
        lambda w: np.asarray(kernel.get_psd(jnp.asarray(w), jnp.asarray(theta0))),
        t, exposures=1.0, mean=10.0, pdf="lognormal", extension_factor=2,
        max_iter=400,
    )
    omega = jnp.asarray(sim.omega)
    thetas = theta0[None, :] + 0.15 * rng.standard_normal((CHUNK, 2))

    @jax.jit
    def psd_batch(ths):
        def one(th):
            v = kernel.get_psd(omega[1:], th)
            return jnp.concatenate([jnp.zeros((1,), v.dtype), v])
        return jax.vmap(one)(ths)

    psd_b = psd_batch(jnp.asarray(thetas))
    best = None
    for rep in range(4):
        key = jax.random.key(17 + rep)
        start = time.perf_counter()
        out = sim.simulate_batch(key, psd_b, chunk=CHUNK)
        float(jnp.sum(out))
        wall = time.perf_counter() - start
        if rep > 0:
            best = wall if best is None else min(best, wall)
    print(f"full chunk pipeline (new): {best*1e3:8.1f} ms/chunk", flush=True)


if __name__ == "__main__":
    main()
