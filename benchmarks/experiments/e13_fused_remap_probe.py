"""Fused one-dispatch E13 remap vs two bitonic_sort_kv_t calls.

The E13 rank-order remap at production scale (m=65536, chunk=128) is two
HBM-tiled bitonic kv-sorts: sort 1 argsorts -adj with an iota payload,
sort 2 sorts the resulting permutation carrying the sorted draws.
``bitonic_remap_t`` chains both sorts in ONE pallas_call (sort 1's iota
payload generated in-kernel), saving one kernel launch and the iota's
HBM read traffic.  On paper that is ~1.5 ms dispatch + ~0.5 ms traffic.

This probe pins the ACTUAL saving on chip, within one process (the only
valid comparison on the shared pool): parity first, then fresh-input
timed loops per the runtime rules (pre-staged inputs, device-side
accumulate, ONE fetch, first timed loop discarded).

MEASURED (v5e single chip, 2026-08-19, m=65536, B=128, REPS=20):

  run 1 (prev session): fused 10.28 ms   two calls  9.43 ms  -> -0.86 ms
  run 2 (this session): fused  9.76 ms   two calls 10.03 ms  -> +0.27 ms

CONCLUSION: WASH.  The fused kernel does not realize the ~2 ms paper
saving — the second sort's phase 1 re-reads permT from HBM right after
sort 1 wrote it (no reuse), so traffic is nearly identical, and the
launch saving is within pool noise.  The fused op is kept (it is parity
-tested and saves a launch on quiet pools) and remains wired into
e13_adjust_batch; expect no measurable E13 step change from it.
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

os.environ.setdefault("MTG_TPU_X64", "0")

import jax
import jax.numpy as jnp

from mind_the_gaps_tpu.ops.pallas_sort import bitonic_remap_t, bitonic_sort_kv_t

M = 65536
B = 128
REPS = 20

_iotaT = None


@jax.jit
def two_calls_sum(adjnT, drawsT):
    _, permT = bitonic_sort_kv_t(adjnT, _iotaT)
    _, xnewT = bitonic_sort_kv_t(permT, drawsT)
    return jnp.sum(permT[:8]) + jnp.sum(xnewT[:8]), permT, xnewT


@jax.jit
def fused_sum(adjnT, drawsT):
    permT, xnewT = bitonic_remap_t(adjnT, drawsT)
    return jnp.sum(permT[:8]) + jnp.sum(xnewT[:8]), permT, xnewT


def fresh_inputs(seed):
    ks = jax.random.split(jax.random.key(seed), 2 * REPS)
    ins = []
    for i in range(REPS):
        # unique keys (a permutation) — ties are resolved differently by
        # the unstable network, so parity needs uniqueness, and the E13
        # keys (f32 irfft values) are effectively tie-free anyway
        adjn = jax.random.permutation(ks[2 * i], M).astype(jnp.float32)[:, None] * 1e-3
        adjnT = jnp.broadcast_to(adjn, (M, B)) + jax.random.uniform(
            ks[2 * i], (1, B), dtype=jnp.float32
        )
        drawsT = -jnp.sort(
            -jax.random.normal(ks[2 * i + 1], (M, B), dtype=jnp.float32), axis=0
        )
        ins.append((adjnT, drawsT))
    _ = [float(a[0, 0]) + float(d[0, 0]) for a, d in ins]
    return ins


def timed(fn, seed):
    ins = fresh_inputs(seed)
    t0 = time.perf_counter()
    acc = 0.0
    for a, d in ins:
        acc = acc + fn(a, d)[0]
    float(acc)
    return (time.perf_counter() - t0) / REPS


def main():
    global _iotaT
    print(f"devices: {jax.devices()}", flush=True)
    _iotaT = jnp.broadcast_to(jnp.arange(M, dtype=jnp.float32)[:, None], (M, B))

    # parity (unique keys per column)
    k = jax.random.key(7)
    adjnT = jax.random.permutation(k, np.arange(M * B, dtype=np.float32).reshape(B, M), axis=1, independent=True).T * 1e-3
    drawsT = -jnp.sort(-jax.random.normal(jax.random.key(8), (M, B), dtype=jnp.float32), axis=0)
    _, p1, x1 = two_calls_sum(adjnT, drawsT)
    _, p2, x2 = fused_sum(adjnT, drawsT)
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
    np.testing.assert_array_equal(np.asarray(x1), np.asarray(x2))
    print("ON-CHIP fused == two-calls (unique keys)", flush=True)

    timed(two_calls_sum, seed=99)  # discarded session warmup
    t_two = timed(two_calls_sum, seed=1)
    t_fused = timed(fused_sum, seed=2)
    print(
        f"fused remap: {t_fused * 1e3:.2f} ms   two calls: {t_two * 1e3:.2f} ms"
        f"   saved {(t_two - t_fused) * 1e3:+.2f} ms",
        flush=True,
    )


if __name__ == "__main__":
    main()
