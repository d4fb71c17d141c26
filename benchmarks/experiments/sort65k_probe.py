"""Sort cost anatomy at the production E13 segment length (m=65536).

At production scale the E13 remap sorts are 84% of per-iteration cost
(26.1 of 31 ms/iter at chunk=128 — e13_periter_probe.py).  The existing
Pallas bitonic (ops/pallas_sort.py) cannot run at m=65536: its (m, 128)
column tile is 32 MB, 2x VMEM.  Before designing an HBM-tiled two-level
bitonic, pin the two numbers that decide whether it can win:

  1. XLA's variadic kv-sort cost at (128, 65536) — the target.  If it
     is HBM-bound at ~one pass per bitonic stage, a VMEM-fused schedule
     (~10 HBM passes instead of ~136) has up to ~10x headroom on paper.
  2. The Pallas kernel's COMPUTE throughput per element-stage, from its
     scaling across m = 2048/4096/8192 (all VMEM-resident).  The fused
     design does the same per-element stage work; if the Pallas
     element-stage rate extrapolated to 65536's 136 stages exceeds
     XLA's wall, the fused design loses on compute regardless of
     traffic and should not be built.

Timing per runtime rules: fresh inputs per rep (runtime memoizes),
device-side accumulate, ONE float() fetch, first timed loop discarded.

MEASURED (v5e single chip, 2026-08-19, within one process):

  XLA    m=  2048:  1.49 ms   86.2 ps/elem-stage  (~ 186 GB/s @1 pass/stage)
  Pallas m=  2048:  1.61 ms   93.1 ps/elem-stage
  XLA    m=  4096:  1.71 ms   41.8 ps/elem-stage  (~ 383 GB/s)
  Pallas m=  4096:  1.66 ms   40.5 ps/elem-stage
  XLA    m=  8192:  1.92 ms   20.1 ps/elem-stage  (~ 797 GB/s)
  Pallas m=  8192:  1.67 ms   17.5 ps/elem-stage
  XLA    m= 65536: 16.70 ms   14.6 ps/elem-stage  (~1093 GB/s)

CONCLUSIONS:
  - Every sort at m <= 8192 sits on a ~1.6 ms dispatch floor (the
    Pallas 2048..8192 times are flat); the VMEM-resident network's
    marginal compute is noise-level.
  - XLA at 65536 moves ~1 TB/s-equivalent traffic = HBM-bound at about
    one full pass per bitonic stage.  A VMEM-chunked schedule needs
    ~11 passes instead of ~136 -> built as _make_hbm_kernel in
    ops/pallas_sort.py.  Measured result of that kernel (same day,
    unique keys, parity-checked on chip): 9.48 ms vs XLA 17.01 ms =
    1.80x — now COMPUTE-bound (traffic model predicts ~2 ms), so the
    remaining levers are exchange-op count and DMA/compute overlap.
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

from mind_the_gaps_tpu.ops.pallas_sort import bitonic_sort_kv

B = 128
REPS = 20


def n_stages(m: int) -> int:
    lg = m.bit_length() - 1
    return lg * (lg + 1) // 2


@jax.jit
def xla_kv_sort_sum(keys, vals):
    ko, vo = jax.lax.sort_key_val(keys, vals, dimension=-1)
    return jnp.sum(ko[:, :8]) + jnp.sum(vo[:, :8])


@jax.jit
def pallas_kv_sort_sum(keys, vals):
    ko, vo = bitonic_sort_kv(keys, vals)
    return jnp.sum(ko[:, :8]) + jnp.sum(vo[:, :8])


def time_sort(fn, m, seed):
    """Mean wall per sort: REPS fresh pre-generated inputs (the runtime
    memoizes identical buffers), device-side accumulate, ONE fetch."""
    ks = jax.random.split(jax.random.key(seed), 2 * REPS)
    inputs = [
        (
            jax.random.uniform(ks[2 * i], (B, m), dtype=jnp.float32),
            jax.random.uniform(ks[2 * i + 1], (B, m), dtype=jnp.float32),
        )
        for i in range(REPS)
    ]
    _ = [float(k[0, 0]) + float(v[0, 0]) for k, v in inputs]  # materialize
    t0 = time.perf_counter()
    acc = 0.0
    for k, v in inputs:
        acc = acc + fn(k, v)
    float(acc)  # single fetch forces all executions
    return (time.perf_counter() - t0) / REPS


def main():
    print(f"devices: {jax.devices()}", flush=True)
    rows = []
    # warmup/compile everything first (concurrent compiles overlap;
    # traces must stay serial — these jits trace on this thread)
    for m in (2048, 4096, 8192):
        k = jax.random.uniform(jax.random.key(0), (B, m), dtype=jnp.float32)
        float(pallas_kv_sort_sum(k, k))
        float(xla_kv_sort_sum(k, k))
    for m in (65536,):
        k = jax.random.uniform(jax.random.key(0), (B, m), dtype=jnp.float32)
        float(xla_kv_sort_sum(k, k))

    # discarded first timed loop (session warmup)
    time_sort(xla_kv_sort_sum, 8192, seed=99)

    for m in (2048, 4096, 8192, 65536):
        t_x = time_sort(xla_kv_sort_sum, m, seed=m)
        es = B * m * n_stages(m)
        print(
            f"XLA    m={m:6d}: {t_x * 1e3:7.2f} ms  "
            f"{t_x / es * 1e12:6.2f} ps/elem-stage  "
            f"(~{B * m * 4 * 2 * 2 * n_stages(m) / t_x / 1e9:5.0f} GB/s at 1 pass/stage)",
            flush=True,
        )
        rows.append(("xla", m, t_x))
        if m <= 8192:
            t_p = time_sort(pallas_kv_sort_sum, m, seed=m + 1)
            print(
                f"Pallas m={m:6d}: {t_p * 1e3:7.2f} ms  "
                f"{t_p / es * 1e12:6.2f} ps/elem-stage",
                flush=True,
            )
            rows.append(("pallas", m, t_p))

    # extrapolate the Pallas element-stage rate (from the largest two
    # VMEM-resident sizes, slope-form to cancel dispatch overhead) to
    # the 65536-stage count
    t8, t4 = dict(((n, m), t) for n, m, t in rows)[("pallas", 8192)], dict(
        ((n, m), t) for n, m, t in rows
    )[("pallas", 4096)]
    es8 = B * 8192 * n_stages(8192)
    es4 = B * 4096 * n_stages(4096)
    rate = (t8 - t4) / (es8 - es4)  # s per elem-stage, dispatch cancelled
    t65_extrap = rate * B * 65536 * n_stages(65536)
    t65_xla = dict(((n, m), t) for n, m, t in rows)[("xla", 65536)]
    print(
        f"\nPallas marginal rate {rate * 1e12:.2f} ps/elem-stage -> "
        f"compute-bound 65536 extrapolation {t65_extrap * 1e3:.2f} ms "
        f"vs XLA {t65_xla * 1e3:.2f} ms",
        flush=True,
    )
    print(
        "verdict:",
        "fused HBM-tiled bitonic CAN win on compute — build it"
        if t65_extrap < 0.7 * t65_xla
        else "compute-bound extrapolation does NOT beat XLA — do not build",
        flush=True,
    )


if __name__ == "__main__":
    main()
