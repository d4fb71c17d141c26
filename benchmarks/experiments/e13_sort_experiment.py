"""E13 step composition at production shape (chunk=128, m=8192) and a
hand-rolled bitonic sort-network alternative to XLA's sort.

The E13 iteration does per lightcurve: rfft -> angle -> irfft (the
spectral part) then argsort(-adj) + sort_key_val(order, draws) (the
rank-order remap).  CLAUDE.md notes sorts ~95% of the step; this
measures each piece fetch-forced, then tries a pure-jnp bitonic
compare-exchange network (f32 keys + payload) which XLA fuses into
min/max/select — no comparator overhead.

Timing rules: fresh input per rep, device-side accumulate, one final
fetch; discard the first timed loop (session warmup).
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import mind_the_gaps_tpu  # noqa: F401

B, M = 128, 8192
REPS = 8


def timed(label, fn, inputs):
    # warmup + memoization-proof timing
    acc = fn(inputs[0])
    float(jnp.sum(acc))
    for loop in range(2):
        start = time.perf_counter()
        acc = 0.0
        for x in inputs:
            acc = acc + jnp.sum(fn(x))
        float(acc)
        el = (time.perf_counter() - start) / len(inputs)
    print(f"{label:42s} {el*1e3:8.2f} ms/iter", flush=True)
    return el


def fresh_inputs(key0, shape=(B, M)):
    return [
        jax.random.normal(jax.random.key(key0 + r), shape, dtype=jnp.float32)
        for r in range(REPS)
    ]


draws = jnp.sort(jax.random.normal(jax.random.key(999), (B, M), dtype=jnp.float32), axis=-1)


@jax.jit
def spectral_only(x):
    phases = jnp.angle(jnp.fft.rfft(x, axis=-1))
    amp = jnp.abs(jnp.fft.rfft(x, axis=-1)) / (M // 2 + 1)
    return jnp.fft.irfft(amp * jnp.exp(1j * phases), n=M, axis=-1)


@jax.jit
def argsort_only(x):
    return jnp.argsort(-x, axis=-1).astype(jnp.float32)


@jax.jit
def sortkv_only(x):
    order = x.astype(jnp.int32)  # stand-in int keys
    _, v = jax.lax.sort_key_val(order, draws)
    return v


@jax.jit
def full_remap(x):
    order = jnp.argsort(-x, axis=-1)
    _, xnew = jax.lax.sort_key_val(order, draws)
    return xnew


@jax.jit
def plain_sort(x):
    return jnp.sort(x, axis=-1)


# ---- bitonic network ------------------------------------------------- #
def bitonic_sort_kv(key, val):
    """Ascending bitonic sort of (key, val) along the last axis (len 2^p)."""
    m = key.shape[-1]
    lg = m.bit_length() - 1
    pos = np.arange(m)
    for k in range(1, lg + 1):
        for j in range(k - 1, -1, -1):
            s = 1 << j
            kk = key.reshape(key.shape[:-1] + (m // (2 * s), 2, s))
            vv = val.reshape(kk.shape)
            lo_k, hi_k = kk[..., 0, :], kk[..., 1, :]
            lo_v, hi_v = vv[..., 0, :], vv[..., 1, :]
            # descending blocks: bit k of the LOW partner's global index
            low_idx = pos.reshape(m // (2 * s), 2, s)[:, 0, :]
            desc = ((low_idx >> k) & 1).astype(bool)  # (m/2s, s) constant
            swap = (lo_k > hi_k) ^ desc
            nlo_k = jnp.where(swap, hi_k, lo_k)
            nhi_k = jnp.where(swap, lo_k, hi_k)
            nlo_v = jnp.where(swap, hi_v, lo_v)
            nhi_v = jnp.where(swap, lo_v, hi_v)
            key = jnp.stack([nlo_k, nhi_k], axis=-2).reshape(key.shape)
            val = jnp.stack([nlo_v, nhi_v], axis=-2).reshape(val.shape)
    return key, val


@jax.jit
def bitonic_remap(x):
    # rank-order remap: sort (x, iota) desc -> perm; sort (perm, draws)
    iota = jnp.broadcast_to(
        jnp.arange(M, dtype=jnp.float32)[None, :], x.shape
    )
    _, perm = bitonic_sort_kv(-x, iota)
    _, xnew = bitonic_sort_kv(perm, draws)
    return xnew


@jax.jit
def bitonic_plain(x):
    k, _ = bitonic_sort_kv(x, x)
    return k


# correctness
x0 = jax.random.normal(jax.random.key(1), (B, M), dtype=jnp.float32)
ref = full_remap(x0)
got = bitonic_remap(x0)
print("remap match:", bool(jnp.all(ref == got)), flush=True)
print("sort match:", bool(jnp.all(plain_sort(x0) == bitonic_plain(x0))), flush=True)

timed("spectral (2 rfft + irfft)", spectral_only, fresh_inputs(10))
timed("argsort", argsort_only, fresh_inputs(20))
timed("sort_key_val(int32, f32)", sortkv_only, fresh_inputs(30))
timed("full remap (argsort + sortkv)", full_remap, fresh_inputs(40))
timed("jnp.sort", plain_sort, fresh_inputs(50))
timed("bitonic plain sort", bitonic_plain, fresh_inputs(60))
timed("bitonic remap (2 kv-sorts)", bitonic_remap, fresh_inputs(70))
