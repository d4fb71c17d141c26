"""Pallas bitonic sort vs XLA sort on TPU at the E13 production shape."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import mind_the_gaps_tpu  # noqa: F401
from mind_the_gaps_tpu.ops.pallas_sort import bitonic_sort_kv, bitonic_argsort_remap

B, M = 128, 8192
rng = np.random.default_rng(0)
draws = jnp.asarray(-np.sort(-rng.normal(size=(B, M)).astype(np.float32), axis=-1))


@jax.jit
def remap_xla(x):
    order = jnp.argsort(-x, axis=-1)
    _, out = jax.lax.sort_key_val(order, draws)
    return out


@jax.jit
def remap_pallas(x):
    return bitonic_argsort_remap(x, draws)


@jax.jit
def sort_pallas(x):
    k, _ = bitonic_sort_kv(x, x)
    return k


@jax.jit
def sort_xla(x):
    return jnp.sort(x, axis=-1)


x0 = jnp.asarray(rng.normal(size=(B, M)).astype(np.float32))
# correctness on TPU
kp = sort_pallas(x0)
kx = sort_xla(x0)
print("sorted match:", bool(jnp.all(kp == kx)), flush=True)
rp = remap_pallas(x0)
rx = remap_xla(x0)
print("remap match:", bool(jnp.all(rp == rx)), flush=True)


def timed(label, fn):
    for loop in range(3):
        xs = [jnp.asarray(rng.normal(size=(B, M)).astype(np.float32)) for _ in range(8)]
        _ = [float(x[0, 0]) for x in xs]
        t0 = time.perf_counter()
        acc = 0.0
        for x in xs:
            acc = acc + jnp.sum(fn(x))
        float(acc)
        el = (time.perf_counter() - t0) / 8
    print(f"{label:28s} {el*1e3:8.2f} ms", flush=True)


timed("XLA sort", sort_xla)
timed("pallas sort", sort_pallas)
timed("XLA remap (argsort+sortkv)", remap_xla)
timed("pallas remap (2 kv-sorts)", remap_pallas)
