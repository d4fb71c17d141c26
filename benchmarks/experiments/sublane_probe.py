"""Does Mosaic lay 1-D (T,) vectors out with full sublane packing, or
as (1, T) rows wasting 7/8 of each vreg?

A Pallas kernel runs a long chain of DEPENDENT fused mul-adds on a
vector of 2048 f32 elements, shaped three ways: (2048,), (8, 256),
(16, 128).  If the 1-D layout wastes sublanes, the 2-D forms will be
up to 8x faster.  This decides whether re-laying the celerite kernel's
state rows (1-D tile vectors) is worth pursuing.
"""
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import mind_the_gaps_tpu  # noqa: F401

ITERS = 20000


def make(shape):
    def kernel(x_ref, o_ref):
        a = x_ref[...]
        b = a * 1.000001 + 0.5

        def body(i, carry):
            a, b = carry
            a = a * 0.999999 + b
            b = b * 1.000001 - a * 1e-7
            return a, b

        a, b = jax.lax.fori_loop(jnp.int32(0), jnp.int32(ITERS), body, (a, b))
        o_ref[...] = a + b

    @jax.jit
    def run(x):
        with jax.enable_x64(False):
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
            )(x)

    return run


for shape in [(2048,), (1, 2048), (8, 256), (16, 128), (8, 2048), (64, 256)]:
    n = int(np.prod(shape))
    run = make(shape)
    x0 = jnp.asarray(np.random.default_rng(0).normal(size=shape), dtype=jnp.float32)
    float(jnp.sum(run(x0)))  # compile+warm
    for loop in range(2):
        xs = [jnp.asarray(np.random.default_rng(i + 1).normal(size=shape), dtype=jnp.float32) for i in range(4)]
        _ = [float(x.ravel()[0]) for x in xs]
        t0 = time.perf_counter()
        acc = 0.0
        for x in xs:
            acc = acc + jnp.sum(run(x))
        float(acc)
        el = (time.perf_counter() - t0) / 4
    print(f"{str(shape):12s} n={n:6d}  {el*1e3:8.2f} ms  ({el/ITERS*1e9:6.1f} ns/iter)", flush=True)
