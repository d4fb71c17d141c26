"""Batched E13 adjustment (simulator/core.py e13_adjust_batch).

The production big-segment path runs the E13 loop as an explicit
batched while_loop so the rank-order remap can be whole-chunk sorts
(the HBM-tiled Pallas bitonic on TPU).  Contracts pinned here:

1. with XLA sorts the batched loop is BIT-IDENTICAL to the vmapped
   per-row loop (vmap-of-while_loop freeze semantics reproduced);
2. the Pallas remap (interpret mode on CPU) reproduces the XLA batch
   trajectory exactly when keys are tie-free, and always preserves the
   permutation contract (every iterate is a permutation of the draws).

Reference counterpart: E13Simulator.adjust_lightcurve_pdf
(reference simulator.py:65-131).
"""
import numpy as np

import jax
import jax.numpy as jnp

from mind_the_gaps_tpu.simulator.core import e13_adjust, e13_adjust_batch

MEAN = 10.0


def _segments(B, m, seed):
    rng = np.random.default_rng(seed)
    return jnp.asarray(MEAN + 2.0 * rng.standard_normal((B, m)))


def test_batched_xla_bitwise_matches_vmapped():
    B, m = 6, 512
    segs = _segments(B, m, 0)
    keys = jax.random.split(jax.random.key(3), B)

    out_v, it_v = jax.jit(
        jax.vmap(lambda k, s: e13_adjust(k, s, "lognormal", MEAN, 200))
    )(keys, segs)
    out_b, it_b = jax.jit(
        lambda k, s: e13_adjust_batch(k, s, "lognormal", MEAN, 200, sort_impl="xla")
    )(keys, segs)

    np.testing.assert_array_equal(np.asarray(it_v), np.asarray(it_b))
    np.testing.assert_array_equal(np.asarray(out_v), np.asarray(out_b))


def test_batched_xla_respects_max_iter_freeze():
    """Rows that hit max_iter freeze exactly like the vmapped loop."""
    B, m = 4, 256
    segs = _segments(B, m, 1)
    keys = jax.random.split(jax.random.key(9), B)
    out_v, it_v = jax.jit(
        jax.vmap(lambda k, s: e13_adjust(k, s, "uniform", MEAN, 3))
    )(keys, segs)
    out_b, it_b = jax.jit(
        lambda k, s: e13_adjust_batch(k, s, "uniform", MEAN, 3, sort_impl="xla")
    )(keys, segs)
    assert int(np.max(np.asarray(it_b))) == 3
    np.testing.assert_array_equal(np.asarray(it_v), np.asarray(it_b))
    np.testing.assert_array_equal(np.asarray(out_v), np.asarray(out_b))


def test_batched_pallas_matches_xla_batch():
    """Pallas remap (interpret mode) against the XLA batch at a bounded
    iteration budget: identical trajectories on tie-free keys, and the
    output is a permutation of the same full-precision draws."""
    B, m = 128, 512
    segs = _segments(B, m, 2)
    keys = jax.random.split(jax.random.key(5), B)

    out_x, it_x = jax.jit(
        lambda k, s: e13_adjust_batch(k, s, "lognormal", MEAN, 4, sort_impl="xla")
    )(keys, segs)
    out_p, it_p = jax.jit(
        lambda k, s: e13_adjust_batch(
            k, s, "lognormal", MEAN, 4, sort_impl="pallas", interpret=True
        )
    )(keys, segs)

    # permutation contract holds regardless of tie order
    np.testing.assert_array_equal(
        np.sort(np.asarray(out_p), axis=-1), np.sort(np.asarray(out_x), axis=-1)
    )
    np.testing.assert_array_equal(np.asarray(it_x), np.asarray(it_p))
    # element-wise the paths agree except where the unstable network
    # reordered tied f32 keys (measured ~0.03% here, ~0.04% at the
    # production (128, 65536)); those swaps exchange draws of adjacent
    # rank, so the result stays a valid E13 output
    mismatch = np.mean(np.asarray(out_x) != np.asarray(out_p))
    assert mismatch < 1e-3, f"pallas/xla remap mismatch fraction {mismatch}"
