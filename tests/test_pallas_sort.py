"""Batched bitonic kv-sort kernel (ops/pallas_sort.py).

Runs in interpret mode on the CPU test backend; TPU-measured numbers
live in CLAUDE.md / docs/PARITY.md (5.2 ms sort / 4.5 ms remap at
(128, 8192) vs XLA's 5.8 / 5.5 ms).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mind_the_gaps_tpu.ops.pallas_sort import bitonic_argsort_remap, bitonic_sort_kv


@pytest.mark.parametrize("m", [8, 64, 256, 1024])
def test_bitonic_sort_matches_numpy(m):
    rng = np.random.default_rng(m)
    # unique keys: the network is unstable, so tie order is unspecified
    k = rng.permutation(m * 128).reshape(128, m).astype(np.float32)
    v = rng.normal(size=(128, m)).astype(np.float32)
    ks, vs = bitonic_sort_kv(jnp.asarray(k), jnp.asarray(v), interpret=True)
    np.testing.assert_array_equal(np.asarray(ks), np.sort(k, axis=-1))
    ik = np.argsort(k, axis=-1)
    np.testing.assert_array_equal(np.asarray(vs), np.take_along_axis(v, ik, axis=-1))


def test_bitonic_sort_leading_axes_and_validation():
    rng = np.random.default_rng(0)
    k = rng.permutation(2 * 128 * 64).reshape(2, 128, 64).astype(np.float32)
    v = k * 2.0
    ks, vs = bitonic_sort_kv(jnp.asarray(k), jnp.asarray(v), interpret=True)
    np.testing.assert_array_equal(np.asarray(ks), np.sort(k, axis=-1))
    np.testing.assert_array_equal(np.asarray(vs), np.sort(k, axis=-1) * 2.0)

    with pytest.raises(ValueError, match="power of two"):
        bitonic_sort_kv(jnp.zeros((128, 24)), jnp.zeros((128, 24)), interpret=True)
    with pytest.raises(ValueError, match="multiple of 128"):
        bitonic_sort_kv(jnp.zeros((3, 64)), jnp.zeros((3, 64)), interpret=True)


@pytest.mark.parametrize("B", [128, 256])
def test_hbm_tier_matches_numpy(B):
    """The HBM-tiled two-level kernel (big m staged through VMEM chunks
    by manual DMA) at a test-sized geometry: m=1024 in C=256 chunks —
    the same schedule shape as the production m=65536/C=4096, run via
    the private constructor so interpret mode stays fast.  On-chip
    parity at the real (128, 65536) is in CLAUDE.md (2026-08-19:
    bit-equal to stable numpy argsort on unique keys, 9.48 ms vs XLA's
    17.01)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from mind_the_gaps_tpu.ops.pallas_sort import _LANES, _make_hbm_kernel

    m, C, blk = 1024, 256, 64
    call = pl.pallas_call(
        _make_hbm_kernel(m, C, blk),
        out_shape=(jax.ShapeDtypeStruct((m, B), jnp.float32),) * 2,
        grid=(B // _LANES,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
        out_specs=(pl.BlockSpec(memory_space=pl.ANY),) * 2,
        scratch_shapes=[
            pltpu.VMEM((2, C, _LANES), jnp.float32),
            pltpu.VMEM((2, C, _LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        interpret=True,
    )
    rng = np.random.default_rng(B)
    k = rng.permutation(m * B).reshape(m, B).astype(np.float32)
    v = rng.normal(size=(m, B)).astype(np.float32)
    with jax.enable_x64(False):
        ko, vo = call(jnp.asarray(k), jnp.asarray(v))
    order = np.argsort(k, axis=0)
    np.testing.assert_array_equal(np.asarray(ko), np.take_along_axis(k, order, 0))
    np.testing.assert_array_equal(np.asarray(vo), np.take_along_axis(v, order, 0))


def test_hbm_fused_remap_matches_two_sorts():
    """The fused one-dispatch remap kernel (sort 1 with generated iota
    payload chained into sort 2) equals the reference argsort+scatter
    remap, at the same test geometry as the HBM-tier sort test."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from mind_the_gaps_tpu.ops.pallas_sort import _LANES, _make_hbm_remap_kernel

    m, C, blk, B = 1024, 256, 64, 128
    call = pl.pallas_call(
        _make_hbm_remap_kernel(m, C, blk),
        out_shape=(jax.ShapeDtypeStruct((m, B), jnp.float32),) * 4,
        grid=(B // _LANES,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
        out_specs=(pl.BlockSpec(memory_space=pl.ANY),) * 4,
        scratch_shapes=[
            pltpu.VMEM((2, C, _LANES), jnp.float32),
            pltpu.VMEM((2, C, _LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        interpret=True,
    )
    rng = np.random.default_rng(11)
    adj = rng.permutation(m * B).reshape(B, m).astype(np.float32) * 0.01
    draws = -np.sort(-rng.normal(size=(B, m)).astype(np.float32), axis=-1)
    with jax.enable_x64(False):
        _, permT, _, xnewT = call(jnp.asarray(-adj.T), jnp.asarray(draws.T))
    order = np.argsort(-adj, axis=-1)
    np.testing.assert_array_equal(np.asarray(permT).T.astype(np.int64), order)
    ref = np.zeros_like(draws)
    np.put_along_axis(ref, order, draws, axis=-1)
    np.testing.assert_array_equal(np.asarray(xnewT).T, ref)


def test_big_m_routes_to_hbm_kernel():
    """bitonic_sort_kv routes m > 8192 through the HBM tier (the
    resident kernel's (m, 128) tile would be 2x VMEM at 65536)."""
    rng = np.random.default_rng(7)
    m = 16384
    k = rng.permutation(128 * m).reshape(128, m).astype(np.float32)
    v = rng.normal(size=(128, m)).astype(np.float32)
    ks, vs = bitonic_sort_kv(jnp.asarray(k), jnp.asarray(v), interpret=True)
    np.testing.assert_array_equal(np.asarray(ks), np.sort(k, axis=-1))
    ik = np.argsort(k, axis=-1)
    np.testing.assert_array_equal(np.asarray(vs), np.take_along_axis(v, ik, axis=-1))


def test_bitonic_remap_matches_scatter():
    """Rank-order remap equals the reference scatter formulation
    (simulator.py:107-110 semantics) for unique keys."""
    rng = np.random.default_rng(1)
    m = 128
    adj = rng.permutation(128 * m).reshape(128, m).astype(np.float32)
    draws = -np.sort(-rng.normal(size=(128, m)).astype(np.float32), axis=-1)
    out = bitonic_argsort_remap(jnp.asarray(adj), jnp.asarray(draws), interpret=True)
    order = np.argsort(-adj, axis=-1)
    ref = np.zeros_like(draws)
    np.put_along_axis(ref, order, draws, axis=-1)
    np.testing.assert_array_equal(np.asarray(out), ref)
