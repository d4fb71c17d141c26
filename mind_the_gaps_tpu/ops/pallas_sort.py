"""Batched bitonic key/value sort as a Pallas TPU kernel.

XLA's variadic sort on TPU is the E13 rank-order remap's hot op
(simulator/core.py e13_adjust: one argsort + one sort_key_val per
iteration — 5.6 ms of the 9.7 ms step at the production (128, 8192)
shape; reference counterpart: np.argsort in simulator.py:107-110).
This kernel keeps the whole batch-column layout resident in VMEM and
runs the full O(log^2 m) bitonic network in one kernel launch instead
of XLA's per-stage HBM round trips.

Layout: keys/vals transposed to (m, B_tile) — the sort axis on
sublanes, 128 independent batch columns on lanes.  Per merge stage
(stride s):

- s <  BLK: process BLK aligned rows at once; the partner rows are the
  block rolled by ±s (two static concats) and a static (BLK, 1) mask
  picks the +s/-s side — all compare-exchanges of the stage's block in
  ~10 wide vector ops.
- s >= BLK: the lower/upper partners are whole aligned blocks; a fori
  enumerates lower blocks (insert-a-zero-bit indexing) and exchanges
  (BLK, 128) pairs directly.

The network is unstable (equal keys may reorder); keys/values are f32.
m must be a power of two and B a multiple of 128 (the E13 loop pads to
a power of two anyway, simulator/core.py:468-470).

TPU-measured at (128, 8192) f32 (v5e, fetch-forced): plain sort 5.23 ms
vs XLA's 5.78; the two-sort rank-order remap 4.51 ms vs XLA's 5.53
(argsort + sort_key_val).  XLA's variadic sort is near-optimal for this
shape, so the E13 loop keeps it (a 1.2x remap win does not justify
restructuring the validated vmapped while_loop); this kernel stands as
the TPU-native sort tier for workloads where the ~20% matters or where
fusing the sort INTO a kernel avoids an HBM round trip.
"""
from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["bitonic_sort_kv", "bitonic_argsort_remap"]

_LANES = 128
# roll-form block rows: small enough that a (blk, 128) key+value block
# plus partners stays register-resident in the fused passes, large
# enough to amortize the per-iteration loop overhead
_BLK = 64


def _make_kernel(m: int, blk: int):
    lg = m.bit_length() - 1
    b = blk.bit_length() - 1

    def kernel(k_ref, v_ref, ko_ref, vo_ref):
        # copy in (the network then runs in the output refs in place)
        ko_ref[...] = k_ref[...]
        vo_ref[...] = v_ref[...]

        pos_blk = jax.lax.broadcasted_iota(jnp.int32, (blk, 1), 0)

        def exchange(x, xv, p, pv, keep_min):
            # keep the smaller key iff keep_min; bool-vector selects via
            # logical ops (Mosaic cannot select_n on i1 vectors)
            take_partner = jnp.logical_or(
                jnp.logical_and(keep_min, p < x),
                jnp.logical_and(jnp.logical_not(keep_min), p > x),
            )
            return jnp.where(take_partner, p, x), jnp.where(take_partner, pv, xv)

        def roll_step(x, xv, base, k_stage, j):
            """One stride-2^j (< blk) compare-exchange on an in-register
            (blk, 128) block starting at row ``base``."""
            s = 1 << j
            lower = (pos_blk & s) == 0  # (blk, 1) bool
            pneg = jnp.concatenate([x[s:], x[:s]], axis=0)
            ppos = jnp.concatenate([x[-s:], x[:-s]], axis=0)
            p = jnp.where(lower, pneg, ppos)
            pvneg = jnp.concatenate([xv[s:], xv[:s]], axis=0)
            pvpos = jnp.concatenate([xv[-s:], xv[:-s]], axis=0)
            pv = jnp.where(lower, pvneg, pvpos)
            if k_stage < b:
                desc = ((pos_blk >> k_stage) & 1) == 1  # (blk, 1) static
            else:
                desc = ((base >> k_stage) & 1) == 1  # traced scalar
            keep_min = jnp.logical_xor(lower, desc)
            return exchange(x, xv, p, pv, keep_min)

        def fused_small_pass(stages):
            """Run a list of (k_stage, j) stages (all with 2^j < blk)
            register-resident: one read-modify-write per blk-row block
            for the WHOLE list, instead of one per stage."""
            def body(a, _):
                base = a * blk
                sl = pl.ds(base, blk)
                x = ko_ref[sl, :]
                xv = vo_ref[sl, :]
                for (k_stage, j) in stages:
                    x, xv = roll_step(x, xv, base, k_stage, j)
                ko_ref[sl, :] = x
                vo_ref[sl, :] = xv
                return jnp.int32(0)

            jax.lax.fori_loop(jnp.int32(0), jnp.int32(m // blk), body, jnp.int32(0))

        def block_stage(k_stage, j):
            """Stride 2^j >= blk: exchange whole (blk, 128) block pairs."""
            s = 1 << j
            n_pairs = m // (2 * blk)
            jb = j - b  # bit of the BLOCK index that must be 0

            def body(q, _):
                if jb > 0:
                    a = ((q >> jb) << (jb + 1)) | (q & ((1 << jb) - 1))
                else:
                    a = q * 2
                i_lo = a * blk
                i_hi = i_lo + s
                desc = ((i_lo >> k_stage) & 1) == 1  # scalar
                sl_lo = pl.ds(i_lo, blk)
                sl_hi = pl.ds(i_hi, blk)
                lo_k = ko_ref[sl_lo, :]
                hi_k = ko_ref[sl_hi, :]
                lo_v = vo_ref[sl_lo, :]
                hi_v = vo_ref[sl_hi, :]
                swap = jnp.logical_xor(lo_k > hi_k, desc)
                ko_ref[sl_lo, :] = jnp.where(swap, hi_k, lo_k)
                ko_ref[sl_hi, :] = jnp.where(swap, lo_k, hi_k)
                vo_ref[sl_lo, :] = jnp.where(swap, hi_v, lo_v)
                vo_ref[sl_hi, :] = jnp.where(swap, lo_v, hi_v)
                return jnp.int32(0)

            jax.lax.fori_loop(jnp.int32(0), jnp.int32(n_pairs), body, jnp.int32(0))

        # Schedule: group consecutive small-stride stages into fused
        # register passes.  All of k=1..b fuse into ONE pass (every
        # stride < blk); for k > b each merge level runs its block-form
        # stages then one fused pass for the j < b tail.
        pending = []
        for k_stage in range(1, lg + 1):
            for j in range(k_stage - 1, -1, -1):
                if (1 << j) < blk:
                    pending.append((k_stage, j))
                else:
                    if pending:
                        fused_small_pass(pending)
                        pending = []
                    block_stage(k_stage, j)
        if pending:
            fused_small_pass(pending)

    return kernel


@partial(jax.jit, static_argnames=("interpret",))
def bitonic_sort_kv(keys, vals, interpret: bool = False):
    """Sort ``keys`` ascending along the LAST axis, carrying ``vals``.

    keys/vals: (..., m) float32, m a power of two; the product of the
    leading axes must be a multiple of 128.  Returns (keys, vals)
    sorted.  Unstable for equal keys (bitonic network).
    """
    keys = jnp.asarray(keys, dtype=jnp.float32)
    vals = jnp.asarray(vals, dtype=jnp.float32)
    if keys.shape != vals.shape:
        raise ValueError("keys and vals must have the same shape")
    lead = keys.shape[:-1]
    m = keys.shape[-1]
    if m & (m - 1):
        raise ValueError("sort length must be a power of two")
    B = int(np.prod(lead)) if lead else 1
    if B % _LANES:
        raise ValueError(f"batch must be a multiple of {_LANES}")
    blk = min(_BLK, m)
    if m < 8:
        raise ValueError("sort length must be >= 8")

    kT = keys.reshape(B, m).T  # (m, B)
    vT = vals.reshape(B, m).T

    kernel = _make_kernel(m, blk)
    call = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((m, B), jnp.float32),
            jax.ShapeDtypeStruct((m, B), jnp.float32),
        ),
        grid=(B // _LANES,),
        in_specs=[
            pl.BlockSpec((m, _LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((m, _LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((m, _LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((m, _LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )
    with jax.enable_x64(False):
        ko, vo = call(kT, vT)
    return ko.T.reshape(keys.shape), vo.T.reshape(vals.shape)


def bitonic_argsort_remap(adj, sorted_draws, interpret: bool = False):
    """Rank-order remap via two bitonic kv-sorts: elements of
    ``sorted_draws`` (descending-sorted targets) land at the rank
    positions of ``adj`` (descending), exactly like
    ``sort_key_val(argsort(-adj), sorted_draws)`` up to tie order.

    adj, sorted_draws: (..., m) f32.
    """
    m = adj.shape[-1]
    iota = jnp.broadcast_to(
        jnp.arange(m, dtype=jnp.float32), adj.shape
    )
    _, perm = bitonic_sort_kv(-adj, iota, interpret=interpret)
    _, out = bitonic_sort_kv(perm, sorted_draws, interpret=interpret)
    return out
