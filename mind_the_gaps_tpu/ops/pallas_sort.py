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
shape, so the E13 loop keeps it at VMEM-resident sizes (a 1.2x remap win
does not justify restructuring the validated vmapped while_loop).

BIG-m tier (round 4): at the production lognormal-LRT segment length
(m=65536) a (m, 128) column tile is 32 MB — 2x VMEM — so the resident
kernel cannot run, and XLA's sort there is HBM-bound at ~one full pass
per bitonic stage (measured 16.7 ms at (128, 65536) ≈ 1.1 TB/s
equivalent traffic — benchmarks/experiments/sort65k_probe.py), while the
VMEM-resident network's marginal compute is ~free (the 2048..8192 Pallas
times are one ~1.6 ms dispatch floor).  ``_make_hbm_kernel`` therefore
runs a two-level bitonic in ONE dispatch: intra-chunk levels sort each
(C, 128) chunk in VMEM scratch (one HBM round trip for ALL of levels
1..log2(C)), and each cross-chunk merge level pays one round trip per
block stage with the stride-C stage fused with that level's intra-chunk
tail — 11 HBM passes instead of ~136 at m=65536, C=4096.
"""
from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["bitonic_sort_kv", "bitonic_sort_kv_t", "bitonic_remap_t", "bitonic_argsort_remap"]

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


def _hbm_network(m: int, C: int, blk: int, parts: str = "all"):
    """Builder for the two-level HBM-tiled bitonic network (see
    ``_make_hbm_kernel``).  Returns ``net(col, kb, vb, sems)`` ->
    ``run(kin, vin, kio, vio)``: one full kv-sort reading keys from
    ``kin`` (vals from ``vin``, or a generated row-index iota when
    ``vin is None``) and leaving the sorted pair in ``kio``/``vio`` —
    so a kernel can chain several sorts in ONE dispatch
    (``_make_hbm_remap_kernel``).
    """
    lg = m.bit_length() - 1
    lgC = C.bit_length() - 1
    b = blk.bit_length() - 1
    nchunks = m // C

    def net(col, kb, vb, sems):
        def start(dmas):
            for d in dmas:
                d.start()

        def wait(dmas):
            for d in dmas:
                d.wait()

        pos_blk = jax.lax.broadcasted_iota(jnp.int32, (blk, 1), 0)

        def exchange(x, xv, p, pv, keep_min):
            # min/max form: 2 ops fewer than the logical-mask form (ties
            # keep the own value either way — xk == x when p == x)
            xk = jnp.where(keep_min, jnp.minimum(x, p), jnp.maximum(x, p))
            take_partner = xk != x
            return xk, jnp.where(take_partner, pv, xv)

        def roll_step(x, xv, gbase, k_stage, j):
            """Stride 2^j (< blk) compare-exchange on an in-register
            (blk, 128) block whose first row has GLOBAL index gbase."""
            s = 1 << j
            lower = (pos_blk & s) == 0
            pneg = jnp.concatenate([x[s:], x[:s]], axis=0)
            ppos = jnp.concatenate([x[-s:], x[:-s]], axis=0)
            p = jnp.where(lower, pneg, ppos)
            pvneg = jnp.concatenate([xv[s:], xv[:s]], axis=0)
            pvpos = jnp.concatenate([xv[-s:], xv[:-s]], axis=0)
            pv = jnp.where(lower, pvneg, pvpos)
            if k_stage < b:
                desc = ((pos_blk >> k_stage) & 1) == 1
            else:
                desc = ((gbase >> k_stage) & 1) == 1  # traced scalar
            keep_min = jnp.logical_xor(lower, desc)
            return exchange(x, xv, p, pv, keep_min)

        def fused_small_pass(slot, gb, stages):
            """Run a static list of (k_stage, j<b) stages on a chunk in
            slot ``slot`` register-resident; gb = traced global row
            index of the chunk start (multiple of C)."""

            def body(a, _):
                base = a * blk
                sl = pl.ds(base, blk)
                x = kb[slot, sl, :]
                xv = vb[slot, sl, :]
                for (k_stage, j) in stages:
                    x, xv = roll_step(x, xv, gb + base, k_stage, j)
                kb[slot, sl, :] = x
                vb[slot, sl, :] = xv
                return jnp.int32(0)

            jax.lax.fori_loop(jnp.int32(0), jnp.int32(C // blk), body, jnp.int32(0))

        def chunk_block_stage(slot, gb, k_stage, j):
            """Stride 2^j in [blk, C): exchange (blk, 128) block pairs
            inside the chunk in slot ``slot``."""
            s = 1 << j
            n_pairs = C // (2 * blk)
            jb = j - b

            def body(q, _):
                if jb > 0:
                    a = ((q >> jb) << (jb + 1)) | (q & ((1 << jb) - 1))
                else:
                    a = q * 2
                i_lo = a * blk
                i_hi = i_lo + s
                desc = (((gb + i_lo) >> k_stage) & 1) == 1
                sl_lo = pl.ds(i_lo, blk)
                sl_hi = pl.ds(i_hi, blk)
                lo_k = kb[slot, sl_lo, :]
                hi_k = kb[slot, sl_hi, :]
                lo_v = vb[slot, sl_lo, :]
                hi_v = vb[slot, sl_hi, :]
                swap = jnp.logical_xor(lo_k > hi_k, desc)
                kb[slot, sl_lo, :] = jnp.where(swap, hi_k, lo_k)
                kb[slot, sl_hi, :] = jnp.where(swap, lo_k, hi_k)
                vb[slot, sl_lo, :] = jnp.where(swap, hi_v, lo_v)
                vb[slot, sl_hi, :] = jnp.where(swap, lo_v, hi_v)
                return jnp.int32(0)

            jax.lax.fori_loop(jnp.int32(0), jnp.int32(n_pairs), body, jnp.int32(0))

        def run_stages(slot, gb, stages):
            """Static (k_stage, j) list with every stride < C, scheduled
            as fused register passes + in-chunk block stages."""
            pending = []
            for (k_stage, j) in stages:
                if (1 << j) < blk:
                    pending.append((k_stage, j))
                else:
                    if pending:
                        fused_small_pass(slot, gb, pending)
                        pending = []
                    chunk_block_stage(slot, gb, k_stage, j)
            if pending:
                fused_small_pass(slot, gb, pending)

        def cross_exchange(k_stage, gb_lo):
            """Elementwise compare-exchange between the chunks in slots
            0 (global base gb_lo) and 1 (gb_lo + stride)."""
            desc = ((gb_lo >> k_stage) & 1) == 1
            lo_k = kb[0]
            hi_k = kb[1]
            swap = jnp.logical_xor(lo_k > hi_k, desc)
            kb[0] = jnp.where(swap, hi_k, lo_k)
            kb[1] = jnp.where(swap, lo_k, hi_k)
            lo_v = vb[0]
            hi_v = vb[1]
            vb[0] = jnp.where(swap, hi_v, lo_v)
            vb[1] = jnp.where(swap, lo_v, hi_v)

        local_levels = [
            (k_stage, j) for k_stage in range(1, lgC + 1) for j in range(k_stage - 1, -1, -1)
        ]

        def run(kin, vin, kio, vio):
            def hbm_slice(ref, chunk):
                return ref.at[pl.ds(chunk * C, C), pl.ds(col, _LANES)]

            def load_dmas(slot, chunk, ksrc, vsrc):
                dmas = [
                    pltpu.make_async_copy(
                        hbm_slice(ksrc, chunk), kb.at[slot], sems.at[slot, 0]
                    )
                ]
                if vsrc is not None:
                    dmas.append(
                        pltpu.make_async_copy(
                            hbm_slice(vsrc, chunk), vb.at[slot], sems.at[slot, 1]
                        )
                    )
                return tuple(dmas)

            def store_dmas(slot, chunk):
                return (
                    pltpu.make_async_copy(
                        kb.at[slot], hbm_slice(kio, chunk), sems.at[slot, 0]
                    ),
                    pltpu.make_async_copy(
                        vb.at[slot], hbm_slice(vio, chunk), sems.at[slot, 1]
                    ),
                )

            def load_chunk(slot, chunk, ksrc, vsrc):
                start(load_dmas(slot, chunk, ksrc, vsrc))
                wait(load_dmas(slot, chunk, ksrc, vsrc))

            def store_chunk(slot, chunk):
                start(store_dmas(slot, chunk))
                wait(store_dmas(slot, chunk))

            # ---- phase 1: per-chunk local sort (levels 1..lgC) ---- #
            # Serial load/compute/store.  A double-buffered variant
            # (chunk c+1's load and c-1's store in flight during chunk
            # c's compute) was built and measured 2026-08-19: WASH
            # (6.06 vs 5.68 ms at m=65536 across processes) — phase 1
            # owns only ~0.33 ms of the 1.83 ms DMA schedule, and Mosaic
            # serializes around the dynamic-slot scratch accesses
            # anyway.  Reverted to the simple form.
            def phase1(c, _):
                load_chunk(0, c, kin, vin)
                if vin is None:
                    # generated payload: the global row index (the
                    # argsort iota) — saves the iota's HBM round trip.
                    # tpu.iota is integer-only: build i32, cast to f32
                    vb[0] = (
                        jax.lax.broadcasted_iota(jnp.int32, (C, _LANES), 0) + c * C
                    ).astype(jnp.float32)
                if parts != "dma":
                    run_stages(0, c * C, local_levels)
                store_chunk(0, c)
                return jnp.int32(0)

            jax.lax.fori_loop(jnp.int32(0), jnp.int32(nchunks), phase1, jnp.int32(0))

            # ---- phase 2: cross-chunk merge levels ---- #
            for k_stage in range(lgC + 1, lg + 1):
                tail = [(k_stage, j) for j in range(lgC - 1, -1, -1)]
                for j in range(k_stage - 1, lgC, -1):
                    jb = j - lgC  # chunk-index bit that must be 0

                    def pure_pass(q, _, k_stage=k_stage, jb=jb):
                        if jb > 0:
                            a = ((q >> jb) << (jb + 1)) | (q & ((1 << jb) - 1))
                        else:
                            a = q * 2
                        load_chunk(0, a, kio, vio)
                        load_chunk(1, a + (1 << jb), kio, vio)
                        if parts == "all":
                            cross_exchange(k_stage, a * C)
                        store_chunk(0, a)
                        store_chunk(1, a + (1 << jb))
                        return jnp.int32(0)

                    jax.lax.fori_loop(
                        jnp.int32(0), jnp.int32(nchunks // 2), pure_pass, jnp.int32(0)
                    )

                def fused_pass(q, _, k_stage=k_stage, tail=tail):
                    a = q * 2
                    load_chunk(0, a, kio, vio)
                    load_chunk(1, a + 1, kio, vio)
                    if parts == "all":
                        cross_exchange(k_stage, a * C)  # the stride-C stage
                        run_stages(0, a * C, tail)
                        run_stages(1, (a + 1) * C, tail)
                    store_chunk(0, a)
                    store_chunk(1, a + 1)
                    return jnp.int32(0)

                jax.lax.fori_loop(
                    jnp.int32(0), jnp.int32(nchunks // 2), fused_pass, jnp.int32(0)
                )

        return run

    return net


def _make_hbm_kernel(m: int, C: int, blk: int, parts: str = "all"):
    """Two-level bitonic kv-sort for m too large to keep a (m, 128)
    column tile in VMEM.  One dispatch; HBM-resident data; (C, 128)
    chunks staged through VMEM scratch by manual DMA.

    ``parts`` is instrumentation-only (benchmarks/experiments/
    sort65k_probe.py): "dma" runs the DMA schedule with no compute,
    "p1" phase 1 only, "all" the real sort.

    Schedule (lg = log2(m), lgC = log2(C)):
    - phase 1: each chunk loads once and runs ALL intra-chunk levels
      (1..lgC) in VMEM — one HBM round trip for 78 of the 136 stages at
      m=65536/C=4096.
    - phase 2, level k in lgC+1..lg: strides > C are chunk-pair
      compare-exchanges (one round trip each); the stride-C stage is
      fused with the level's whole intra-chunk tail (j < lgC) while the
      pair is resident.
    Total HBM round trips: 1 + sum_{k>lgC}(k - lgC) = 11 at m=65536.
    """
    net = _hbm_network(m, C, blk, parts)

    def kernel(kh, vh, ko, vo, kb, vb, sems):
        run = net(pl.program_id(0) * _LANES, kb, vb, sems)
        run(kh, vh, ko, vo)

    return kernel


def _make_hbm_remap_kernel(m: int, C: int, blk: int):
    """Fused rank-order remap: BOTH sorts of
    ``sort_key_val(argsort(-adj), draws)`` in ONE dispatch.

    Sort 1 reads keys from ``adjn`` (= -adj, so ascending = adj
    descending) with a GENERATED row-index payload (no iota HBM read)
    and leaves the permutation in ``permT``; sort 2 re-reads ``permT``
    as keys (leaving it intact for the caller — the sorted keys go to
    the ``ks2`` scratch) carrying ``drawsT`` into ``xnewT``.  Saves one
    kernel launch (~1.5 ms on the shared pool) and the iota traffic per
    E13 iteration vs two ``bitonic_sort_kv_t`` calls."""
    net = _hbm_network(m, C, blk)

    def kernel(adjn, drawsT, ks1, permT, ks2, xnewT, kb, vb, sems):
        run = net(pl.program_id(0) * _LANES, kb, vb, sems)
        run(adjn, None, ks1, permT)
        run(permT, drawsT, ks2, xnewT)

    return kernel


# largest m whose (m, 128) f32 column tile (x4: keys/vals in and out)
# still fits VMEM for the resident kernel
_MAX_VMEM_M = 8192
_HBM_CHUNK = 4096


def _sort_t(kT, vT, interpret: bool):
    """Core (m, B)-layout sort along axis 0 (sublanes); see
    ``bitonic_sort_kv`` for the contract."""
    m, B = kT.shape
    if m & (m - 1):
        raise ValueError("sort length must be a power of two")
    if B % _LANES:
        raise ValueError(f"batch must be a multiple of {_LANES}")
    blk = min(_BLK, m)
    if m < 8:
        raise ValueError("sort length must be >= 8")

    if m <= _MAX_VMEM_M:
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
    else:
        C = _HBM_CHUNK
        kernel = _make_hbm_kernel(m, C, blk)
        call = pl.pallas_call(
            kernel,
            out_shape=(
                jax.ShapeDtypeStruct((m, B), jnp.float32),
                jax.ShapeDtypeStruct((m, B), jnp.float32),
            ),
            grid=(B // _LANES,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=(
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ),
            scratch_shapes=[
                pltpu.VMEM((2, C, _LANES), jnp.float32),
                pltpu.VMEM((2, C, _LANES), jnp.float32),
                pltpu.SemaphoreType.DMA((2, 2)),
            ],
            interpret=interpret,
        )
    with jax.enable_x64(False):
        return call(kT, vT)


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
    B = int(np.prod(lead)) if lead else 1
    ko, vo = _sort_t(keys.reshape(B, m).T, vals.reshape(B, m).T, interpret)
    return ko.T.reshape(keys.shape), vo.T.reshape(vals.shape)


@partial(jax.jit, static_argnames=("interpret",))
def bitonic_sort_kv_t(keysT, valsT, interpret: bool = False):
    """Transposed-layout sort: keys/vals are (m, B) and sort along the
    FIRST axis.  This is the kernel's native layout — callers that keep
    their state in (m, B) space skip the 4 strided (m, B)<->(B, m) HBM
    transposes per sort that ``bitonic_sort_kv`` pays (measured ~3.8 ms
    of the 9.48 ms round-4 remap sort at (128, 65536), vs 5.68 ms for
    the kernel itself — sort65k_probe.py).  Same unstable-tie contract.
    """
    keysT = jnp.asarray(keysT, dtype=jnp.float32)
    valsT = jnp.asarray(valsT, dtype=jnp.float32)
    if keysT.shape != valsT.shape or keysT.ndim != 2:
        raise ValueError("keysT and valsT must be equal-shape (m, B) arrays")
    return _sort_t(keysT, valsT, interpret)


@partial(jax.jit, static_argnames=("interpret",))
def bitonic_remap_t(adjnT, drawsT, interpret: bool = False):
    """Fused transposed-layout rank-order remap in ONE kernel dispatch.

    adjnT: (m, B) NEGATED adjustment keys (so ascending sort = adj
    descending); drawsT: (m, B) descending-sorted draws.  Returns
    ``(permT, xnewT)`` — permT f32 is argsort(adjnT, axis=0) and xnewT
    the draws remapped to adjnT's rank positions — exactly the two
    ``bitonic_sort_kv_t`` calls of the remap, but one launch: sort 1
    generates its row-index payload in-kernel and sort 2 chains off
    ``permT`` inside the same dispatch.  Falls back to two calls at
    VMEM-resident sizes.  Same unstable-tie contract.
    """
    adjnT = jnp.asarray(adjnT, dtype=jnp.float32)
    drawsT = jnp.asarray(drawsT, dtype=jnp.float32)
    if adjnT.shape != drawsT.shape or adjnT.ndim != 2:
        raise ValueError("adjnT and drawsT must be equal-shape (m, B) arrays")
    m, B = adjnT.shape
    if m & (m - 1):
        raise ValueError("sort length must be a power of two")
    if B % _LANES:
        raise ValueError(f"batch must be a multiple of {_LANES}")
    if m <= _MAX_VMEM_M:
        iotaT = jnp.broadcast_to(jnp.arange(m, dtype=jnp.float32)[:, None], (m, B))
        _, permT = _sort_t(adjnT, iotaT, interpret)
        _, xnewT = _sort_t(permT, drawsT, interpret)
        return permT, xnewT
    C = _HBM_CHUNK
    call = pl.pallas_call(
        _make_hbm_remap_kernel(m, C, min(_BLK, m)),
        out_shape=(jax.ShapeDtypeStruct((m, B), jnp.float32),) * 4,
        grid=(B // _LANES,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
        out_specs=(pl.BlockSpec(memory_space=pl.ANY),) * 4,
        scratch_shapes=[
            pltpu.VMEM((2, C, _LANES), jnp.float32),
            pltpu.VMEM((2, C, _LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        interpret=interpret,
    )
    with jax.enable_x64(False):
        _, permT, _, xnewT = call(adjnT, drawsT)
    return permT, xnewT


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
