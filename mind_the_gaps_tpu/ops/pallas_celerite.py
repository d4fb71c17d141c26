"""Pallas TPU kernel for the batched celerite log-likelihood.

The XLA while-loop version (solver/batched.py) loses most of the VPU to
loop machinery: measured on a v5e chip at N=5k, B=16k (fetch-forced
timing) the XLA scan does ~70k likelihood evals/s while this kernel does
~440k (6x).  The whole recursion state — S (flattened R^2 x tile),
W/f (R x tile), D/z and the Kahan accumulators — stays resident in VMEM
scratch per batch tile across the entire time loop.

Structure:
- grid = (batch_tiles, time_blocks); the time axis is the *minor* grid
  dimension, so consecutive time blocks of one batch tile run
  back-to-back and the scratch state carries across them (TPU grid
  iteration is sequential per core).  Time-blocking keeps the streamed
  series blocks small enough for VMEM at any N.
- data may be shared across the batch (y: (N,)) or per-group
  (y: (G, N), B = G*repeats — the bootstrap layout); the per-lane
  expansion of a group row happens in-kernel as a 0/1 selection matmul
  at HIGHEST precision (jnp.repeat does not lower in Mosaic).
- same math as solver/batched.py: local-phase rotation propagators and
  Kahan-compensated accumulation.

Mosaic constraints encoded here (discovered the hard way, see
tests/test_pallas_kernel.py and the repo memory):
- loop state in VMEM scratch refs, not fori_loop carries (3-D/bool
  carries fail to legalize);
- int32 loop bounds/carries, and pallas_call traced with x64 disabled
  (global x64 makes grid scalars i64 -> 'func.return' legalization
  failure); the f64 variant is CPU/interpret-only;
- no `jnp.where(c, 1.0, 0.0)` (f64 vector under x64), no `rev`.
"""
from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["pallas_log_likelihood"]

_LANES = 128
_TIME_BLOCK = 256


def _make_kernel(Jr: int, Jc: int, N: int, n_blocks: int, tb: int, dtype, tile: int, grouped: bool, needs_mask: bool, g_tile: int):
    R = Jr + 2 * Jc
    _T = tile

    def kernel(
        dt_ref, y_ref, diag_ref,
        ar_ref, cr_ref, ac_ref, bc_ref, cc_ref, dc_ref, mean_ref, jit_ref, e_ref,
        out_ref,
        S_scr, W_scr, f_scr, misc_scr, yx_scr, dx_scr,
    ):
        # misc_scr rows: 0=D, 1=z, 2=logdet, 3=logdet_c, 4=quad, 5=quad_c, 6=ok(1/0)
        j = pl.program_id(1)  # time block

        arT = ar_ref[:, :] if Jr else None
        crT = cr_ref[:, :] if Jr else None
        acT = ac_ref[:, :] if Jc else None
        bcT = bc_ref[:, :] if Jc else None
        ccT = cc_ref[:, :] if Jc else None
        dcT = dc_ref[:, :] if Jc else None
        mean = mean_ref[0, :]

        # Per-block expansion of the data series into (tb, tile) scratch:
        # rows then read as full vectors (dynamic scalar reads from the
        # (tb, 1)-shaped series blocks are an order of magnitude slower).
        # (tb, g_tile) -> (tb, tile) lanes in one MXU matmul per series;
        # for shared data E is a row of ones (lane broadcast on the MXU —
        # Mosaic's vector lane-broadcast from a 1-lane block is orders of
        # magnitude slower)
        def fill(dst, src):
            if grouped and g_tile == _T:
                # repeats == 1: every batch element has its own series
                # row — the expansion is the identity, skip the matmul
                dst[:, :] = src[:, :]
            else:
                dst[:, :] = jax.lax.dot_general(
                    src[:, :], e_ref[:, :], (((1,), (0,)), ((), ())),
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=dtype,
                )

        fill(yx_scr, y_ref)
        fill(dx_scr, diag_ref)

        def expand_row(ref, n, which):
            """Data row -> per-lane (tile,) vector."""
            return (yx_scr if which == 0 else dx_scr)[n, :]

        k0 = jit_ref[0, :]  # per-element extra diagonal (jitter)
        if Jr:
            k0 = k0 + jnp.sum(arT, axis=0)
        if Jc:
            k0 = k0 + jnp.sum(acT, axis=0)

        rows_u, rows_v = [], []
        if Jr:
            rows_u.append(arT)
            rows_v.append(jnp.ones_like(arT))
        if Jc:
            z2 = jnp.zeros_like(acT)
            o2 = jnp.ones_like(acT)
            rows_u.append(jnp.concatenate([acT[:, None, :], bcT[:, None, :]], 1).reshape(2 * Jc, _T))
            rows_v.append(jnp.concatenate([o2[:, None, :], z2[:, None, :]], 1).reshape(2 * Jc, _T))
        u = jnp.concatenate(rows_u, 0) if len(rows_u) > 1 else rows_u[0]
        v = jnp.concatenate(rows_v, 0) if len(rows_v) > 1 else rows_v[0]

        def apply_P(x, er, ecc, ecs):
            outs = []
            if Jr:
                outs.append(er * x[:Jr])
            if Jc:
                xc = x[Jr:].reshape(Jc, 2, *x.shape[1:])
                x1, x2 = xc[:, 0], xc[:, 1]
                y1 = ecc * x1 - ecs * x2
                y2 = ecs * x1 + ecc * x2
                outs.append(jnp.concatenate([y1[:, None], y2[:, None]], 1).reshape(2 * Jc, *x.shape[1:]))
            return jnp.concatenate(outs, 0) if len(outs) > 1 else outs[0]

        # ---- time block 0: initialize scratch from the first sample --- #
        @pl.when(j == 0)
        def _init():
            r0 = expand_row(y_ref, 0, 0) - mean
            A0 = expand_row(diag_ref, 0, 1) + k0
            S_scr[:, :] = jnp.zeros((R * R, _T), dtype=dtype)
            W_scr[:, :] = v / A0
            f_scr[:, :] = jnp.zeros((R, _T), dtype=dtype)
            misc_scr[0, :] = A0
            misc_scr[1, :] = r0
            misc_scr[2, :] = jnp.log(jnp.abs(A0))
            misc_scr[3, :] = jnp.zeros_like(A0)
            misc_scr[4, :] = r0 * r0 / A0
            misc_scr[5, :] = jnp.zeros_like(A0)
            misc_scr[6, :] = jnp.where(A0 > 0.0, jnp.ones_like(A0), jnp.zeros_like(A0))

        def body(n, _):
            # n is the row inside this time block; global index j*tb + n
            valid = (j * tb + n) < N if needs_mask else True

            dt_n = dt_ref[n, 0]
            y_n = expand_row(y_ref, n, 0)
            d_n = expand_row(diag_ref, n, 1)
            er = jnp.exp(-crT * dt_n) if Jr else None
            if Jc:
                ecd = jnp.exp(-ccT * dt_n)
                arg = dcT * dt_n
                ecc = ecd * jnp.cos(arg)
                ecs = ecd * jnp.sin(arg)
            else:
                ecc = ecs = None
            rn = y_n - mean
            An = d_n + k0

            S = S_scr[:, :].reshape(R, R, _T)
            D_prev = misc_scr[0, :]
            z_prev = misc_scr[1, :]
            W_prev = W_scr[:, :]
            f_prev = f_scr[:, :]

            S_new = S + D_prev * W_prev[:, None, :] * W_prev[None, :, :]
            er_w = None if er is None else er[:, None, :]
            ecc_w = None if ecc is None else ecc[:, None, :]
            ecs_w = None if ecs is None else ecs[:, None, :]
            S_new = apply_P(S_new, er_w, ecc_w, ecs_w)
            S_new = jnp.swapaxes(apply_P(jnp.swapaxes(S_new, 0, 1), er_w, ecc_w, ecs_w), 0, 1)

            Su = jnp.sum(S_new * u[None, :, :], axis=1)
            D = An - jnp.sum(u * Su, axis=0)
            W = (v - Su) / D
            f = apply_P(f_prev + W_prev * z_prev, er, ecc, ecs)
            z = rn - jnp.sum(u * f, axis=0)

            logdet, lc_ = misc_scr[2, :], misc_scr[3, :]
            quad, qc_ = misc_scr[4, :], misc_scr[5, :]
            x1 = jnp.log(jnp.abs(D)) - lc_
            t1 = logdet + x1
            lc_n = (t1 - logdet) - x1
            x2 = z * z / D - qc_
            t2 = quad + x2
            qc_n = (t2 - quad) - x2

            def _write():
                S_scr[:, :] = S_new.reshape(R * R, _T)
                W_scr[:, :] = W
                f_scr[:, :] = f
                misc_scr[0, :] = D
                misc_scr[1, :] = z
                misc_scr[2, :] = t1
                misc_scr[3, :] = lc_n
                misc_scr[4, :] = t2
                misc_scr[5, :] = qc_n
                misc_scr[6, :] = misc_scr[6, :] * jnp.where(D > 0.0, jnp.ones_like(D), jnp.zeros_like(D))

            if needs_mask:
                # padded rows (n_global >= N) are no-ops
                pl.when(valid)(_write)
            else:
                _write()

            return jnp.int32(0)

        start = jnp.where(j == jnp.int32(0), jnp.int32(1), jnp.int32(0))
        jax.lax.fori_loop(start, jnp.int32(tb), body, jnp.int32(0))

        # write the (running) result; the last time block's write wins
        ll = -0.5 * (misc_scr[4, :] + misc_scr[2, :] + N * math.log(2.0 * math.pi))
        out_ref[0, :] = jnp.where(misc_scr[6, :] > 0.5, ll, -jnp.inf)

    return kernel


def _make_kernel_sym(Jr: int, Jc: int, N: int, n_blocks: int, tb: int, dtype, tile: int, grouped: bool, needs_mask: bool, g_tile: int, unroll: int = 4, carry: bool = True):
    """Packed-symmetric variant of the kernel body: S is symmetric, so
    only its R(R+1)/2 unique entries are stored (one 8-sublane tile
    group at R=3 instead of two) and the update computes each output
    entry with closed-form block formulas instead of the full outer
    product + two dense P-rotations.  TPU-measured at R=3 (DRW+QPO,
    N=5k, B=64k): 1.05M evals/s vs 504k for the dense-S body (2.09x),
    max |diff| 2e-3 (round-3 experiment).

    Round 4 (see benchmarks/experiments/) restructured the serial
    time loop, 1.41M -> 1.97M evals/s on the same problem:
    - the per-row propagators (exp/cos/sin of the celerite recursion)
      plus the residual r = y - mean and diagonal A = diag + k0 are
      precomputed for the WHOLE time block as 2-D (tb, tile) vector ops
      right after the data fill — the dependency-chained body becomes
      pure mul-adds and row loads (+16% alone);
    - the fori upper bound is the block's true row count (the padded
      tail rows of a ragged N simply aren't executed) instead of a
      per-row pl.when mask (+16%);
    - the body is unrolled ``unroll`` time steps per fori iteration.

    The per-entry rows are generated by trace-time Python loops over the
    static block structure (real rows scale, complex pairs rotate), so
    any (Jr, Jc) lowers to straight row-vector arithmetic.
    """
    R = Jr + 2 * Jc
    nS = R * (R + 1) // 2
    _T = tile

    pidx = {}
    _k = 0
    for _i in range(R):
        for _j in range(_i, R):
            pidx[(_i, _j)] = _k
            _k += 1

    def sidx(i, j):
        return pidx[(i, j)] if i <= j else pidx[(j, i)]

    # static row structure: ('r', term) for real rows, ('c', pair, 0/1)
    row_kind = [("r", i) for i in range(Jr)] + [
        ("c", k, p) for k in range(Jc) for p in (0, 1)
    ]

    def kernel(
        dtw_ref, y_ref, diag_ref,
        ar_ref, cr_ref, ac_ref, bc_ref, cc_ref, dc_ref, mean_ref, jit_ref, e_ref,
        out_ref,
        S_scr, W_scr, f_scr, misc_scr, r_scr, A_scr, prop_scr,
    ):
        # misc rows: 0=D, 1=z, 2=logdet, 3=logdet_c, 4=quad, 5=quad_c, 6=ok
        j = pl.program_id(1)

        ar_rows = [ar_ref[i, :] for i in range(Jr)]
        cr_rows = [cr_ref[i, :] for i in range(Jr)]
        ac_rows = [ac_ref[i, :] for i in range(Jc)]
        bc_rows = [bc_ref[i, :] for i in range(Jc)]
        cc_rows = [cc_ref[i, :] for i in range(Jc)]
        dc_rows = [dc_ref[i, :] for i in range(Jc)]
        mean = mean_ref[0, :]

        identity_fill = grouped and g_tile == _T

        def expand(src):
            if identity_fill:
                return src[:, :]
            return jax.lax.dot_general(
                src[:, :], e_ref[:, :], (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=dtype,
            )

        k0 = jit_ref[0, :]
        for a in ar_rows:
            k0 = k0 + a
        for a in ac_rows:
            k0 = k0 + a

        # u = [ar..., (ac, bc)...], v = [1..., (1, 0)...]
        u = ar_rows + [x for k in range(Jc) for x in (ac_rows[k], bc_rows[k])]
        ones = jnp.ones((_T,), dtype=dtype)
        zeros = jnp.zeros((_T,), dtype=dtype)
        v = [ones] * Jr + [x for _ in range(Jc) for x in (ones, zeros)]

        # ---- whole-block precompute: 2-D ops outside the serial loop --
        r_scr[:, :] = expand(y_ref) - mean[None, :]
        A_scr[:, :] = expand(diag_ref) + k0[None, :]
        dtw = expand(dtw_ref)
        for i in range(Jr):
            prop_scr[i * tb : (i + 1) * tb, :] = jnp.exp(-dtw * cr_rows[i][None, :])
        for k in range(Jc):
            o = (Jr + 2 * k) * tb
            ecd = jnp.exp(-dtw * cc_rows[k][None, :])
            arg = dtw * dc_rows[k][None, :]
            prop_scr[o : o + tb, :] = ecd * jnp.cos(arg)
            prop_scr[o + tb : o + 2 * tb, :] = ecd * jnp.sin(arg)

        @pl.when(j == 0)
        def _init():
            r0 = r_scr[0, :]
            A0 = A_scr[0, :]
            S_scr[:, :] = jnp.zeros((nS, _T), dtype=dtype)
            for i in range(R):
                W_scr[i, :] = v[i] / A0
            f_scr[:, :] = jnp.zeros((R, _T), dtype=dtype)
            misc_scr[0, :] = A0
            misc_scr[1, :] = r0
            misc_scr[2, :] = jnp.log(jnp.abs(A0))
            misc_scr[3, :] = jnp.zeros_like(A0)
            misc_scr[4, :] = r0 * r0 / A0
            misc_scr[5, :] = jnp.zeros_like(A0)
            misc_scr[6, :] = jnp.where(A0 > 0.0, jnp.ones_like(A0), jnp.zeros_like(A0))

        def step(n, st=None):
            """One time step.  ``st=None``: state lives in scratch (the
            write-back form).  ``st`` a tuple: state rides the fori
            carry — it stays in vector registers across iterations and
            scratch is touched only at block boundaries (measured +8%
            at R=3; see the wrapper's carry heuristic)."""
            er = [prop_scr[i * tb + n, :] for i in range(Jr)]
            Cv = [prop_scr[(Jr + 2 * k) * tb + n, :] for k in range(Jc)]
            Sv = [prop_scr[(Jr + 2 * k + 1) * tb + n, :] for k in range(Jc)]
            rn = r_scr[n, :]
            An = A_scr[n, :]

            if st is None:
                D_prev = misc_scr[0, :]
                z_prev = misc_scr[1, :]
                W = [W_scr[i, :] for i in range(R)]
                f = [f_scr[i, :] for i in range(R)]
                s_prev = [S_scr[kk, :] for kk in range(nS)]
                logdet, lc_ = misc_scr[2, :], misc_scr[3, :]
                quad, qc_ = misc_scr[4, :], misc_scr[5, :]
                okp = misc_scr[6, :]
            else:
                s_prev = list(st[0:nS])
                W = list(st[nS : nS + R])
                f = list(st[nS + R : nS + 2 * R])
                (D_prev, z_prev, logdet, lc_, quad, qc_, okp) = st[nS + 2 * R :]

            # M = S + D_prev W W^T (packed)
            m = {}
            for i in range(R):
                for jj in range(i, R):
                    m[(i, jj)] = s_prev[sidx(i, jj)] + D_prev * W[i] * W[jj]

            def M(i, jj):
                return m[(i, jj)] if i <= jj else m[(jj, i)]

            # T = P M, computed lazily per entry (memoized; P block-diag)
            memoT = {}

            def T(i, jj):
                if (i, jj) in memoT:
                    return memoT[(i, jj)]
                kind = row_kind[i]
                if kind[0] == "r":
                    val = er[kind[1]] * M(i, jj)
                else:
                    k, p = kind[1], kind[2]
                    a = Jr + 2 * k
                    if p == 0:
                        val = Cv[k] * M(a, jj) - Sv[k] * M(a + 1, jj)
                    else:
                        val = Sv[k] * M(a, jj) + Cv[k] * M(a + 1, jj)
                memoT[(i, jj)] = val
                return val

            # S' = T P^T, only the packed upper triangle
            s_new = [None] * nS
            for i in range(R):
                for jj in range(i, R):
                    kind = row_kind[jj]
                    if kind[0] == "r":
                        s_new[pidx[(i, jj)]] = T(i, jj) * er[kind[1]]
                    else:
                        k, p = kind[1], kind[2]
                        a = Jr + 2 * k
                        if p == 0:
                            s_new[pidx[(i, jj)]] = Cv[k] * T(i, a) - Sv[k] * T(i, a + 1)
                        else:
                            s_new[pidx[(i, jj)]] = Sv[k] * T(i, a) + Cv[k] * T(i, a + 1)

            def S_new(i, jj):
                return s_new[sidx(i, jj)]

            Su = []
            for i in range(R):
                acc = S_new(i, 0) * u[0]
                for jj in range(1, R):
                    acc = acc + S_new(i, jj) * u[jj]
                Su.append(acc)
            uSu = Su[0] * u[0]
            for i in range(1, R):
                uSu = uSu + Su[i] * u[i]
            D = An - uSu
            Dinv = 1.0 / D
            W_new = [(v[i] - Su[i]) * Dinv for i in range(R)]

            # f' = P (f + W z)
            g = [f[i] + W[i] * z_prev for i in range(R)]
            f_new = []
            for i in range(R):
                kind = row_kind[i]
                if kind[0] == "r":
                    f_new.append(er[kind[1]] * g[i])
                else:
                    k, p = kind[1], kind[2]
                    a = Jr + 2 * k
                    if p == 0:
                        f_new.append(Cv[k] * g[a] - Sv[k] * g[a + 1])
                    else:
                        f_new.append(Sv[k] * g[a] + Cv[k] * g[a + 1])
            uf = u[0] * f_new[0]
            for i in range(1, R):
                uf = uf + u[i] * f_new[i]
            z = rn - uf

            x1 = jnp.log(jnp.abs(D)) - lc_
            t1 = logdet + x1
            lc_n = (t1 - logdet) - x1
            x2 = z * z * Dinv - qc_
            t2 = quad + x2
            qc_n = (t2 - quad) - x2
            ok_n = okp * jnp.where(D > 0.0, jnp.ones_like(D), jnp.zeros_like(D))

            if st is not None:
                return tuple(s_new) + tuple(W_new) + tuple(f_new) + (
                    D, z, t1, lc_n, t2, qc_n, ok_n,
                )

            for kk in range(nS):
                S_scr[kk, :] = s_new[kk]
            for i in range(R):
                W_scr[i, :] = W_new[i]
                f_scr[i, :] = f_new[i]
            misc_scr[0, :] = D
            misc_scr[1, :] = z
            misc_scr[2, :] = t1
            misc_scr[3, :] = lc_n
            misc_scr[4, :] = t2
            misc_scr[5, :] = qc_n
            misc_scr[6, :] = ok_n

        # dynamic trip count: the last time block of a ragged N runs only
        # its true rows — no per-row masking in the dependency chain
        n_hi = jnp.minimum(jnp.int32(tb), jnp.int32(N) - j * jnp.int32(tb))
        start = jnp.where(j == jnp.int32(0), jnp.int32(1), jnp.int32(0))

        if carry:
            st0 = tuple(S_scr[kk, :] for kk in range(nS)) + tuple(
                W_scr[i, :] for i in range(R)
            ) + tuple(f_scr[i, :] for i in range(R)) + tuple(
                misc_scr[q, :] for q in range(7)
            )
            if unroll > 1:
                def body_u(i, s):
                    n = start + unroll * i
                    for q in range(unroll):
                        s = step(n + q, s)
                    return s

                n_grp = (n_hi - start) // unroll
                st = jax.lax.fori_loop(jnp.int32(0), n_grp, body_u, st0)
                st = jax.lax.fori_loop(start + unroll * n_grp, n_hi, step, st)
            else:
                st = jax.lax.fori_loop(start, n_hi, step, st0)
            for kk in range(nS):
                S_scr[kk, :] = st[kk]
            for i in range(R):
                W_scr[i, :] = st[nS + i]
                f_scr[i, :] = st[nS + R + i]
            for q in range(7):
                misc_scr[q, :] = st[nS + 2 * R + q]
        elif unroll > 1:
            def body_u(i, _):
                n = start + unroll * i
                for q in range(unroll):
                    step(n + q)
                return jnp.int32(0)

            n_grp = (n_hi - start) // unroll
            jax.lax.fori_loop(jnp.int32(0), n_grp, body_u, jnp.int32(0))

            def body_tail(n, _):
                step(n)
                return jnp.int32(0)

            jax.lax.fori_loop(start + unroll * n_grp, n_hi, body_tail, jnp.int32(0))
        else:
            def body(n, _):
                step(n)
                return jnp.int32(0)

            jax.lax.fori_loop(start, n_hi, body, jnp.int32(0))

        ll = -0.5 * (misc_scr[4, :] + misc_scr[2, :] + N * math.log(2.0 * math.pi))
        out_ref[0, :] = jnp.where(misc_scr[6, :] > 0.5, ll, -jnp.inf)

    return kernel


@partial(jax.jit, static_argnames=("interpret", "tile", "repeats", "time_block", "sym", "unroll"))
def pallas_log_likelihood(
    coeffs, t, y, diag, mean=None, interpret: bool = False, tile: int = 2048,
    repeats: int = 1, extra_diag=None, time_block: int = _TIME_BLOCK,
    sym: bool = True, unroll: int = 4,
):
    """Batched log N(y | mean, K(theta_b)) via the Pallas kernel.

    coeffs: Coefficients with leading batch dim B (B % 128 == 0).
    y/diag: shared (N,) when repeats == 1, or per-group (G, N) with
    B = G*repeats (element b uses group b // repeats).  A 2-D y with
    repeats == 1 means G == B: every batch element has its OWN series —
    the per-walker-residual layout used when the GP mean model is fitted
    (each walker subtracts its own mean curve before the solve).
    mean / extra_diag: optional per-element (B,) vectors.
    float32 recommended on TPU (the f64 variant is CPU/interpret-only).
    ``sym`` (default): the packed-symmetric-S kernel body with
    whole-block propagator precompute, a dynamic loop trip count and
    ``unroll``-step body unrolling (1.97M evals/s at R=3, N=5k on a v5e
    chip vs 504k for the dense-S body); sym=False keeps the dense body
    for comparison.
    """
    ar, cr, ac, bc, cc, dc = coeffs
    B = ar.shape[0]
    if B % _LANES:
        raise ValueError(f"batch must be a multiple of {_LANES}")
    dtype = ar.dtype
    Jr, Jc = ar.shape[1], ac.shape[1]
    R = Jr + 2 * Jc
    # Multi-term kernels prefer a smaller batch tile: the state grows as
    # R^2/2 rows, and v5e-measured sweeps at N=10k show tile=1024
    # beating tile=2048 once R >= 7 (R=7: 477 vs 439 k evals/s; R=8:
    # 429 vs 355) while R=3 strongly prefers 2048 (2.1M vs 0.96M at
    # 1024, round 3) — ``tile`` is the upper preference, so cap it for
    # large-R kernels (also restores the vreg-carry form at R <= 6,
    # whose n_carry fits the register file only at tile <= 1024).
    if sym and R >= 5:
        tile = min(tile, 1024)
    per_element = repeats == 1 and jnp.ndim(y) == 2
    if per_element:
        if jnp.asarray(y).shape[0] != B:
            raise ValueError("per-element series (2-D y with repeats=1) needs y.shape[0] == B")
        if jnp.ndim(diag) == 1:
            diag = jnp.broadcast_to(jnp.asarray(diag, dtype=dtype)[None, :], jnp.asarray(y).shape)
    if repeats > 1 and jnp.ndim(y) == 2 and jnp.ndim(diag) == 1:
        # a shared 1-D diag with grouped series: broadcast to (G, N) —
        # feeding it through the (G, N) padding path as-is would build a
        # nonsense (N, n_pad) operand that Mosaic rejects at lowering
        diag = jnp.broadcast_to(jnp.asarray(diag, dtype=dtype)[None, :], jnp.asarray(y).shape)
    grouped = repeats > 1 or per_element

    if not grouped:
        # Route shared data through the grouped path: Mosaic vector ops
        # on 1-lane-wide operands (broadcast or K=1 matmul from an (N,1)
        # block) are pathologically slow, so replicate the series into
        # >=128 identical group columns and use the same wide-layout
        # expansion matmul as the bootstrap case.
        repeats = max(tile // _LANES, 1)
        while B % repeats:
            repeats //= 2
        if repeats > 1:
            g = B // repeats
            y = jnp.broadcast_to(jnp.asarray(y, dtype=dtype)[None, :], (g, jnp.asarray(y).shape[0]))
            diag = jnp.broadcast_to(jnp.asarray(diag, dtype=dtype)[None, :], (g, jnp.asarray(diag).shape[0]))
            grouped = True

    G = jnp.asarray(y).shape[0] if grouped else 0
    R_state = (R * (R + 1)) // 2 if sym else R * R

    def _tile_ok(tl):
        if tl < 1 or B % tl:
            return False
        if not grouped:
            return True
        if tl % repeats:
            return False
        gt = tl // repeats
        # Mosaic block constraint: trailing block dim divisible by 128
        # or equal to the full array dimension
        return gt % _LANES == 0 or gt == G

    itemsize = jnp.dtype(dtype).itemsize

    def _vmem_bytes(tl, tb_):
        """Model of the kernel's VMEM footprint: scratch rows x tile
        (sym body: precomputed r/A + the R per-row propagator blocks +
        state; dense body: expanded y/diag + state), the streamed data
        blocks, and the expansion matrix.  Calibrated against observed
        v5e compiles: 11-12 MB configs compile, the 25.5 MB
        (tile=B=6144) and 21 MB (tb=1024) ones OOM the 16 MB
        scoped-vmem limit."""
        gt = tl // repeats if grouped else 1
        if sym:
            scratch_rows = (R + 2) * tb_ + R_state + 2 * R + 9
            stream = 3 * tb_ * gt
        else:
            scratch_rows = 2 * tb_ + R_state + 2 * R + 9
            stream = 2 * tb_ * gt + tb_
        e_rows = 8 if (grouped and gt == tl) else (gt if grouped else 1)
        return (scratch_rows * tl + stream + e_rows * tl) * itemsize

    _VMEM_BUDGET = 13 * 1024 * 1024

    t64 = jnp.asarray(t)
    N = t64.shape[0]
    tb_pref = min(time_block, N)
    tb_pref -= tb_pref % 8 or 0
    tb_pref = max(tb_pref, 8)

    def _fits(tl, tb_):
        return _tile_ok(tl) and (interpret or _vmem_bytes(tl, tb_) <= _VMEM_BUDGET)

    def _pick_tile(tb_):
        tl = min(tile, B)
        while tl >= _LANES:
            if _fits(tl, tb_):
                return tl
            tl //= 2
        if grouped:
            # group-aligned tiles (repeats * 128 * m) — the valid shapes
            # when repeats is not a power of two (e.g. 12 walkers ->
            # repeats 6: halving 2048 never reaches the legal 768)
            base = repeats * _LANES
            for m in range(min(tile, B) // max(base, 1), 0, -1):
                cand = base * m
                if cand <= B and _fits(cand, tb_):
                    return cand
        # last resort: one tile spanning the whole batch (gt == G is
        # always legal); covers ragged chunk remainders like
        # G = 272, half = 8 -> B = 2176 with no 128-aligned divisor
        if _fits(B, tb_):
            return B
        return None

    # Prefer a large batch tile over a large time block: the tile
    # amortizes the serial loop across more batch elements (measured
    # 2048/tb128 ~ 2048/tb256 >> 1024/tb256), so scan tb downward and
    # keep the config with the largest tile (largest tb on ties).
    tb_cands, _c = [], tb_pref
    while True:
        tb_cands.append(_c)
        if _c <= 8:
            break
        _c = max(8, (_c // 2) - ((_c // 2) % 8))
    chosen, tb = None, tb_pref
    for tb_c in tb_cands:
        cand = _pick_tile(tb_c)
        if cand is not None and (chosen is None or cand > chosen):
            chosen, tb = cand, tb_c
            if cand >= min(tile, B):
                break
    if chosen is None:
        raise ValueError(
            "no valid tile: need tile | B and, for grouped data, "
            "repeats | tile with tile/repeats a multiple of 128 (or == G), "
            "within the VMEM budget"
        )
    tile = chosen
    g_tile = tile // repeats if grouped else 1
    n_blocks = -(-N // tb)
    n_pad = n_blocks * tb
    needs_mask = n_pad != N

    dt_full = jnp.diff(t64, prepend=t64[:1]).astype(dtype)
    dt = jnp.zeros((n_pad,), dtype=dtype).at[:N].set(dt_full).reshape(n_pad, 1)

    def pad_series(x, fill):
        x = jnp.asarray(x, dtype=dtype)
        if grouped:
            xp = jnp.full((x.shape[0], n_pad), fill, dtype=dtype).at[:, :N].set(x)
            return xp.T  # (n_pad, G)
        xp = jnp.full((n_pad,), fill, dtype=dtype).at[:N].set(x)
        return xp.reshape(n_pad, 1)

    y2 = pad_series(y, 0.0)
    d2 = pad_series(diag, 1.0)
    identity_fill = grouped and g_tile == tile
    if identity_fill:
        # the kernel never reads E on the identity path — a dummy keeps
        # the (g_tile, tile) = (tile, tile) matrix out of VMEM
        E = jnp.zeros((8, tile), dtype=dtype)
    elif grouped:
        eye = jnp.eye(g_tile, dtype=dtype)
        E = jnp.repeat(eye, repeats, axis=1)  # (g_tile, tile)
    else:
        E = jnp.ones((1, tile), dtype=dtype)  # lane broadcast
    if mean is None:
        mean = jnp.zeros((B,), dtype=dtype)
    mean2 = jnp.asarray(mean, dtype=dtype).reshape(1, B)
    if extra_diag is None:
        extra_diag = jnp.zeros((B,), dtype=dtype)
    jit2 = jnp.asarray(extra_diag, dtype=dtype).reshape(1, B)

    def bspec_coeff(j):
        return pl.BlockSpec((max(j, 1), tile), lambda i, jb: (0, i), memory_space=pltpu.VMEM)

    def bspec_series(width):
        return pl.BlockSpec((tb, width), lambda i, jb: (jb, 0 if width == 1 else i), memory_space=pltpu.VMEM)

    make = _make_kernel_sym if sym else _make_kernel
    if sym:
        # carry the recursion state through the fori loop (vregs) when
        # it fits the register file; R=3 at tile 2048 is 19 carries x 2
        # vregs = 38 live vregs (+8% measured), R=6 at tile 2048 would
        # be 80 -> spill, keep it in scratch there
        nS_ = R * (R + 1) // 2
        n_carry = nS_ + 2 * R + 7
        # tile=128 carries are single-vreg rows, which SIGABRT the
        # Mosaic compiler for the real-terms-only (Jc=0) body — gate
        # carry to tile >= 256 (probe shapes stay on the scratch form)
        use_carry = tile >= 256 and n_carry * max(tile // 1024, 1) <= 48
        kernel = make(
            Jr, Jc, N, n_blocks, tb, dtype, tile, grouped, needs_mask, g_tile,
            unroll=unroll, carry=use_carry,
        )
    else:
        kernel = make(Jr, Jc, N, n_blocks, tb, dtype, tile, grouped, needs_mask, g_tile)
    grid = (B // tile, n_blocks)

    if sym:
        # the sym body precomputes whole-block propagators from a WIDE
        # dt (one (n_pad, g_tile) block column shared by every tile);
        # per-row scratch holds r = y - mean, A = diag + k0 and the R
        # propagator row blocks instead of raw y/diag
        gw = max(g_tile, 1)
        dt_arg = jnp.broadcast_to(dt, (n_pad, gw))
        dt_spec = pl.BlockSpec((tb, gw), lambda i, jb: (jb, 0), memory_space=pltpu.VMEM)
        data_scratch = [
            pltpu.VMEM((tb, tile), dtype),      # r = y - mean
            pltpu.VMEM((tb, tile), dtype),      # A = diag + k0
            pltpu.VMEM((R * tb, tile), dtype),  # propagator rows
        ]
    else:
        dt_arg = dt
        dt_spec = bspec_series(1)
        data_scratch = [
            pltpu.VMEM((tb, tile), dtype),  # expanded y
            pltpu.VMEM((tb, tile), dtype),  # expanded diag
        ]

    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, B), dtype),
        grid=grid,
        in_specs=[
            dt_spec,  # dt (wide for the sym body, narrow for the dense)
            bspec_series(g_tile if grouped else 1),  # y
            bspec_series(g_tile if grouped else 1),  # diag
            bspec_coeff(Jr),
            bspec_coeff(Jr),
            bspec_coeff(Jc),
            bspec_coeff(Jc),
            bspec_coeff(Jc),
            bspec_coeff(Jc),
            pl.BlockSpec((1, tile), lambda i, jb: (0, i), memory_space=pltpu.VMEM),  # mean
            pl.BlockSpec((1, tile), lambda i, jb: (0, i), memory_space=pltpu.VMEM),  # jitter
            pl.BlockSpec(E.shape, lambda i, jb: (0, 0), memory_space=pltpu.VMEM),  # expansion
        ],
        out_specs=pl.BlockSpec((1, tile), lambda i, jb: (0, i), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((R_state, tile), dtype),
            pltpu.VMEM((R, tile), dtype),
            pltpu.VMEM((R, tile), dtype),
            pltpu.VMEM((8, tile), dtype),
        ]
        + data_scratch,
        interpret=interpret,
    )

    args = (
        dt_arg,
        y2,
        d2,
        _pad_j(ar.T, Jr, B, dtype),
        _pad_j(cr.T, Jr, B, dtype),
        _pad_j(ac.T, Jc, B, dtype),
        _pad_j(bc.T, Jc, B, dtype),
        _pad_j(cc.T, Jc, B, dtype),
        _pad_j(dc.T, Jc, B, dtype),
        mean2,
        jit2,
        E,
    )

    # Mosaic rejects the i64 grid scalars that global-x64 tracing makes
    if dtype == jnp.float32:
        with jax.enable_x64(False):
            out = call(*args)
    else:
        out = call(*args)
    return out[0]


def _pad_j(x, j, b, dtype):
    """Ensure a (J, B) array exists even when J == 0 (1-row dummy)."""
    if j == 0:
        return jnp.zeros((1, b), dtype=dtype)
    return x
