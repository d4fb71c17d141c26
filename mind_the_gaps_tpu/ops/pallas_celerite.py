"""Pallas TPU kernel for the batched celerite log-likelihood.

The XLA while-loop version (solver/batched.py) reaches a few percent of
VPU peak: every scan step re-synchronizes its carry state through the
loop machinery.  This kernel keeps the whole recursion state — S
(flattened R^2 x 128), W/f (R x 128), D/z and the Kahan accumulators —
resident in VMEM scratch per 128-lane batch tile for the entire time
loop, streaming only the (N,) time/data series.

Same math as solver/batched.py (local-phase rotation form, Kahan
accumulation); shared y/diag across the batch (the observed-data MCMC
case).  Batch must be a multiple of 128 (pad at the caller).

Mosaic notes: loop state is held in VMEM scratch refs (not fori_loop
carries — 3-D/bool carried values fail to legalize); all in-body values
are 2-D (sublanes x lanes) except transient reshapes.
"""
from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["pallas_log_likelihood"]

_TILE = 128  # minimum tile; the call uses a wider per-program tile


def _make_kernel(Jr: int, Jc: int, N: int, dtype, tile: int, grouped: bool = False):
    R = Jr + 2 * Jc
    _T = tile

    def kernel(
        dt_ref, y_ref, diag_ref,
        ar_ref, cr_ref, ac_ref, bc_ref, cc_ref, dc_ref, mean_ref, jit_ref, e_ref,
        out_ref,
        S_scr, W_scr, f_scr, misc_scr,
    ):
        def expand_row(ref, n):
            """Data row -> per-lane vector.  Grouped: (1, G_tile) row
            expanded to (1, tile) lanes by a 0/1 selection matmul (MXU,
            HIGHEST precision — jnp.repeat does not lower in Mosaic)."""
            if not grouped:
                return ref[n, 0]
            row = ref[pl.ds(n, 1), :]  # (1, G_tile)
            return jax.lax.dot_general(
                row, e_ref[:, :], (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=dtype,
            )[0]
        # misc_scr rows: 0=D, 1=z, 2=logdet, 3=logdet_c, 4=quad, 5=quad_c, 6=ok(1/0)
        arT = ar_ref[:, :] if Jr else None
        crT = cr_ref[:, :] if Jr else None
        acT = ac_ref[:, :] if Jc else None
        bcT = bc_ref[:, :] if Jc else None
        ccT = cc_ref[:, :] if Jc else None
        dcT = dc_ref[:, :] if Jc else None
        mean = mean_ref[0, :]

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
            """P applied to the leading (R) axis of x (R, ..., TILE)."""
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

        # ---- step 0: initialize scratch ------------------------------ #
        r0 = expand_row(y_ref, 0) - mean
        A0 = expand_row(diag_ref, 0) + k0
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
            dt_n = dt_ref[n, 0]
            y_n = expand_row(y_ref, n)
            d_n = expand_row(diag_ref, n)
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

            S = S + D_prev * W_prev[:, None, :] * W_prev[None, :, :]
            er_w = None if er is None else er[:, None, :]
            ecc_w = None if ecc is None else ecc[:, None, :]
            ecs_w = None if ecs is None else ecs[:, None, :]
            S = apply_P(S, er_w, ecc_w, ecs_w)
            S = jnp.swapaxes(apply_P(jnp.swapaxes(S, 0, 1), er_w, ecc_w, ecs_w), 0, 1)

            Su = jnp.sum(S * u[None, :, :], axis=1)
            D = An - jnp.sum(u * Su, axis=0)
            W = (v - Su) / D
            f = apply_P(f_prev + W_prev * z_prev, er, ecc, ecs)
            z = rn - jnp.sum(u * f, axis=0)

            # Kahan accumulation
            logdet, lc_ = misc_scr[2, :], misc_scr[3, :]
            quad, qc_ = misc_scr[4, :], misc_scr[5, :]
            x1 = jnp.log(jnp.abs(D)) - lc_
            t1 = logdet + x1
            lc_ = (t1 - logdet) - x1
            x2 = z * z / D - qc_
            t2 = quad + x2
            qc_ = (t2 - quad) - x2

            S_scr[:, :] = S.reshape(R * R, _T)
            W_scr[:, :] = W
            f_scr[:, :] = f
            misc_scr[0, :] = D
            misc_scr[1, :] = z
            misc_scr[2, :] = t1
            misc_scr[3, :] = lc_
            misc_scr[4, :] = t2
            misc_scr[5, :] = qc_
            misc_scr[6, :] = misc_scr[6, :] * jnp.where(D > 0.0, jnp.ones_like(D), jnp.zeros_like(D))
            return jnp.int32(0)

        # int32 everywhere: under jax x64 a Python-int carry/bound becomes
        # i64, which Mosaic's vector layout inference rejects
        jax.lax.fori_loop(jnp.int32(1), jnp.int32(N), body, jnp.int32(0))

        ll = -0.5 * (misc_scr[4, :] + misc_scr[2, :] + N * math.log(2.0 * math.pi))
        out_ref[0, :] = jnp.where(misc_scr[6, :] > 0.5, ll, -jnp.inf)

    return kernel


@partial(jax.jit, static_argnames=("interpret", "tile", "repeats"))
def pallas_log_likelihood(
    coeffs, t, y, diag, mean=None, interpret: bool = False, tile: int = 2048,
    repeats: int = 1, extra_diag=None,
):
    """Batched log N(y | mean, K(theta_b)) via the Pallas kernel.

    coeffs: Coefficients with leading batch dim B (B % 128 == 0).
    y/diag: shared (N,) when repeats == 1, or per-group (G, N) with
    B = G*repeats (element b uses group b // repeats — the bootstrap
    layout; the per-lane expansion happens in-kernel on the MXU).
    mean: optional per-element (B,).  extra_diag: optional per-element
    (B,) additive diagonal (jitter).  float32 recommended on TPU.
    ``tile``: lanes processed per grid program (wider tiles = more work
    per VPU instruction; clamped to B; must be a multiple of repeats).
    """
    ar, cr, ac, bc, cc, dc = coeffs
    B = ar.shape[0]
    if B % _TILE:
        raise ValueError(f"batch must be a multiple of {_TILE}")
    dtype = ar.dtype
    Jr, Jc = ar.shape[1], ac.shape[1]
    R = Jr + 2 * Jc
    grouped = repeats > 1

    tile = min(tile, B)
    while B % tile or (grouped and tile % repeats):
        tile //= 2
    tile = max(tile, _TILE)
    if grouped and (tile % repeats or B % tile):
        raise ValueError("could not find a tile size compatible with repeats")
    g_tile = tile // repeats if grouped else 1

    t64 = jnp.asarray(t)
    N = t64.shape[0]
    dt = jnp.diff(t64, prepend=t64[:1]).astype(dtype).reshape(N, 1)
    if grouped:
        y2 = jnp.asarray(y, dtype=dtype).T  # (N, G)
        d2 = jnp.asarray(diag, dtype=dtype).T
        # 0/1 expansion: lane g*repeats + w <- group g
        eye = jnp.eye(g_tile, dtype=dtype)
        E = jnp.repeat(eye, repeats, axis=1)  # (g_tile, tile)
    else:
        y2 = jnp.asarray(y, dtype=dtype).reshape(N, 1)
        d2 = jnp.asarray(diag, dtype=dtype).reshape(N, 1)
        E = jnp.zeros((1, 1), dtype=dtype)
    if mean is None:
        mean = jnp.zeros((B,), dtype=dtype)
    mean2 = jnp.asarray(mean, dtype=dtype).reshape(1, B)
    if extra_diag is None:
        extra_diag = jnp.zeros((B,), dtype=dtype)
    jit2 = jnp.asarray(extra_diag, dtype=dtype).reshape(1, B)

    def bspec_coeff(j):
        return pl.BlockSpec((max(j, 1), tile), lambda i: (0, i), memory_space=pltpu.VMEM)

    def bspec_series():
        if grouped:
            return pl.BlockSpec((N, g_tile), lambda i: (0, i), memory_space=pltpu.VMEM)
        return pl.BlockSpec((N, 1), lambda i: (0, 0), memory_space=pltpu.VMEM)

    kernel = _make_kernel(Jr, Jc, N, dtype, tile, grouped=grouped)
    grid = (B // tile,)

    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, B), dtype),
        grid=grid,
        in_specs=[
            bspec_series(),
            bspec_series(),
            bspec_series(),
            bspec_coeff(Jr),
            bspec_coeff(Jr),
            bspec_coeff(Jc),
            bspec_coeff(Jc),
            bspec_coeff(Jc),
            bspec_coeff(Jc),
            pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),  # mean
            pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),  # jitter
            pl.BlockSpec(E.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),  # expansion
        ],
        out_specs=pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((R * R, tile), dtype),
            pltpu.VMEM((R, tile), dtype),
            pltpu.VMEM((R, tile), dtype),
            pltpu.VMEM((8, tile), dtype),
        ],
        interpret=interpret,
    )

    args = (
        dt,
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

    # The package enables jax x64 globally, but Mosaic rejects the i64
    # grid/index-map scalars that x64 tracing produces ("failed to
    # legalize func.return").  The kernel math is dtype-explicit, so
    # trace the pallas_call with x64 off.
    if dtype == jnp.float32:
        # trace with x64 off so grid/index-map scalars stay i32
        # (an f64 kernel cannot trace under x64-off: its zeros/consts
        # would silently downcast — that path is CPU/interpret-only)
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
