"""2-D (8, L) state layout for the sym celerite kernel — experiment, v2.

All refs strictly 2-D (Mosaic rejected the 3-D blockspec/scratch form
with a backend crash): per-time arrays are (n_pad*8, L) with rows
n*8+w, read per step as ref[pl.ds(n*8, 8), :] -> (8, L).  Propagators
fill per block via an independent (chain-free) fori loop.  State rides
the fori carry as (8, L) values and persists across time blocks in a
(19*8, L) scratch.

Motivation (_scratch/sublane_probe.py): dependent mul-add chains run
1.75x faster on (8, 256) than on (2048,), and (8, 2048) does 8x the
elements at the same latency.
"""
import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import mind_the_gaps_tpu  # noqa: F401
from mind_the_gaps_tpu.kernels import DampedRandomWalk, Lorentzian
from mind_the_gaps_tpu.ops import pallas_log_likelihood

SUB = 8
NSTATE = 19


def build(N, tile, tb, unroll=4):
    L = tile // SUB
    n_blocks = -(-N // tb)
    n_pad = n_blocks * tb

    pidx = {(0, 0): 0, (0, 1): 1, (0, 2): 2, (1, 1): 3, (1, 2): 4, (2, 2): 5}

    def sidx(a, b):
        return pidx[(a, b)] if a <= b else pidx[(b, a)]

    def kernel(dt_ref, r_ref, A_ref, co_ref, out_ref, er_scr, pc_scr, ps_scr, st_scr):
        j = pl.program_id(1)

        def co(q):
            return co_ref[q * SUB:(q + 1) * SUB, :]

        ar, cr, ac, bc, cc, dc = (co(q) for q in range(6))
        k0 = ar + ac
        u = (ar, ac, bc)
        one = jnp.ones((SUB, L), dtype=jnp.float32)
        zero = jnp.zeros((SUB, L), dtype=jnp.float32)

        # chain-free propagator fill (independent iterations)
        def fill(n, _):
            s = pl.ds(n * SUB, SUB)
            dtn = dt_ref[s, :]
            er_scr[s, :] = jnp.exp(-dtn * cr)
            ecd = jnp.exp(-dtn * cc)
            arg = dtn * dc
            pc_scr[s, :] = ecd * jnp.cos(arg)
            ps_scr[s, :] = ecd * jnp.sin(arg)
            return jnp.int32(0)

        jax.lax.fori_loop(jnp.int32(0), jnp.int32(tb), fill, jnp.int32(0))

        @pl.when(j == 0)
        def _init():
            r0 = r_ref[0:SUB, :]
            A0 = A_ref[0:SUB, :] + k0
            for q in range(6):
                st_scr[q * SUB:(q + 1) * SUB, :] = zero
            st_scr[6 * SUB:7 * SUB, :] = one / A0
            st_scr[7 * SUB:8 * SUB, :] = one / A0
            st_scr[8 * SUB:9 * SUB, :] = zero
            for q in (9, 10, 11):
                st_scr[q * SUB:(q + 1) * SUB, :] = zero
            st_scr[12 * SUB:13 * SUB, :] = A0
            st_scr[13 * SUB:14 * SUB, :] = r0
            st_scr[14 * SUB:15 * SUB, :] = jnp.log(jnp.abs(A0))
            st_scr[15 * SUB:16 * SUB, :] = zero
            st_scr[16 * SUB:17 * SUB, :] = r0 * r0 / A0
            st_scr[17 * SUB:18 * SUB, :] = zero
            st_scr[18 * SUB:19 * SUB, :] = jnp.where(A0 > 0.0, one, zero)

        def step(n, st):
            s = pl.ds(n * SUB, SUB)
            er = er_scr[s, :]
            Cv = pc_scr[s, :]
            Sv = ps_scr[s, :]
            rn = r_ref[s, :]
            An = A_ref[s, :] + k0

            s_prev = st[0:6]
            W = st[6:9]
            f = st[9:12]
            D_prev, z_prev, logdet, lc_, quad, qc_, okp = st[12:]

            m = {}
            for i in range(3):
                for jj in range(i, 3):
                    m[(i, jj)] = s_prev[sidx(i, jj)] + D_prev * W[i] * W[jj]

            def M(i, jj):
                return m[(i, jj)] if i <= jj else m[(jj, i)]

            memoT = {}

            def T(i, jj):
                if (i, jj) in memoT:
                    return memoT[(i, jj)]
                if i == 0:
                    val = er * M(0, jj)
                elif i == 1:
                    val = Cv * M(1, jj) - Sv * M(2, jj)
                else:
                    val = Sv * M(1, jj) + Cv * M(2, jj)
                memoT[(i, jj)] = val
                return val

            s_new = [None] * 6
            for i in range(3):
                for jj in range(i, 3):
                    if jj == 0:
                        s_new[pidx[(i, jj)]] = T(i, 0) * er
                    elif jj == 1:
                        s_new[pidx[(i, jj)]] = Cv * T(i, 1) - Sv * T(i, 2)
                    else:
                        s_new[pidx[(i, jj)]] = Sv * T(i, 1) + Cv * T(i, 2)

            def S_new(i, jj):
                return s_new[sidx(i, jj)]

            Su = []
            for i in range(3):
                acc = S_new(i, 0) * u[0]
                for jj in range(1, 3):
                    acc = acc + S_new(i, jj) * u[jj]
                Su.append(acc)
            uSu = Su[0] * u[0] + Su[1] * u[1] + Su[2] * u[2]
            D = An - uSu
            Dinv = 1.0 / D
            W_new = ((one - Su[0]) * Dinv, (one - Su[1]) * Dinv, (0.0 - Su[2]) * Dinv)

            g = tuple(f[i] + W[i] * z_prev for i in range(3))
            f_new = (er * g[0], Cv * g[1] - Sv * g[2], Sv * g[1] + Cv * g[2])
            uf = u[0] * f_new[0] + u[1] * f_new[1] + u[2] * f_new[2]
            z = rn - uf

            x1 = jnp.log(jnp.abs(D)) - lc_
            t1 = logdet + x1
            lc_n = (t1 - logdet) - x1
            x2 = z * z * Dinv - qc_
            t2 = quad + x2
            qc_n = (t2 - quad) - x2
            ok_n = okp * jnp.where(D > 0.0, one, zero)

            return tuple(s_new) + W_new + f_new + (D, z, t1, lc_n, t2, qc_n, ok_n)

        n_hi = jnp.minimum(jnp.int32(tb), jnp.int32(N) - j * jnp.int32(tb))
        start = jnp.where(j == jnp.int32(0), jnp.int32(1), jnp.int32(0))

        st0 = tuple(st_scr[q * SUB:(q + 1) * SUB, :] for q in range(NSTATE))
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
        for q in range(NSTATE):
            st_scr[q * SUB:(q + 1) * SUB, :] = st[q]

        ll = -0.5 * (st[16] + st[14] + N * math.log(2.0 * math.pi))
        out_ref[...] = jnp.where(st[18] > 0.5, ll, -jnp.inf)

    def run(coeffs_p, dt2, r2, A2, B):
        grid = (B // tile, n_blocks)
        call = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((SUB, B // SUB), jnp.float32),
            grid=grid,
            in_specs=[
                pl.BlockSpec((tb * SUB, L), lambda i, jb: (jb, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((tb * SUB, L), lambda i, jb: (jb, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((tb * SUB, L), lambda i, jb: (jb, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((6 * SUB, L), lambda i, jb: (0, i), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((SUB, L), lambda i, jb: (0, i), memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((tb * SUB, L), jnp.float32),
                pltpu.VMEM((tb * SUB, L), jnp.float32),
                pltpu.VMEM((tb * SUB, L), jnp.float32),
                pltpu.VMEM((NSTATE * SUB, L), jnp.float32),
            ],
        )
        return call(dt2, r2, A2, coeffs_p)

    return run, n_pad, L


def main():
    n_points = 5000
    rng = np.random.default_rng(0)
    t = np.cumsum(rng.uniform(2.0, 8.0, n_points))
    y = rng.normal(0.0, 2.0, n_points).astype(np.float32)
    diag = np.full(n_points, 0.09, dtype=np.float32)
    kernel = DampedRandomWalk(log_S0=1.0, log_omega0=-3.0) + Lorentzian(
        log_S0=-1.0, log_Q=2.0, log_omega0=-2.0
    )
    theta0 = kernel.get_parameter_vector()

    B = 65536
    thetas = jnp.asarray(theta0, dtype=jnp.float32) + 0.05 * jax.random.normal(
        jax.random.key(1), (B, len(theta0)), dtype=jnp.float32
    )

    def coeffs_of(th):
        ar, cr, ac, bc, cc, dc = jax.vmap(kernel.coefficients)(th)
        return jnp.stack([ar[:, 0], cr[:, 0], ac[:, 0], bc[:, 0], cc[:, 0], dc[:, 0]])  # (6, B)

    dt_full = np.diff(t, prepend=t[0]).astype(np.float32)

    for tile, tb, unroll in [(2048, 256, 4), (2048, 256, 8), (4096, 128, 4),
                             (8192, 64, 4), (2048, 512, 4), (16384, 32, 4)]:
        L = tile // SUB
        run, n_pad, L = build(n_points, tile, tb, unroll=unroll)

        dt_p = jnp.asarray(np.pad(dt_full, (0, n_pad - n_points)))
        y_p = jnp.asarray(np.pad(y, (0, n_pad - n_points)))
        d_p = jnp.asarray(np.pad(diag, (0, n_pad - n_points), constant_values=1.0))

        @jax.jit
        def sweep2d(th):
            co = coeffs_of(th)  # (6, B)
            nt = B // tile
            co_p = (
                co.reshape(6, nt, SUB, L).transpose(0, 2, 1, 3).reshape(6, SUB, nt * L)
                .reshape(6 * SUB, nt * L)
            )
            def expand(v):
                return jnp.broadcast_to(v[:, None], (n_pad, SUB * L)).reshape(n_pad * SUB, L)
            with jax.enable_x64(False):
                out = run(co_p, expand(dt_p), expand(y_p), expand(d_p), B)
            out = out.reshape(SUB, nt, L).transpose(1, 0, 2).reshape(B)
            return out

        @jax.jit
        def sweep_ref(th):
            return pallas_log_likelihood(
                jax.vmap(kernel.coefficients)(th), jnp.asarray(t, dtype=jnp.float32),
                jnp.asarray(y), jnp.asarray(diag), tile=2048, time_block=512,
            )

        try:
            o2 = sweep2d(thetas)
            o1 = sweep_ref(thetas)
            err = float(jnp.max(jnp.abs(o2 - o1)))
        except Exception as e:
            print(f"tile={tile} tb={tb} u={unroll}: FAIL {type(e).__name__}: {str(e)[:120]}", flush=True)
            continue

        reps = 3
        best = 0.0
        for loop in range(3):
            xs = [jnp.asarray(theta0, dtype=jnp.float32) + 0.05 * jax.random.normal(
                jax.random.key(100 * loop + r + 2), (B, len(theta0)), dtype=jnp.float32)
                for r in range(reps)]
            _ = [float(x[0, 0]) for x in xs]
            t0 = time.perf_counter()
            acc = 0.0
            for x in xs:
                acc = acc + jnp.sum(sweep2d(x))
            float(acc)
            el = time.perf_counter() - t0
            if loop > 0:
                best = max(best, B * reps / el)
        print(f"tile={tile:6d} tb={tb:4d} u={unroll}: {best/1e6:7.3f} M evals/s  (max|diff| {err:.2e})", flush=True)


if __name__ == "__main__":
    main()
