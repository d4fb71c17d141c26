"""Does warm-starting the ALT refit from the null refit's optimum make
the alt chain plateau?

plateau_probe.py showed the DRW null plateaus by step ~130 (early stop
implemented) but the DRW+QPO alternative keeps improving through step
500 — most of that budget is the alt chain re-finding the DRW subspace
the null refit already located.  Here the alt walkers start per-sim at
[null_best_x, qpo defaults] instead of one shared theta0, and we record
the same best-loglike traces.

Usage: python benchmarks/experiments/plateau_probe2.py [--g 512]

MEASURED (v5e, G=512, DRW-true sims, 500 steps): NEGATIVE.  Warm-started
alt chains show the same improvement profile as cold ones — median
last-improving step 361 (warm) vs 350 (cold), mean final best-loglike
difference 0.03 (identical within MC noise).  The alt chain's slow gains
are genuine QPO-parameter exploration, not re-finding the DRW subspace,
so warm-starting frees no refit budget and the alt keeps its full 500
steps.  (The null refit's plateau early stop — plateau_probe.py — stands
and is wired into lrt.py.)
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))


def make_traced_runner(kernel, t, n_steps, walkers, dtype, per_sim_theta0=False):
    """plateau_probe.make_traced_runner with optional per-sim (G, D)
    theta0 (walker balls spread around each sim's own center)."""
    import jax
    import jax.numpy as jnp

    from mind_the_gaps_tpu.ops import pallas_log_likelihood

    nk = kernel.ndim
    t = jnp.asarray(t)
    lo = jnp.asarray([b[0] for b in kernel.get_parameter_bounds()])
    hi = jnp.asarray([b[1] for b in kernel.get_parameter_bounds()])
    half = walkers // 2
    a = 2.0

    def batched_core(key, ys, diags, theta0, percent):
        G = ys.shape[0]
        ys_c = jnp.asarray(ys, dtype=dtype)
        diags_c = jnp.asarray(diags, dtype=dtype)
        data_means = jnp.mean(ys_c, axis=1)
        mean_b = jnp.repeat(data_means, half)

        def log_prob_half(thetas):
            thetas = thetas.astype(dtype)
            tile = max(2048, half * 128)
            coeffs = jax.vmap(kernel.coefficients)(thetas)
            lp = jax.vmap(kernel.log_prior)(thetas)
            jitter = jax.vmap(kernel.jitter)(thetas)
            ll = pallas_log_likelihood(
                coeffs, t, ys_c, diags_c, mean=mean_b, repeats=half,
                extra_diag=jitter, tile=tile, time_block=512,
            )
            return jnp.where(jnp.isfinite(lp), lp + ll, -jnp.inf)

        def lp_eval(thetas_gwd):
            return log_prob_half(thetas_gwd.reshape(G * half, nk)).reshape(G, half)

        k_init, k_run = jax.random.split(key)
        theta0_ = theta0.astype(dtype)
        if per_sim_theta0:
            center = theta0_[:, None, :]  # (G, 1, D)
        else:
            center = theta0_  # (D,)
        std = jnp.abs(center) * percent
        init = center + std * jax.random.normal(k_init, (G, walkers, nk), dtype=dtype)
        span_lo = jnp.where(jnp.isfinite(lo), lo + 0.05 * jnp.abs(lo), -jnp.inf)
        span_hi = jnp.where(jnp.isfinite(hi), hi - 0.05 * jnp.abs(hi), jnp.inf)
        init = jnp.clip(init, span_lo.astype(init.dtype), span_hi.astype(init.dtype))

        def half_update(key, active, passive, logp_active):
            k_z, k_pick, k_acc = jax.random.split(key, 3)
            u = jax.random.uniform(k_z, (G, half), dtype=init.dtype)
            z = ((a - 1.0) * u + 1.0) ** 2 / a
            picks = jax.random.randint(k_pick, (G, half), 0, half)
            partners = jnp.take_along_axis(passive, picks[..., None], axis=1)
            proposal = partners + z[..., None] * (active - partners)
            logp_new = lp_eval(proposal)
            log_accept = (nk - 1.0) * jnp.log(z) + logp_new - logp_active
            accept = jnp.log(jax.random.uniform(k_acc, (G, half), dtype=init.dtype)) < log_accept
            new_active = jnp.where(accept[..., None], proposal, active)
            new_logp = jnp.where(accept, logp_new, logp_active)
            return new_active, new_logp

        logp0 = jnp.concatenate([lp_eval(init[:, :half]), lp_eval(init[:, half:])], axis=1)

        def step(carry, key):
            state, logp, best_lp, best_x = carry
            k1, k2 = jax.random.split(key)
            first, second = state[:, :half], state[:, half:]
            lp1, lp2 = logp[:, :half], logp[:, half:]
            first, lp1 = half_update(k1, first, second, lp1)
            second, lp2 = half_update(k2, second, first, lp2)
            state = jnp.concatenate([first, second], axis=1)
            logp = jnp.concatenate([lp1, lp2], axis=1)
            i = jnp.argmax(logp, axis=1)
            cand_lp = jnp.take_along_axis(logp, i[:, None], axis=1)[:, 0]
            cand_x = jnp.take_along_axis(state, i[:, None, None], axis=1)[:, 0]
            better = cand_lp > best_lp
            best_lp = jnp.where(better, cand_lp, best_lp)
            best_x = jnp.where(better[:, None], cand_x, best_x)
            return (state, logp, best_lp, best_x), best_lp

        i0 = jnp.argmax(logp0, axis=1)
        best_lp0 = jnp.take_along_axis(logp0, i0[:, None], axis=1)[:, 0]
        best_x0 = jnp.take_along_axis(init, i0[:, None, None], axis=1)[:, 0]
        keys = jax.random.split(k_run, n_steps)
        (_, _, best_lp, best_x), trace = jax.lax.scan(
            step, (init, logp0, best_lp0, best_x0), keys
        )
        return best_lp, best_x, trace

    import jax

    return jax.jit(batched_core)


def summarize(trace, tols=(0.01, 0.1, 0.5)):
    out = {}
    G = trace.shape[1]
    for tol in tols:
        imp = np.diff(trace, axis=0) > tol
        last = np.array([
            (np.nonzero(imp[:, g])[0][-1] + 1) if imp[:, g].any() else 0
            for g in range(G)
        ])
        out[f"last_improve_tol{tol}"] = {
            "median": int(np.median(last)),
            "p90": int(np.percentile(last, 90)),
            "max": int(last.max()),
        }
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--g", type=int, default=512)
    ap.add_argument("--steps", type=int, default=500)
    ap.add_argument("--n-points", type=int, default=5000)
    ap.add_argument("--walkers", type=int, default=16)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from mind_the_gaps_tpu.kernels import DampedRandomWalk, Lorentzian

    rng = np.random.default_rng(args.seed)
    n = args.n_points
    t = np.cumsum(rng.uniform(2.0, 8.0, n))
    G = args.g
    logS0 = 1.0 + rng.normal(0.0, 0.15, G)
    logw0 = -3.0 + rng.normal(0.0, 0.15, G)
    dy = 0.3
    ys = np.empty((G, n))
    for g in range(G):
        S0, w0 = np.exp(logS0[g]), np.exp(logw0[g])
        y = np.empty(n)
        y[0] = rng.normal(0.0, np.sqrt(S0))
        phi = np.exp(-w0 * np.diff(t))
        innov = rng.normal(0.0, np.sqrt(S0 * (1.0 - phi**2)))
        for i in range(1, n):
            y[i] = phi[i - 1] * y[i - 1] + innov[i - 1]
        ys[g] = y + 10.0 + rng.normal(0.0, dy, n)
    diags = np.full((G, n), (dy + 1e-12) ** 2)

    null_kernel = DampedRandomWalk(log_S0=1.0, log_omega0=-3.0, bounds=[(-5, 10), (-8, 2)])
    alt_kernel = null_kernel + Lorentzian(
        log_S0=-1.0, log_Q=2.0, log_omega0=-2.0, bounds=[(-8, 5), (0, 6), (-5, 0)]
    )

    out = {"g": G, "steps": args.steps, "n_points": n}

    # 1. null refit -> per-sim optimum
    run_null = make_traced_runner(null_kernel, t, args.steps, args.walkers, jnp.float32)
    t0 = time.perf_counter()
    _, null_x, null_trace = run_null(
        jax.random.key(args.seed), jnp.asarray(ys), jnp.asarray(diags),
        jnp.asarray(np.array([1.0, -3.0])), jnp.float32(0.1),
    )
    null_x = np.asarray(null_x)
    out["null_wall_s"] = round(time.perf_counter() - t0, 1)
    out["null"] = summarize(np.asarray(null_trace))

    # 2a. alt refit, shared theta0 (current production behavior)
    run_alt = make_traced_runner(alt_kernel, t, args.steps, args.walkers, jnp.float32)
    t0 = time.perf_counter()
    _, _, alt_trace = run_alt(
        jax.random.key(args.seed + 1), jnp.asarray(ys), jnp.asarray(diags),
        jnp.asarray(np.array([1.0, -3.0, -1.0, 2.0, -2.0])), jnp.float32(0.1),
    )
    alt_trace = np.asarray(alt_trace)
    out["alt_wall_s"] = round(time.perf_counter() - t0, 1)
    out["alt_shared"] = summarize(alt_trace)
    out["alt_shared_final_sum"] = round(float(alt_trace[-1].sum()), 1)

    # 2b. alt refit warm-started per sim at [null_best_x, qpo defaults]
    run_alt_ws = make_traced_runner(
        alt_kernel, t, args.steps, args.walkers, jnp.float32, per_sim_theta0=True
    )
    theta0_ws = np.concatenate(
        [null_x, np.broadcast_to(np.array([-1.0, 2.0, -2.0], dtype=null_x.dtype), (G, 3))],
        axis=1,
    )
    t0 = time.perf_counter()
    _, _, alt_ws_trace = run_alt_ws(
        jax.random.key(args.seed + 1), jnp.asarray(ys), jnp.asarray(diags),
        jnp.asarray(theta0_ws), jnp.float32(0.1),
    )
    alt_ws_trace = np.asarray(alt_ws_trace)
    out["alt_warm_wall_s"] = round(time.perf_counter() - t0, 1)
    out["alt_warm"] = summarize(alt_ws_trace)
    out["alt_warm_final_sum"] = round(float(alt_ws_trace[-1].sum()), 1)
    # how much better/worse does the warm start end up at step k?
    for k in (99, 199, 299, 499):
        out[f"warm_minus_shared_at_{k+1}"] = {
            "mean": round(float((alt_ws_trace[k] - alt_trace[k]).mean()), 3),
            "min": round(float((alt_ws_trace[k] - alt_trace[k]).min()), 3),
        }

    np.savez(
        "/tmp/plateau2_traces.npz",
        null=np.asarray(null_trace), alt_shared=alt_trace, alt_warm=alt_ws_trace,
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
