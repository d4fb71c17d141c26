"""Can a non-equilibrium ensemble move reach the 500-step stretch best
in fewer steps?

The LRT bootstrap's alternative-model refit burns its FULL 500-step
budget: plateau_probe.py (round 5) showed per-sim best loglikes still
improving by >0.01 past step 500, so the early stop never fires for the
alt kernel and the alt chunk dominates bootstrap device time.  The
estimator the LRT needs is max loglike, not a posterior — detailed
balance is not required.  This probe asks whether an OPTIMIZING variant
of the same lock-step ensemble (identical eval count per step) plateaus
earlier at an equal-or-better best loglike.

One compiled program covers every stretch-family variant by taking the
per-step move scale ``a_t`` and inverse temperature ``beta_t`` as
runtime operand arrays (beta multiplies the loglike difference in the
acceptance factor: beta=1 is the production sampler, beta>>1 is greedy
hill climbing, a ramp is annealing).  A second program implements
differential-evolution proposals (x + gamma*(p1 - p2) + eps) with the
same runtime schedules.

Production shape: G sims x 12 walkers, N=5k, f32 Pallas grouped path,
PER-ROW starting points at the generating parameters (matching the
round-6 per-row-starts pipeline).

Usage: python benchmarks/experiments/refit_optimizer_probe.py [--g 256]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))


def make_runner(kernel, t, n_steps, walkers, dtype, move: str):
    """Traced-best-loglike runner; move in {"stretch", "de"}.

    Operands: key, ys, diags, theta0 (G,D), percent, a_t (steps,),
    beta_t (steps,) [, gamma_t (steps,), eps_t (steps,) for "de"].
    """
    import jax
    import jax.numpy as jnp

    from mind_the_gaps_tpu.ops import pallas_log_likelihood

    nk = kernel.ndim
    t = jnp.asarray(t)
    lo = jnp.asarray([b[0] for b in kernel.get_parameter_bounds()])
    hi = jnp.asarray([b[1] for b in kernel.get_parameter_bounds()])
    half = walkers // 2

    def batched_core(key, ys, diags, theta0, percent, a_t, beta_t, gamma_t, eps_t):
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
        base = theta0_[:, None, :]  # per-row (G, 1, D)
        std = jnp.abs(base) * percent
        init = base + std * jax.random.normal(k_init, (G, walkers, nk), dtype=dtype)
        span_lo = jnp.where(jnp.isfinite(lo), lo + 0.05 * jnp.abs(lo), -jnp.inf)
        span_hi = jnp.where(jnp.isfinite(hi), hi - 0.05 * jnp.abs(hi), jnp.inf)
        init = jnp.clip(init, span_lo.astype(dtype), span_hi.astype(dtype))

        def half_update(key, active, passive, logp_active, a, beta, gamma, eps):
            k_z, k_pick, k_acc, k_eps = jax.random.split(key, 4)
            if move == "stretch":
                u = jax.random.uniform(k_z, (G, half), dtype=dtype)
                z = ((a - 1.0) * u + 1.0) ** 2 / a
                picks = jax.random.randint(k_pick, (G, half), 0, half)
                partners = jnp.take_along_axis(passive, picks[..., None], axis=1)
                proposal = partners + z[..., None] * (active - partners)
                hastings = (nk - 1.0) * jnp.log(z)
            else:  # differential evolution: x + gamma*(p1 - p2) + eps*N(0,1)
                k_p1, k_p2 = jax.random.split(k_pick)
                p1 = jax.random.randint(k_p1, (G, half), 0, half)
                p2 = jax.random.randint(k_p2, (G, half), 0, half)
                x1 = jnp.take_along_axis(passive, p1[..., None], axis=1)
                x2 = jnp.take_along_axis(passive, p2[..., None], axis=1)
                noise = eps * jax.random.normal(k_eps, active.shape, dtype=dtype)
                proposal = active + gamma * (x1 - x2) + noise
                hastings = jnp.zeros((G, half), dtype=dtype)
            logp_new = lp_eval(proposal)
            log_accept = hastings + beta * (logp_new - logp_active)
            accept = jnp.log(jax.random.uniform(k_acc, (G, half), dtype=dtype)) < log_accept
            new_active = jnp.where(accept[..., None], proposal, active)
            new_logp = jnp.where(accept, logp_new, logp_active)
            return new_active, new_logp

        logp0 = jnp.concatenate([lp_eval(init[:, :half]), lp_eval(init[:, half:])], axis=1)

        def step(carry, xs):
            key, a, beta, gamma, eps = xs
            state, logp, best_lp, best_x = carry
            k1, k2 = jax.random.split(key)
            first, second = state[:, :half], state[:, half:]
            lp1, lp2 = logp[:, :half], logp[:, half:]
            first, lp1 = half_update(k1, first, second, lp1, a, beta, gamma, eps)
            second, lp2 = half_update(k2, second, first, lp2, a, beta, gamma, eps)
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
        (_, _, best_lp, _), trace = jax.lax.scan(
            step, (init, logp0, best_lp0, best_x0),
            (keys, a_t.astype(dtype), beta_t.astype(dtype),
             gamma_t.astype(dtype), eps_t.astype(dtype)),
        )
        return best_lp, trace  # trace: (n_steps, G)

    import jax

    return jax.jit(batched_core)


def schedules(move, variant, steps, nk):
    """Return (a_t, beta_t, gamma_t, eps_t) float32 arrays of shape (steps,)."""
    ones = np.ones(steps, np.float32)
    a_t = 2.0 * ones
    beta_t = ones.copy()
    gamma_de = 2.38 / np.sqrt(2.0 * nk)
    gamma_t = gamma_de * ones
    # every 10th step: gamma=1 mode-jumping move (ter Braak 2006)
    gamma_t[::10] = 1.0
    eps_t = 1e-4 * ones
    if move == "stretch":
        if variant == "base":
            pass
        elif variant == "greedy":
            beta_t = 1e4 * ones
        elif variant == "anneal":
            beta_t = np.geomspace(1.0, 300.0, steps).astype(np.float32)
        elif variant == "anneal_a":
            beta_t = np.geomspace(1.0, 300.0, steps).astype(np.float32)
            a_t = np.linspace(3.0, 1.3, steps).astype(np.float32)
        elif variant == "a3":
            a_t = 3.0 * ones
        elif variant == "explore_then_greedy":
            beta_t = ones.copy()
            beta_t[steps // 4:] = 1e4
        else:
            raise ValueError(variant)
    else:
        if variant == "base":
            pass
        elif variant == "greedy":
            beta_t = 1e4 * ones
        elif variant == "anneal":
            beta_t = np.geomspace(1.0, 300.0, steps).astype(np.float32)
        else:
            raise ValueError(variant)
    return a_t, beta_t, gamma_t, eps_t


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--g", type=int, default=256)
    ap.add_argument("--steps", type=int, default=500)
    ap.add_argument("--n-points", type=int, default=5000)
    ap.add_argument("--walkers", type=int, default=12)
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
    # per-row starts at the generating draw (production form); the alt's
    # extra dims start at construction values for every row
    th_null = np.stack([logS0, logw0], axis=1)
    th_alt = np.concatenate(
        [th_null, np.tile(np.array([[-1.0, 2.0, -2.0]]), (G, 1))], axis=1
    )

    variants = {
        "stretch": ["base", "greedy", "anneal", "anneal_a", "a3", "explore_then_greedy"],
        "de": ["base", "greedy", "anneal"],
    }

    out = {"g": G, "steps": args.steps, "walkers": args.walkers, "n_points": n}
    ys_j, diags_j = jnp.asarray(ys), jnp.asarray(diags)
    for kname, kern, th0 in [("null", null_kernel, th_null), ("alt", alt_kernel, th_alt)]:
        baseline_final = None
        runners = {
            m: make_runner(kern, t, args.steps, args.walkers, jnp.float32, m)
            for m in variants
        }
        for move, vlist in variants.items():
            for variant in vlist:
                a_t, beta_t, gamma_t, eps_t = schedules(move, variant, args.steps, kern.ndim)
                key = jax.random.key(args.seed + 17)  # same key across variants
                t0 = time.perf_counter()
                best, trace = runners[move](
                    key, ys_j, diags_j, jnp.asarray(th0), jnp.float32(0.1),
                    jnp.asarray(a_t), jnp.asarray(beta_t),
                    jnp.asarray(gamma_t), jnp.asarray(eps_t),
                )
                trace = np.asarray(trace, np.float64)  # (steps, G)
                wall = time.perf_counter() - t0
                tag = f"{kname}_{move}_{variant}"
                if move == "stretch" and variant == "base":
                    baseline_final = trace[-1].copy()
                final = trace[-1]
                rec = {
                    "wall_s": round(wall, 1),
                    "final_minus_base_median": round(float(np.median(final - baseline_final)), 4),
                    "final_minus_base_p10": round(float(np.percentile(final - baseline_final, 10)), 4),
                    "final_minus_base_min": round(float((final - baseline_final).min()), 4),
                }
                # steps for the whole batch to get within tol of the
                # baseline's 500-step final (lock-step: max over sims)
                for tol in (0.1, 0.01):
                    target = baseline_final - tol
                    reached = trace >= target[None, :]  # (steps, G)
                    always = reached.all(axis=1)
                    idx = np.nonzero(always)[0]
                    rec[f"steps_to_base_tol{tol}"] = int(idx[0]) if idx.size else -1
                    per_sim = np.array([
                        np.nonzero(reached[:, g])[0][0] if reached[:, g].any() else args.steps
                        for g in range(trace.shape[1])
                    ])
                    rec[f"steps_to_base_tol{tol}_p90"] = int(np.percentile(per_sim, 90))
                out[tag] = rec
                print(json.dumps({tag: rec}), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
