"""Exchangeability check for the lognormal calibration failure (round 6).

The failing study draws OBSERVED data via ``Simulator.generate_lightcurve``
(single-lc path) + host Gaussian noise, while the pipeline's bootstrap
sims come from ``make_device_generator`` (``simulate_batch`` +
``add_noise_batch``) at posterior draws.  If those two generation routes
are not statistically identical AT THE SAME PARAMETERS, the calibration
study measures an implementation asymmetry (a bug), not a property of
the posterior-predictive method.

Test: generate M lightcurves through each route at the TRUE null
parameters, refit both models to all 2M lightcurves with one shared
short-chain fitter program, and two-sample-KS the T = -2(ll0 - ll1)
distributions (plus marginal mean/std of the lightcurves themselves).

Exchangeable  -> the anti-conservatism is the method (posterior /
                 fit-bias mechanism); document it as a finding.
Not exchangeable -> bisect the generation routes.

Run: PYTHONPATH=/root/repo python benchmarks/experiments/lognormal_exchangeability.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import argparse
import json
import time

import numpy as np
from scipy.stats import ks_2samp

import jax
import jax.numpy as jnp

from mind_the_gaps_tpu import GappyLightcurve
from mind_the_gaps_tpu.gpmodelling import GPModelling
from mind_the_gaps_tpu.kernels import DampedRandomWalk, Lorentzian
from mind_the_gaps_tpu.lrt import fit_lightcurves_batch
from mind_the_gaps_tpu.simulator import Simulator


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=256, help="lightcurves per route")
    ap.add_argument("--n", type=int, default=400)
    ap.add_argument("--steps", type=int, default=300)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    t0_all = time.time()
    n = args.n
    times = np.cumsum(rng.uniform(2.0, 8.0, n))
    sigma = 0.3
    true_S0, true_w0 = 4.0, 0.05
    null_kernel = DampedRandomWalk(np.log(true_S0), np.log(true_w0), bounds=[(-5, 8), (-8, 2)])
    alt_kernel = DampedRandomWalk(np.log(true_S0), np.log(true_w0), bounds=[(-5, 8), (-8, 2)]) + Lorentzian(
        -1.0, 2.0, -1.5, bounds=[(-8, 5), (0, 6), (-5, 0)]
    )
    theta_true = null_kernel.get_parameter_vector()

    # --- route A: the calibration study's observed-data draw ---------- #
    sim_obs = Simulator(
        lambda w: np.asarray(null_kernel.get_psd(w, theta_true)),
        times, exposures=1.0, mean=10.0, pdf="lognormal",
        extension_factor=2, random_state=7,
    )
    ys_a = np.stack([sim_obs.generate_lightcurve() for _ in range(args.m)])
    ys_a = ys_a + rng.normal(0.0, sigma, ys_a.shape)
    dys_a = np.full_like(ys_a, sigma)
    print(f"route A drawn ({time.time()-t0_all:.0f}s)")

    # --- route B: the pipeline's device generator at theta_true ------- #
    # (exactly what protassov_lrt's bootstrap runs, minus the posterior)
    lc0 = GappyLightcurve(times, ys_a[0], np.full(n, sigma), exposures=1.0)
    model = GPModelling(lc0, null_kernel)
    gen = model.make_device_generator("lognormal", extension_factor=2, sigma_noise=sigma)
    thetas = jnp.broadcast_to(jnp.asarray(theta_true), (args.m, len(theta_true)))
    rates_b, dys_b = gen(jax.random.key(21), jax.random.key(22), thetas)
    ys_b, dys_b = np.asarray(rates_b), np.asarray(dys_b)
    print(f"route B drawn ({time.time()-t0_all:.0f}s)")

    for name, ys in (("A(observed-style)", ys_a), ("B(pipeline sims)", ys_b)):
        print(f"{name}: mean {ys.mean():.4f}  per-lc std {ys.std(axis=1).mean():.4f}  "
              f"skew {float(np.mean(((ys - ys.mean(1, keepdims=True)) / ys.std(1, keepdims=True)) ** 3)):.4f}")

    # --- matched refits over both routes in one program --------------- #
    ys_all = np.concatenate([ys_a, ys_b])
    dys_all = np.concatenate([dys_a, dys_b])
    diags = (dys_all + 1e-12) ** 2
    ll0, _ = fit_lightcurves_batch(
        jax.random.key(1), null_kernel, times, ys_all, dys_all,
        null_kernel.get_parameter_vector(), walkers=12, n_steps=args.steps,
        dtype=jnp.float32, early_stop=(0.01, 50),
    )
    ll1, _ = fit_lightcurves_batch(
        jax.random.key(2), alt_kernel, times, ys_all, dys_all,
        alt_kernel.get_parameter_vector(), walkers=12, n_steps=args.steps,
        dtype=jnp.float32, early_stop=(0.01, 50),
    )
    T = -2.0 * (ll0.astype(float) - ll1.astype(float))
    T_a, T_b = T[: args.m], T[args.m:]
    ks = ks_2samp(T_a, T_b)
    print(f"T route A: median {np.median(T_a):.3f} p90 {np.percentile(T_a, 90):.3f}")
    print(f"T route B: median {np.median(T_b):.3f} p90 {np.percentile(T_b, 90):.3f}")
    print(f"two-sample KS: D = {ks.statistic:.3f}, p = {ks.pvalue:.4f}")
    # The statistic the calibration actually uses: score each route-A
    # draw against route B's T distribution (an oracle bootstrap of size
    # m).  Exchangeable routes give uniform cross-route p-values; this
    # is far more tail-sensitive than the omnibus two-sample KS.
    from scipy.stats import kstest

    p_cross = (1.0 + np.sum(T_b[None, :] >= T_a[:, None], axis=1)) / (args.m + 1.0)
    ks_u = kstest(p_cross, "uniform")
    print(f"cross-route p-values: mean {p_cross.mean():.4f} (0.5 if exchangeable), "
          f"frac<0.1 {np.mean(p_cross < 0.1):.4f}")
    print(f"KS(cross-route p, Uniform): D = {ks_u.statistic:.4f}, p = {ks_u.pvalue:.4f}")
    print(json.dumps({
        "metric": "lognormal_exchangeability_ks_pvalue",
        "value": round(float(ks.pvalue), 4), "m": args.m,
        "t_median_a": round(float(np.median(T_a)), 3),
        "t_median_b": round(float(np.median(T_b)), 3),
        "cross_p_mean": round(float(p_cross.mean()), 4),
        "cross_p_ks_pvalue": round(float(ks_u.pvalue), 4),
        "wall_s": round(time.time() - t0_all, 1),
    }))


if __name__ == "__main__":
    main()
