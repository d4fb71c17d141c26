"""Detection power of the Protassov LRT pipeline under injected QPOs.

The companion of validation_pvalue_calibration.py: calibration checks
that p ~ Uniform(0,1) when NO QPO exists; this script measures how
often the pipeline DETECTS a QPO that does exist.  For each relative
QPO strength ``a`` (QPO variance as a fraction of the DRW variance),
K independent observed datasets are drawn from the exact
DRW + Lorentzian Gaussian process (dense Cholesky ground truth), each
is fit with both models, nsims posterior-predictive simulations from
the FITTED NULL are refit with both models (matched estimators — the
standard Protassov bootstrap), and the detection fraction at
p <= 0.05 is reported per strength.  a = 0 doubles as a calibration
sanity check (expected detection fraction ~0.05).

Everything is batched exactly like the production LRT: all K observed
fits run as one grouped program and all K * nsims refits as another —
a full power curve is a few minutes on one chip, which is the point:
the reference pipeline would need days for the same study.

Run: python examples/validation_detection_power.py \
        [--amps 0,0.1,0.25,0.5,1.0 --k 16 --nsims 127]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from mind_the_gaps_tpu.kernels import DampedRandomWalk, Lorentzian
from mind_the_gaps_tpu.lrt import fit_lightcurves_batch
from mind_the_gaps_tpu.models import psd_models
from mind_the_gaps_tpu.simulator import Simulator


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--amps", default="0,0.1,0.25,0.5,1.0",
                    help="QPO variance as a fraction of the DRW variance")
    ap.add_argument("--k", type=int, default=16, help="experiments per strength")
    ap.add_argument("--nsims", type=int, default=127, help="bootstrap size per experiment")
    ap.add_argument("--n", type=int, default=400, help="lightcurve points")
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--walkers", type=int, default=12)
    ap.add_argument("--q", type=float, default=20.0, help="QPO quality factor")
    ap.add_argument("--wqpo", type=float, default=0.2, help="QPO angular frequency")
    args = ap.parse_args()
    amps = [float(a) for a in args.amps.split(",")]
    early_stop = (0.01, 50)  # the production plateau rule
    dtype = jnp.float32

    rng = np.random.default_rng(0)
    t0_all = time.time()

    n = args.n
    times = np.cumsum(rng.uniform(2.0, 8.0, n))
    sigma = 0.3
    true_S0, true_w0 = 4.0, 0.05

    null_kernel = DampedRandomWalk(np.log(true_S0), np.log(true_w0), bounds=[(-5, 8), (-8, 2)])
    alt_kernel = DampedRandomWalk(np.log(true_S0), np.log(true_w0), bounds=[(-5, 8), (-8, 2)]) + Lorentzian(
        -1.0, np.log(args.q), np.log(args.wqpo), bounds=[(-8, 5), (0, 6), (-5, 0)]
    )
    th0_null = null_kernel.get_parameter_vector()
    th0_alt = alt_kernel.get_parameter_vector()

    # --- exact GP draws per strength (dense Cholesky ground truth) ----- #
    tau = np.abs(times[:, None] - times[None, :])
    K_drw = np.array(null_kernel.covariance(tau))
    results = []
    all_obs = []
    for a in amps:
        if a > 0:
            qpo = Lorentzian(np.log(a * true_S0), np.log(args.q), np.log(args.wqpo))
            K_true = K_drw + np.array(qpo.covariance(tau))
        else:
            K_true = K_drw
        L = np.linalg.cholesky(K_true + np.diag(np.full(n, sigma**2)))
        all_obs.append(10.0 + (L @ rng.normal(size=(n, args.k))).T)  # (K, n)
    ys_obs = np.concatenate(all_obs)  # (A*K, n)
    dys_obs = np.full_like(ys_obs, sigma)
    A, K = len(amps), args.k

    # --- observed fits, batched over A*K ------------------------------- #
    ll0_obs, best_null = fit_lightcurves_batch(
        jax.random.key(1), null_kernel, times, ys_obs, dys_obs, th0_null,
        walkers=args.walkers, n_steps=args.steps, dtype=dtype, early_stop=early_stop,
    )
    ll1_obs, _ = fit_lightcurves_batch(
        jax.random.key(2), alt_kernel, times, ys_obs, dys_obs, th0_alt,
        walkers=args.walkers, n_steps=args.steps, dtype=dtype, early_stop=early_stop,
    )
    T_obs = -2.0 * (ll0_obs.astype(float) - ll1_obs.astype(float))
    print(f"observed fits done ({time.time()-t0_all:.0f}s); "
          f"T_obs medians by strength: "
          + ", ".join(f"a={a}: {np.median(T_obs[i*K:(i+1)*K]):.2f}" for i, a in enumerate(amps)),
          flush=True)

    # --- posterior-predictive sims from every fitted null -------------- #
    sim = Simulator(
        psd_models.BendingPowerlaw(S0=true_S0, omega0=true_w0),
        times, 1.0, 10.0, "Gaussian", sigma_noise=sigma, extension_factor=2,
        random_state=3,
    )
    omega = jnp.asarray(sim.omega)

    def psd_for(theta):
        vals = null_kernel.get_psd(omega[1:], jnp.asarray(theta))
        return jnp.concatenate([jnp.zeros((1,), dtype=vals.dtype), vals])

    psd_batch = jax.vmap(psd_for)(jnp.asarray(best_null, dtype=jnp.float64))  # (A*K, nf)
    psd_all = jnp.repeat(psd_batch, args.nsims, axis=0)  # (A*K*nsims, nf)
    rates = sim.simulate_batch(jax.random.key(4), psd_all)
    noisy, dy_sim = sim.add_noise_batch(jax.random.key(5), rates)
    noisy = np.asarray(noisy)
    dy_sim = np.asarray(dy_sim)
    print(f"simulated {noisy.shape[0]} lightcurves ({time.time()-t0_all:.0f}s)", flush=True)

    # --- bootstrap refits, batched over A*K*nsims ----------------------- #
    ll0_sim, _ = fit_lightcurves_batch(
        jax.random.key(6), null_kernel, times, noisy, dy_sim, th0_null,
        walkers=args.walkers, n_steps=args.steps, dtype=dtype, chunk=1024,
        early_stop=early_stop,
    )
    ll1_sim, _ = fit_lightcurves_batch(
        jax.random.key(7), alt_kernel, times, noisy, dy_sim, th0_alt,
        walkers=args.walkers, n_steps=args.steps, dtype=dtype, chunk=1024,
        early_stop=early_stop,
    )
    T_sim = (-2.0 * (ll0_sim.astype(float) - ll1_sim.astype(float))).reshape(A, K, args.nsims)
    print(f"bootstrap refits done ({time.time()-t0_all:.0f}s)", flush=True)

    # --- power curve ----------------------------------------------------- #
    T_obs = T_obs.reshape(A, K)
    p = (1.0 + np.sum(T_sim >= T_obs[:, :, None], axis=2)) / (args.nsims + 1.0)
    for i, a in enumerate(amps):
        det = float(np.mean(p[i] <= 0.05))
        results.append({
            "amp": a, "detect_frac_p05": det,
            "median_p": float(np.median(p[i])),
            "median_T_obs": float(np.median(T_obs[i])),
        })
        print(f"a={a:5.2f}: detection fraction (p<=0.05) = {det:.2f}, "
              f"median p = {np.median(p[i]):.3f}", flush=True)
    print(json.dumps({
        "metric": "qpo_detection_power", "k": K, "nsims": args.nsims,
        "n": n, "q": args.q, "wqpo": args.wqpo,
        "results": results, "wall_s": round(time.time() - t0_all, 1),
    }))


if __name__ == "__main__":
    main()
