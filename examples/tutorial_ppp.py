"""Posterior-predictive likelihood-ratio test (Protassov et al. 2002) on
simulated data — the script equivalent of the reference's
tutorial_ppp.ipynb, end to end on device.

Run:  python examples/tutorial_ppp.py [--nsims 1000]
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import time

import numpy as np

from mind_the_gaps_tpu import GappyLightcurve
from mind_the_gaps_tpu.kernels import DampedRandomWalk, Lorentzian
from mind_the_gaps_tpu.lrt import protassov_lrt
from mind_the_gaps_tpu.models import psd_models
from mind_the_gaps_tpu.simulator import Simulator


def make_lightcurve(n=800, seed=42, with_qpo=False):
    """Simulate an irregularly-sampled lightcurve from a DRW (+ QPO) PSD
    with Poisson noise over a realistic observing pattern."""
    rng = np.random.default_rng(seed)
    times = np.cumsum(rng.uniform(4000, 9000, n))  # ~daily-ish cadence, s
    exposures = 2000.0
    mean_rate = 0.5

    variance = 0.02
    omega_bend = 2 * np.pi / (40 * 86400)  # 40 d bend
    psd = psd_models.BendingPowerlaw(S0=variance, omega0=omega_bend)
    if with_qpo:
        omega_qpo = 2 * np.pi / (10 * 86400)  # 10 d QPO
        psd = psd + psd_models.Lorentzian(S0=variance / 2, omega0=omega_qpo, Q=20)

    sim = Simulator(psd, times, exposures, mean_rate, "Gaussian",
                    extension_factor=2, random_state=seed)
    rates = sim.generate_lightcurve()
    noisy, dy = sim.add_noise(rates)
    return GappyLightcurve(times, noisy, dy, exposures=exposures)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nsims", type=int, default=1000)
    ap.add_argument("--qpo", action="store_true", help="inject a QPO into the data")
    ap.add_argument("--max-steps", type=int, default=10000)
    ap.add_argument("--sim-steps", type=int, default=500)
    args = ap.parse_args()

    lc = make_lightcurve(with_qpo=args.qpo)
    print(f"lightcurve: n={lc.n}, duration={lc.duration/86400:.1f} d, mean={lc.mean:.3f}")

    day = 86400.0
    null_kernel = DampedRandomWalk(
        log_S0=np.log(0.02), log_omega0=np.log(2 * np.pi / (40 * day)),
        bounds=[(-15, 5), (np.log(2 * np.pi / (500 * day)), np.log(2 * np.pi / (2 * day)))],
    )
    alt_kernel = DampedRandomWalk(
        log_S0=np.log(0.02), log_omega0=np.log(2 * np.pi / (40 * day)),
        bounds=[(-15, 5), (np.log(2 * np.pi / (500 * day)), np.log(2 * np.pi / (2 * day)))],
    ) + Lorentzian(
        log_S0=np.log(0.01), log_Q=np.log(20), log_omega0=np.log(2 * np.pi / (10 * day)),
        bounds=[(-15, 5), (0, 8), (np.log(2 * np.pi / (100 * day)), np.log(2 * np.pi / (2 * day)))],
    )

    t0 = time.time()
    res = protassov_lrt(
        lc, null_kernel, alt_kernel,
        nsims=args.nsims,
        observed_max_steps=args.max_steps,
        sim_max_steps=args.sim_steps,
        progress=True,
    )
    dt = time.time() - t0

    print(f"\nT_obs (matched) = {res.t_obs:.2f};  T_obs (posterior chain) = {res.t_obs_posterior:.2f}")
    print(f"T_dist: median {np.median(res.t_dist):.2f}, 99th pct {np.percentile(res.t_dist, 99):.2f}")
    print(f"p-value = {res.p_value:.4f} (matched; posterior-chain p = {res.p_value_posterior:.4f})")
    print(f"({args.nsims} simulations, {dt:.1f} s total)")
    if res.p_value < 0.01:
        print("=> the QPO term is strongly preferred")
    else:
        print("=> no significant evidence for the QPO term")


if __name__ == "__main__":
    main()
