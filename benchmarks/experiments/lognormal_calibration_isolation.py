"""Isolate the lognormal full-pipeline calibration failure (round 6).

Finding: the Gaussian full-pipeline calibration is uniform (round 5,
and re-confirmed round 6), and the POINT-ESTIMATE lognormal study
(examples/validation_pvalue_calibration.py --pdf Lognormal, sims
generated from the short-chain best-fit) measured KS p=0.295 — but the
actual ``protassov_lrt`` lognormal pipeline (sims generated from MCMC
POSTERIOR DRAWS) is anti-conservative: K=12 gave max p = 0.598 and
KS p = 0.003 (examples/validation_full_pipeline_calibration.py --pdf
lognormal).

This script reruns the failing study with ONE change: after deriving
the observed posteriors it collapses the null model's sample set to a
single row (the posterior MAP), so the bootstrap generates every sim
from the point estimate while everything else (observed MCMC fits,
matched estimator, E13 generation, noise) stays the actual user path.

  - If calibration recovers -> the failure is the posterior-DISPERSION
    mechanism under lognormal misspecification (sims from posterior
    wings are systematically easier for the alt than the observed
    data).
  - If it stays broken -> the full pipeline's posterior/MAP estimates
    or its generation path differ from the batched study in some other
    way; bisect further.

Run: python benchmarks/experiments/lognormal_calibration_isolation.py [--k 12]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import argparse
import json
import time

import numpy as np
from scipy.stats import kstest

from mind_the_gaps_tpu import GappyLightcurve
from mind_the_gaps_tpu.gpmodelling import GPModelling
from mind_the_gaps_tpu.kernels import DampedRandomWalk, Lorentzian
from mind_the_gaps_tpu.lrt import protassov_lrt
from mind_the_gaps_tpu.simulator import Simulator


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=12)
    ap.add_argument("--nsims", type=int, default=127)
    ap.add_argument("--n", type=int, default=400)
    ap.add_argument("--observed-max-steps", type=int, default=2000)
    ap.add_argument("--observed-walkers", type=int, default=12)
    ap.add_argument("--sim-steps", type=int, default=300)
    ap.add_argument(
        "--oracle", action="store_true",
        help="generate the bootstrap from the TRUE parameters instead of "
             "the posterior MAP: if this calibrates while the MAP variant "
             "does not, the miscalibration is quasi-likelihood fit bias "
             "under lognormal misspecification (a property of the "
             "reference's method), not a generation-path bug",
    )
    ap.add_argument(
        "--neutral-start", action="store_true",
        help="keep the refit chains' starting point at the kernels' "
             "construction-time parameter vectors instead of the observed "
             "MAP: the observed row then has no start-point privilege "
             "over the sims (mechanism test for the start-point-asymmetry "
             "hypothesis — generation stays posterior-draw)",
    )
    args = ap.parse_args()

    if args.neutral_start:
        # protassov_lrt repoints fitter.theta0 at the observed MAPs after
        # construction; a setter no-op keeps the construction-time
        # (kernel-initial, data-independent) starting vectors
        from mind_the_gaps_tpu import lrt as _lrt

        _lrt._ChunkFitter.theta0 = property(
            lambda self: self._theta0_fixed,
            lambda self, v: None,
        )
        _orig_init = _lrt._ChunkFitter.__init__

        def _init(self, kernel, times, theta0, **kw):
            import jax.numpy as _jnp

            self._theta0_fixed = _jnp.asarray(theta0, dtype=_jnp.float64)
            _orig_init(self, kernel, times, theta0, **kw)

        _lrt._ChunkFitter.__init__ = _init

    rng = np.random.default_rng(0)
    t0_all = time.time()

    n = args.n
    times = np.cumsum(rng.uniform(2.0, 8.0, n))
    sigma = 0.3
    true_S0, true_w0 = 4.0, 0.05

    null_k0 = DampedRandomWalk(np.log(true_S0), np.log(true_w0), bounds=[(-5, 8), (-8, 2)])
    theta_true = null_k0.get_parameter_vector()
    sim_obs = Simulator(
        lambda w: np.asarray(null_k0.get_psd(w, theta_true)),
        times, exposures=1.0, mean=10.0, pdf="lognormal",
        extension_factor=2, random_state=7,
    )

    ps = []
    for k in range(args.k):
        y = sim_obs.generate_lightcurve() + rng.normal(0.0, sigma, n)
        lc = GappyLightcurve(times, y, np.full(n, sigma), exposures=1.0)
        null_kernel = DampedRandomWalk(np.log(true_S0), np.log(true_w0), bounds=[(-5, 8), (-8, 2)])
        alt_kernel = DampedRandomWalk(np.log(true_S0), np.log(true_w0), bounds=[(-5, 8), (-8, 2)]) + Lorentzian(
            -1.0, 2.0, -1.5, bounds=[(-8, 5), (0, 6), (-5, 0)]
        )
        null_model = GPModelling(lc, null_kernel)
        alt_model = GPModelling(lc, alt_kernel)
        null_model.derive_posteriors(
            max_steps=args.observed_max_steps, walkers=args.observed_walkers,
            progress=False, seed=1000 + k + 101,
        )
        alt_model.derive_posteriors(
            max_steps=args.observed_max_steps, walkers=args.observed_walkers,
            progress=False, seed=1000 + k + 102,
        )
        # THE intervention: generation sees only one parameter row —
        # the posterior MAP (default) or the truth (--oracle).  Under
        # --neutral-start the generation is left at the actual
        # posterior-draw behavior (the start-point patch above is the
        # only change).
        if not args.neutral_start or args.oracle:
            if args.oracle:
                row = np.asarray(theta_true, dtype=np.float64)[None, :]
            else:
                row = np.asarray(null_model.max_parameters, dtype=np.float64)[None, :]
            max_ll = float(np.max(null_model._loglikelihoods))
            null_model._mcmc_samples = row
            null_model._loglikelihoods = np.asarray([max_ll])

        res = protassov_lrt(
            lc, null_kernel, alt_kernel, nsims=args.nsims, seed=1000 + k,
            sim_max_steps=args.sim_steps, chunk=args.nsims + 1,
            pdf="lognormal", sigma_noise=sigma,
            null_model=null_model, alt_model=alt_model,
        )
        ps.append(res.p_value)
        print(f"[{time.time()-t0_all:6.0f}s] experiment {k + 1}/{args.k}: "
              f"T_obs={res.t_obs:.2f} p={res.p_value:.3f}", flush=True)

    ps = np.asarray(ps)
    ks = kstest(ps, "uniform")
    print("\np-values:", np.array2string(np.sort(ps), precision=3))
    print(f"KS vs Uniform(0,1): D = {ks.statistic:.3f}, p = {ks.pvalue:.3f}")
    print(json.dumps({
        "metric": "lognormal_pointestimate_calibration_ks_pvalue",
        "value": round(float(ks.pvalue), 3), "k": args.k, "nsims": args.nsims,
        "wall_s": round(time.time() - t0_all, 1),
    }))


if __name__ == "__main__":
    main()
