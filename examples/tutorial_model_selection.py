"""Kernel model selection with AICc + KS-on-standardized-residuals —
the script equivalent of the reference's tutorial_model_selection.ipynb.

Run:  python examples/tutorial_model_selection.py
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from mind_the_gaps_tpu import GappyLightcurve
from mind_the_gaps_tpu.kernels import (
    DampedRandomWalk,
    Lorentzian,
    Matern32Term,
    SHOTerm,
)
from mind_the_gaps_tpu.selection import compare_models


def make_lightcurve(n=500, seed=3):
    rng = np.random.default_rng(seed)
    t = np.cumsum(rng.uniform(2.0, 6.0, n))
    true = DampedRandomWalk(log_S0=np.log(4.0), log_omega0=np.log(0.05))
    tau = np.abs(t[:, None] - t[None, :])
    K = np.array(true.covariance(tau)) + np.diag(np.full(n, 0.09))
    y = 10.0 + np.linalg.cholesky(K) @ rng.normal(size=n)
    return GappyLightcurve(t, y, np.full(n, 0.3), exposures=1.0)


def main():
    lc = make_lightcurve()
    kernels = {
        "DRW": DampedRandomWalk(0.0, -2.0, bounds=[(-5, 8), (-8, 2)]),
        "SHO": SHOTerm(0.0, 0.0, -2.0, bounds=[(-5, 8), (-3, 5), (-8, 2)]),
        "Matern32": Matern32Term(0.0, 2.0, bounds=[(-5, 8), (-2, 8)]),
        "DRW+QPO": DampedRandomWalk(0.0, -2.0, bounds=[(-5, 8), (-8, 2)])
        + Lorentzian(-1.0, 2.0, -2.0, bounds=[(-8, 5), (0, 6), (-5, 0)]),
    }
    results = compare_models(lc, kernels, max_steps=4000, walkers=24, seed=0)

    print(f"{'model':<10} {'k':>2} {'maxLL':>10} {'AICc':>10} {'dAICc':>8} {'weight':>7} {'KS p':>7}")
    for r in results:
        print(
            f"{r.name:<10} {r.k:>2} {r.max_loglikelihood:>10.2f} {r.aicc:>10.2f} "
            f"{r.delta_aicc:>8.2f} {r.akaike_weight:>7.3f} {r.ks_pvalue:>7.3f}"
        )


if __name__ == "__main__":
    main()
