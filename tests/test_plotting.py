"""Plotting smoke tests (Agg backend)."""
import matplotlib

matplotlib.use("Agg")

import numpy as np

from mind_the_gaps_tpu import GappyLightcurve
from mind_the_gaps_tpu.gpmodelling import GPModelling
from mind_the_gaps_tpu.kernels import DampedRandomWalk
from mind_the_gaps_tpu import plotting


def test_plots(tmp_path):
    rng = np.random.default_rng(0)
    n = 120
    t = np.cumsum(rng.uniform(2.0, 6.0, n))
    true = DampedRandomWalk(log_S0=np.log(2.0), log_omega0=np.log(0.08))
    tau = np.abs(t[:, None] - t[None, :])
    K = np.array(true.covariance(tau)) + np.diag(np.full(n, 0.04))
    y = 5.0 + np.linalg.cholesky(K) @ rng.normal(size=n)
    lc = GappyLightcurve(t, y, np.full(n, 0.2), exposures=1.0)

    gp = GPModelling(lc, DampedRandomWalk(0.0, -2.0, bounds=[(-4, 6), (-6, 1)]))
    gp.derive_posteriors(max_steps=300, convergence_steps=150, walkers=12, seed=1)

    ax = plotting.plot_lightcurve(lc)
    ax.figure.savefig(tmp_path / "lc.png")

    ax = plotting.plot_gp_prediction(gp, n_grid=80)
    ax.figure.savefig(tmp_path / "pred.png")

    fig = plotting.plot_posteriors(gp, bins=15)
    fig.savefig(tmp_path / "corner.png")

    ax = plotting.plot_standardized_residuals(gp)
    ax.figure.savefig(tmp_path / "res.png")

    class R:
        t_dist = rng.normal(2, 1, 200)
        t_obs = 4.2
        p_value = 0.03

    ax = plotting.plot_t_distribution(R())
    ax.figure.savefig(tmp_path / "tdist.png")
    for f in ["lc.png", "pred.png", "corner.png", "res.png", "tdist.png"]:
        assert (tmp_path / f).stat().st_size > 1000
