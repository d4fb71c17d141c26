"""Kernel model selection (the tutorial_model_selection.ipynb workflow)."""
import numpy as np
import pytest

from mind_the_gaps_tpu import GappyLightcurve
from mind_the_gaps_tpu.kernels import DampedRandomWalk, Lorentzian
from mind_the_gaps_tpu.selection import compare_models


@pytest.fixture(scope="module")
def drw_lc():
    rng = np.random.default_rng(7)
    n = 300
    t = np.cumsum(rng.uniform(2.0, 8.0, n))
    # noise comparable to the signal amplitude: the regime where the
    # KS-on-standardized-residuals diagnostic is calibrated (the
    # reference's tutorial datasets have counting noise ~ variability)
    true = DampedRandomWalk(log_S0=np.log(4.0), log_omega0=np.log(0.05))
    tau = np.abs(t[:, None] - t[None, :])
    K = np.array(true.covariance(tau)) + np.diag(np.full(n, 4.0))
    y = 10.0 + np.linalg.cholesky(K) @ rng.normal(size=n)
    return GappyLightcurve(t, y, np.full(n, 2.0), exposures=1.0)


def test_compare_models_prefers_true_kernel(drw_lc):
    kernels = {
        "drw": DampedRandomWalk(log_S0=1.0, log_omega0=-3.0, bounds=[(-5, 10), (-8, 2)]),
        "drw+qpo": DampedRandomWalk(log_S0=1.0, log_omega0=-3.0, bounds=[(-5, 10), (-8, 2)])
        + Lorentzian(log_S0=-1.0, log_Q=2.0, log_omega0=-2.0, bounds=[(-8, 5), (0, 6), (-5, 0)]),
    }
    results = compare_models(
        drw_lc, kernels, max_steps=400, walkers=12, converge=False, seed=4
    )
    assert [r.name for r in results] != []
    assert results[0].aicc <= results[-1].aicc  # sorted
    assert abs(sum(r.akaike_weight for r in results) - 1.0) < 1e-12
    # the data are a pure DRW: the extra QPO parameters must not pay
    # their AICc penalty
    assert results[0].name == "drw"
    # a correctly-specified model gives Gaussian standardized residuals
    assert results[0].ks_pvalue > 0.01
    assert np.isfinite(results[0].max_loglikelihood)
    assert results[0].delta_aicc == 0.0


def test_loo_residuals_calibrated(drw_lc):
    """alpha/sqrt(Kinv_nn) must be exactly N(0,1)-calibrated at the true
    parameters, across noise regimes (the predict-variance residuals are
    not — that is why selection uses the LOO form)."""
    from scipy.stats import kstest, norm
    from mind_the_gaps_tpu.gpmodelling import GPModelling

    gp = GPModelling(drw_lc, DampedRandomWalk(log_S0=np.log(4.0), log_omega0=np.log(0.05)))
    res = gp.loo_residuals()
    assert abs(np.std(res) - 1.0) < 0.15
    assert kstest(res, norm.cdf).pvalue > 0.01

    # dense parity: alpha / sqrt(diag(K^-1))
    t, y = drw_lc.times, drw_lc.y
    true = DampedRandomWalk(log_S0=np.log(4.0), log_omega0=np.log(0.05))
    tau = np.abs(t[:, None] - t[None, :])
    K = np.array(true.covariance(tau)) + np.diag((drw_lc.dy + 1e-12) ** 2)
    Kinv = np.linalg.inv(K)
    ref = (Kinv @ (y - drw_lc.mean)) / np.sqrt(np.diag(Kinv))
    np.testing.assert_allclose(res, ref, rtol=1e-7, atol=1e-9)


def test_compare_models_residuals_kwarg(drw_lc):
    """residuals='standardized' reproduces the reference notebook's KS
    input (predictive-std residuals); invalid values raise."""
    import pytest as _pytest

    kernels = {"drw": DampedRandomWalk(log_S0=1.0, log_omega0=-3.0, bounds=[(-5, 10), (-8, 2)])}
    with _pytest.raises(ValueError, match="residuals"):
        compare_models(drw_lc, kernels, residuals="nope")
    res = compare_models(
        drw_lc, kernels, max_steps=200, walkers=8, converge=False, seed=7,
        residuals="standardized",
    )
    assert np.isfinite(res[0].ks_pvalue)
