"""Checkpoint round-trip, reference import-path aliases, and the f32
bootstrap option."""
import numpy as np
import pytest

import jax

from mind_the_gaps_tpu import GappyLightcurve
from mind_the_gaps_tpu.gpmodelling import GPModelling
from mind_the_gaps_tpu.kernels import DampedRandomWalk


def test_reference_import_paths():
    from mind_the_gaps_tpu.noise_models import PoissonNoise, KraftNoise, GaussianNoise  # noqa
    from mind_the_gaps_tpu.models.celerite_models import (  # noqa
        Lorentzian, Cosinus, DampedRandomWalk, BendingPowerlaw,
    )
    from mind_the_gaps_tpu.models import LinearModel, GaussianModel  # noqa
    from mind_the_gaps_tpu.lightcurves import GappyLightcurve  # noqa


def _quick_fit(tmp=None):
    rng = np.random.default_rng(0)
    n = 120
    t = np.cumsum(rng.uniform(2.0, 6.0, n))
    true = DampedRandomWalk(log_S0=np.log(2.0), log_omega0=np.log(0.08))
    tau = np.abs(t[:, None] - t[None, :])
    K = np.array(true.covariance(tau)) + np.diag(np.full(n, 0.04))
    y = 5.0 + np.linalg.cholesky(K) @ rng.normal(size=n)
    lc = GappyLightcurve(t, y, np.full(n, 0.2), exposures=1.0)
    gp = GPModelling(lc, DampedRandomWalk(0.0, -2.0, bounds=[(-4, 6), (-6, 1)]))
    gp.derive_posteriors(max_steps=400, convergence_steps=200, walkers=12, seed=4)
    return gp


def test_checkpoint_roundtrip(tmp_path):
    gp = _quick_fit()
    path = str(tmp_path / "chk.npz")
    gp.save_posteriors(path)

    gp2 = GPModelling(gp._lightcurve, DampedRandomWalk(0.0, -2.0, bounds=[(-4, 6), (-6, 1)]))
    with pytest.raises(RuntimeError):
        gp2.save_posteriors(path)
    gp2.load_posteriors(path)
    np.testing.assert_array_equal(gp2.mcmc_samples, gp.mcmc_samples)
    np.testing.assert_array_equal(gp2.loglikelihoods, gp.loglikelihoods)
    assert gp2.converged == gp.converged
    np.testing.assert_array_equal(gp2.tau, gp.tau)
    assert gp2.max_loglikelihood == gp.max_loglikelihood
    # the restored sampler supports the diagnostics
    assert gp2.get_rstat(burnin=50).shape[1] == 2


def test_lrt_f32_bootstrap_close_to_f64():
    import jax.numpy as jnp

    from mind_the_gaps_tpu.lrt import fit_lightcurves_batch

    rng = np.random.default_rng(1)
    n = 200
    t = np.cumsum(rng.uniform(2.0, 6.0, n))
    true = DampedRandomWalk(log_S0=np.log(2.0), log_omega0=np.log(0.08))
    tau = np.abs(t[:, None] - t[None, :])
    K = np.array(true.covariance(tau)) + np.diag(np.full(n, 0.04))
    ys = np.stack([5.0 + np.linalg.cholesky(K) @ rng.normal(size=n) for _ in range(3)])
    dys = np.full((3, n), 0.2)
    theta0 = np.array([np.log(2.0), np.log(0.08)])
    kernel = DampedRandomWalk(0.0, -2.0, bounds=[(-4, 6), (-6, 1)])

    # same key: the f32 run must find max loglikes close to the f64 run
    lls64, _ = fit_lightcurves_batch(
        jax.random.key(5), kernel, t, ys, dys, theta0, walkers=8, n_steps=120
    )
    lls32, _ = fit_lightcurves_batch(
        jax.random.key(5), kernel, t, ys, dys, theta0, walkers=8, n_steps=120,
        dtype=jnp.float32,
    )
    assert np.all(np.isfinite(lls32))
    # chains differ (different rounding -> different accepts), but the
    # achieved maxima must agree at the chain-noise level
    np.testing.assert_allclose(lls32, lls64, atol=2.0)


def test_compile_cache_config_defaults():
    """The package sets a persistent compilation cache unless the user
    configured one (MTG_TPU_NO_COMPILE_CACHE=1 disables)."""
    import jax

    import mind_the_gaps_tpu  # noqa: F401 - already imported by the suite

    # either the package default or a user-provided dir must be active
    assert jax.config.jax_compilation_cache_dir, "compilation cache should be configured"
