"""Mixed-precision contract: the float32 fast path (local-phase rotation
form + Kahan accumulators) must track the float64 log-likelihood to
well under 1 in absolute log-likelihood at bootstrap scale — the
accuracy needed for MCMC acceptance decisions."""
import numpy as np

import jax
import jax.numpy as jnp

from mind_the_gaps_tpu.kernels import DampedRandomWalk, Lorentzian, SHOTerm
from mind_the_gaps_tpu.solver.batched import batched_log_likelihood


def _case(kernel, theta0, n_points=5000, seed=0, tol=0.5):
    rng = np.random.default_rng(seed)
    t = np.cumsum(rng.uniform(2.0, 8.0, n_points))
    y = rng.normal(0.0, 2.0, n_points)
    diag = np.full(n_points, 0.09)
    thetas = theta0 + 0.05 * np.asarray(jax.random.normal(jax.random.key(1), (8, len(theta0))))

    c64 = jax.vmap(kernel.coefficients)(jnp.asarray(thetas))
    ll64 = np.asarray(batched_log_likelihood(c64, t, y, diag))
    c32 = jax.tree.map(lambda x: x.astype(jnp.float32), c64)
    ll32 = np.asarray(
        batched_log_likelihood(
            c32, t, y.astype(np.float32), diag.astype(np.float32)
        )
    )
    assert np.all(np.isfinite(ll64))
    assert np.max(np.abs(ll64 - ll32)) < tol, (ll64, ll32)


def test_f32_tracks_f64_drw_lorentzian():
    kernel = DampedRandomWalk(1.0, -3.0) + Lorentzian(-1.0, 2.0, -2.0)
    _case(kernel, kernel.get_parameter_vector())


def test_f32_tracks_f64_sho():
    kernel = SHOTerm(0.5, 1.0, -2.5)
    _case(kernel, kernel.get_parameter_vector())


def test_f32_tracks_f64_long_baseline():
    """Large absolute times (1e7 s baselines, the Swift regime): the
    local-phase form must stay accurate where absolute-phase trig would
    be catastrophically wrong in f32."""
    kernel = DampedRandomWalk(1.0, np.log(2e-6)) + Lorentzian(-1.0, 2.0, np.log(1e-5))
    rng = np.random.default_rng(3)
    n = 2000
    t = 5e7 + np.cumsum(rng.uniform(2e4, 1e5, n))  # ~days cadence, years span
    y = rng.normal(0.0, 2.0, n)
    diag = np.full(n, 0.09)
    theta0 = kernel.get_parameter_vector()
    thetas = theta0 + 0.05 * np.asarray(jax.random.normal(jax.random.key(2), (4, 5)))
    c64 = jax.vmap(kernel.coefficients)(jnp.asarray(thetas))
    ll64 = np.asarray(batched_log_likelihood(c64, t, y, diag))
    c32 = jax.tree.map(lambda x: x.astype(jnp.float32), c64)
    ll32 = np.asarray(batched_log_likelihood(c32, t, y.astype(np.float32), diag.astype(np.float32)))
    assert np.all(np.isfinite(ll64))
    assert np.max(np.abs(ll64 - ll32)) < 1.0, (ll64, ll32)
