"""Batch-native (batch-last layout) solver must agree exactly with the
vmapped single-element solver."""
import numpy as np

import jax
import jax.numpy as jnp

from mind_the_gaps_tpu.kernels import DampedRandomWalk, Lorentzian, JitterTerm
from mind_the_gaps_tpu.solver import log_likelihood
from mind_the_gaps_tpu.solver.batched import batched_log_likelihood, batched_log_prob_fn


def _problem(n=300, seed=0):
    rng = np.random.default_rng(seed)
    t = np.cumsum(rng.uniform(1.0, 4.0, n))
    y = rng.normal(5.0, 1.0, n)
    diag = rng.uniform(0.01, 0.05, n)
    return t, y, diag


def test_batched_matches_vmapped_shared_data():
    t, y, diag = _problem()
    kernel = DampedRandomWalk(0.5, -2.0) + Lorentzian(0.0, 1.5, -1.0)
    rng = np.random.default_rng(1)
    thetas = jnp.asarray(rng.normal(0, 0.2, (32, 5)) + np.array([0.5, -2.0, 0.0, 1.5, -1.0]))

    coeffs_b = jax.vmap(kernel.coefficients)(thetas)
    ll_b = np.asarray(batched_log_likelihood(coeffs_b, t, y, diag))
    ll_ref = np.asarray(
        jax.jit(jax.vmap(lambda th: log_likelihood(kernel.coefficients(th), t, y, diag)))(thetas)
    )
    np.testing.assert_allclose(ll_b, ll_ref, rtol=1e-10)


def test_batched_matches_vmapped_per_element_data():
    t, y, diag = _problem()
    kernel = DampedRandomWalk(0.5, -2.0)
    rng = np.random.default_rng(2)
    B = 16
    thetas = jnp.asarray(rng.normal(0, 0.2, (B, 2)) + np.array([0.5, -2.0]))
    ys = jnp.asarray(y[None, :] + rng.normal(0, 0.1, (B, len(y))))
    diags = jnp.asarray(np.tile(diag, (B, 1)) * rng.uniform(0.5, 2.0, (B, 1)))

    coeffs_b = jax.vmap(kernel.coefficients)(thetas)
    ll_b = np.asarray(batched_log_likelihood(coeffs_b, t, ys, diags))
    ll_ref = np.asarray(
        jax.jit(
            jax.vmap(lambda th, yy, dd: log_likelihood(kernel.coefficients(th), t, yy, dd))
        )(thetas, ys, diags)
    )
    np.testing.assert_allclose(ll_b, ll_ref, rtol=1e-10)


def test_batched_log_prob_fn_with_jitter_and_prior():
    t, y, diag = _problem(n=150)
    kernel = DampedRandomWalk(0.5, -2.0, bounds=[(-1, 2), (-4, 0)]) + JitterTerm(-1.0, bounds=[(-3, 1)])
    rng = np.random.default_rng(3)
    thetas = np.asarray(rng.normal(0, 0.1, (8, 3))) + np.array([0.5, -2.0, -1.0])
    thetas[0, 0] = 5.0  # out of bounds -> -inf

    fn = jax.jit(batched_log_prob_fn(kernel, t, y, diag))
    out = np.asarray(fn(jnp.asarray(thetas)))
    assert out[0] == -np.inf
    assert np.all(np.isfinite(out[1:]))

    # reference: single-element path
    from mind_the_gaps_tpu.solver import log_likelihood as ll_single

    for i in range(1, 8):
        th = jnp.asarray(thetas[i])
        ll = float(
            ll_single(
                kernel.coefficients(th), t, y - np.mean(y), diag + float(kernel.jitter(th))
            )
        )
        np.testing.assert_allclose(out[i], ll, rtol=1e-10)
