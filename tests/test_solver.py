"""Parity tests: semiseparable O(N R^2) solver vs dense O(N^2) Cholesky.

This is the correctness contract of the whole framework: the celerite
log-likelihood must be reproduced to 1e-8 rtol (BASELINE.md).  The dense
ground truth here is computed in *pure numpy/scipy* (fully independent of
JAX) from the closed-form covariance function — the same validation
contract the original celerite C++ solver uses.
"""
import math
import zlib

import numpy as np
import pytest
import scipy.linalg

import jax
import jax.numpy as jnp

from mind_the_gaps_tpu.kernels import (
    BendingPowerlaw,
    ComplexTerm,
    Cosinus,
    DampedRandomWalk,
    JitterTerm,
    Lorentzian,
    Matern32Term,
    RealTerm,
    SHOTerm,
)
from mind_the_gaps_tpu.solver import (
    log_likelihood,
    build_matrices,
    factor,
    solve,
    predict,
)


def _irregular_times(n, seed=0, span=100.0):
    rng = np.random.default_rng(seed)
    t = np.sort(rng.uniform(0, span, n))
    t += np.arange(n) * 1e-9
    return t


def _np_covariance(term, t, diag):
    """Dense covariance in pure numpy from the term's closed form."""
    tau = np.abs(t[:, None] - t[None, :])
    ar, cr, ac, bc, cc, dc = (np.asarray(x) for x in term.coefficients())
    K = np.zeros_like(tau)
    if ar.size:
        K += np.sum(ar * np.exp(-cr * tau[..., None]), axis=-1)
    if ac.size:
        e = np.exp(-cc * tau[..., None])
        K += np.sum(e * (ac * np.cos(dc * tau[..., None]) + bc * np.sin(dc * tau[..., None])), axis=-1)
    return K + np.diag(diag)


def _np_loglike(term, t, y, diag):
    K = _np_covariance(term, t, diag)
    L = scipy.linalg.cholesky(K, lower=True)
    z = scipy.linalg.solve_triangular(L, y, lower=True)
    return -0.5 * (z @ z + 2.0 * np.sum(np.log(np.diag(L))) + len(y) * math.log(2 * math.pi))


def _fast_loglike(term, t, y, diag):
    fn = jax.jit(lambda th: log_likelihood(term.coefficients(th), t, y, diag))
    return float(fn(jnp.asarray(term.get_parameter_vector())))


TERMS = [
    ("real", RealTerm(log_a=0.3, log_c=-1.2)),
    ("complex", ComplexTerm(log_a=0.1, log_b=-2.0, log_c=-1.0, log_d=0.5)),
    ("sho_under", SHOTerm(log_S0=0.2, log_Q=1.3, log_omega0=-0.5)),
    ("sho_over", SHOTerm(log_S0=0.2, log_Q=-1.5, log_omega0=-0.5)),
    ("matern32", Matern32Term(log_sigma=0.4, log_rho=1.1)),
    ("lorentzian", Lorentzian(log_S0=0.0, log_Q=1.6, log_omega0=-0.8)),
    ("cosinus", Cosinus(log_S0=-0.3, log_omega0=-0.7)),
    ("drw", DampedRandomWalk(log_S0=0.5, log_omega0=-1.5)),
    ("bpl", BendingPowerlaw(log_S0=0.5, log_Q=-0.5, log_omega0=-1.2)),
    ("drw+lor", DampedRandomWalk(0.5, -1.5) + Lorentzian(0.0, 1.6, -0.8)),
    ("drw+jitter", DampedRandomWalk(0.5, -1.5) + JitterTerm(log_sigma=-0.5)),
    (
        "three",
        RealTerm(0.3, -1.2) + SHOTerm(0.2, 1.3, -0.5) + Cosinus(-0.3, -0.7),
    ),
]


@pytest.mark.parametrize("name,term", TERMS, ids=[n for n, _ in TERMS])
def test_loglike_parity(name, term):
    n = 257
    t = _irregular_times(n, seed=zlib.crc32(name.encode()))
    rng = np.random.default_rng(42)
    y = rng.normal(0.0, 1.0, n)
    yerr = rng.uniform(0.05, 0.2, n)
    diag = (yerr + 1e-12) ** 2 + float(term.jitter())

    ll_fast = _fast_loglike(term, t, y, diag)
    ll_ref = _np_loglike(term, t, y, diag)
    np.testing.assert_allclose(ll_fast, ll_ref, rtol=1e-8)


def test_loglike_parity_large_n():
    term = DampedRandomWalk(0.5, -1.5) + Lorentzian(0.0, 1.6, -0.8)
    n = 2000
    t = _irregular_times(n, seed=7, span=5000.0)
    rng = np.random.default_rng(3)
    y = rng.normal(0.0, 1.0, n)
    yerr = rng.uniform(0.05, 0.2, n)
    ll_fast = _fast_loglike(term, t, y, yerr**2)
    ll_ref = _np_loglike(term, t, y, yerr**2)
    np.testing.assert_allclose(ll_fast, ll_ref, rtol=1e-8)


def test_solve_and_logdet_parity():
    term = SHOTerm(0.2, 1.3, -0.5) + RealTerm(0.3, -1.2)
    n = 300
    t = _irregular_times(n, seed=11)
    rng = np.random.default_rng(5)
    y = rng.normal(0.0, 1.0, n)
    yerr = rng.uniform(0.05, 0.2, n)
    diag = yerr**2

    @jax.jit
    def run(theta, yv):
        m = build_matrices(term.coefficients(theta), t, diag)
        D, W, ok = factor(m)
        return solve(m, D, W, yv), jnp.sum(jnp.log(D)), ok

    x, logdet, ok = run(jnp.asarray(term.get_parameter_vector()), jnp.asarray(y))
    assert bool(ok)

    K = _np_covariance(term, t, diag)
    np.testing.assert_allclose(np.asarray(x), np.linalg.solve(K, y), rtol=1e-7, atol=1e-9)
    sign, logdet_ref = np.linalg.slogdet(K)
    assert sign > 0
    np.testing.assert_allclose(float(logdet), logdet_ref, rtol=1e-8)


def test_non_positive_definite_returns_neginf():
    # complex term with b*d > a*c is not positive definite
    term = ComplexTerm(log_a=0.1, log_b=1.5, log_c=-1.0, log_d=0.5)
    t = np.linspace(0, 50, 200)
    y = np.zeros(200)
    ll = _fast_loglike(term, t, y, np.full(200, 1e-16))
    assert ll == -np.inf


def test_gradients_finite():
    term = DampedRandomWalk(0.5, -1.5) + Lorentzian(0.0, 1.6, -0.8)
    n = 128
    t = _irregular_times(n, seed=2)
    rng = np.random.default_rng(8)
    y = rng.normal(0.0, 1.0, n)
    diag = np.full(n, 0.01)

    nll = jax.jit(lambda th: -log_likelihood(term.coefficients(th), t, y, diag))
    grad = jax.jit(jax.grad(lambda th: -log_likelihood(term.coefficients(th), t, y, diag)))

    theta0 = jnp.asarray(term.get_parameter_vector())
    g = np.asarray(grad(theta0))
    assert np.all(np.isfinite(g))

    eps = 1e-6
    for i in range(theta0.shape[0]):
        fd = (float(nll(theta0.at[i].add(eps))) - float(nll(theta0.at[i].add(-eps)))) / (2 * eps)
        np.testing.assert_allclose(g[i], fd, rtol=1e-4, atol=1e-6)


def test_predict_against_dense():
    term = DampedRandomWalk(0.5, -1.5)
    n = 150
    t = _irregular_times(n, seed=21)
    rng = np.random.default_rng(13)
    y = rng.normal(0.0, 1.0, n)
    yerr = rng.uniform(0.1, 0.3, n)
    diag = yerr**2

    fn = jax.jit(lambda th: predict(term.coefficients(th), t, y, diag))
    mu, var = fn(jnp.asarray(term.get_parameter_vector()))

    K = _np_covariance(term, t, diag)
    K_s = K - np.diag(diag)
    alpha = np.linalg.solve(K, y)
    mu_ref = K_s @ alpha
    var_ref = float(term.variance()) - np.einsum("ij,jk,ik->i", K_s, np.linalg.inv(K), K_s)
    np.testing.assert_allclose(np.asarray(mu), mu_ref, rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(var), var_ref, rtol=1e-5, atol=1e-8)


def test_vmap_over_parameters():
    term = DampedRandomWalk(0.5, -1.5)
    n = 100
    t = _irregular_times(n, seed=31)
    rng = np.random.default_rng(17)
    y = rng.normal(0.0, 1.0, n)
    diag = np.full(n, 0.01)

    thetas = jnp.asarray(rng.normal(0.0, 0.3, (16, 2))) + jnp.asarray([0.5, -1.5])

    ll = lambda th: log_likelihood(term.coefficients(th), t, y, diag)
    batched = jax.jit(jax.vmap(ll))(thetas)
    single = jax.jit(ll)
    for i in range(16):
        np.testing.assert_allclose(float(batched[i]), float(single(thetas[i])), rtol=1e-10)


# ------------------------------------------------------------------ #
# predict_at: O(R^2)-per-point selected-inverse tables vs dense GP
# ------------------------------------------------------------------ #
@pytest.mark.parametrize(
    "name,term",
    [
        ("real", DampedRandomWalk(0.5, -2.0)),
        ("complex", Lorentzian(-0.5, 1.5, -1.0)),
        ("mixed", DampedRandomWalk(0.5, -2.0) + Lorentzian(-0.5, 1.5, -1.0) + SHOTerm(0.2, 0.3, -1.5)),
    ],
)
def test_predict_at_tables_vs_dense(name, term):
    """predict_at (quadratic-form tables, _predict_tables) must match the
    dense GP posterior at rtol 1e-6, including test points before/after
    the data, inside gaps, and exactly at training times."""
    from mind_the_gaps_tpu.solver.semiseparable import predict_at

    rng = np.random.default_rng(zlib.crc32(name.encode()))
    n, m = 140, 71
    t = np.sort(rng.uniform(0, 300, n))
    y = rng.normal(0, 2, n)
    diag = rng.uniform(0.05, 0.2, n)
    t_pred = np.sort(
        np.concatenate([np.linspace(-10, 320, m - 4), t[[3, n // 2, n - 5]], [t[10] + 1e-9]])
    )

    theta = jnp.asarray(term.get_parameter_vector())
    co = term.coefficients(theta)
    mu, var = predict_at(co, t, y, diag, t_pred)

    tau_tt = np.abs(t[:, None] - t[None, :])
    K = np.asarray(term.covariance(tau_tt)) + np.diag(diag)
    tau_st = np.abs(t_pred[:, None] - t[None, :])
    Ks = np.asarray(term.covariance(tau_st))
    mu_ref = Ks @ np.linalg.solve(K, y)
    var_ref = float(term.variance()) - np.einsum("ij,jk,ik->i", Ks, np.linalg.inv(K), Ks)
    np.testing.assert_allclose(np.asarray(mu), mu_ref, rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(np.asarray(var), var_ref, rtol=1e-6, atol=1e-10)

    mu_only = predict_at(co, t, y, diag, t_pred, return_var=False)
    np.testing.assert_allclose(np.asarray(mu_only), mu_ref, rtol=1e-6, atol=1e-9)


def test_predict_at_scaling_in_m():
    """The per-query cost must be O(R^2): a 10x denser prediction grid may
    not cost ~10x (it did with the old one-solve-per-point path)."""
    import time

    from mind_the_gaps_tpu.solver.semiseparable import predict_at

    term = DampedRandomWalk(0.5, -2.0) + Lorentzian(-0.5, 1.5, -1.0)
    rng = np.random.default_rng(5)
    n = 2000
    t = np.sort(rng.uniform(0, 5000, n))
    y = rng.normal(0, 2, n)
    diag = np.full(n, 0.09)
    co = term.coefficients(jnp.asarray(term.get_parameter_vector()))

    fn = jax.jit(lambda tp: predict_at(co, t, y, diag, tp))

    def timed(m):
        tp = jnp.linspace(-10.0, 5010.0, m)
        mu, var = fn(tp)
        var.block_until_ready()  # compile
        reps = 3
        start = time.perf_counter()
        for _ in range(reps):
            mu, var = fn(tp)
        var.block_until_ready()
        return (time.perf_counter() - start) / reps

    t200 = timed(200)
    t2000 = timed(2000)
    assert t2000 < 4.0 * t200, (t200, t2000)


@pytest.mark.parametrize("name,term", TERMS, ids=[n for n, _ in TERMS])
def test_numpy_ref_loglike_parity(name, term):
    """solver/numpy_ref.py (the compile-free tier GPModelling validates
    kernels with) must match the dense numpy/scipy ground truth."""
    from mind_the_gaps_tpu.solver.numpy_ref import numpy_log_likelihood

    t = _irregular_times(150, seed=zlib.crc32(name.encode()) % 2**31)
    rng = np.random.default_rng(3)
    y = rng.normal(0.0, 1.0, t.shape[0])
    diag = rng.uniform(0.05, 0.2, t.shape[0])
    coeffs = tuple(np.asarray(c) for c in term.coefficients())
    ll_np = numpy_log_likelihood(coeffs, t, y, diag)
    assert abs(ll_np - _np_loglike(term, t, y, diag)) < 1e-8 * max(1.0, abs(ll_np))


def test_numpy_ref_non_pd_returns_neginf():
    from mind_the_gaps_tpu.solver.numpy_ref import numpy_log_likelihood

    term = ComplexTerm(log_a=0.1, log_b=5.0, log_c=-1.0, log_d=0.5)  # b >> a: invalid
    t = _irregular_times(60)
    y = np.zeros(60)
    coeffs = tuple(np.asarray(c) for c in term.coefficients())
    assert numpy_log_likelihood(coeffs, t, y, np.full(60, 1e-8)) == -np.inf
