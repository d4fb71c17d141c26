"""Kalman (state-space) solvers must reproduce the celerite likelihood:
sequential filter and the associative-scan parallel filter both match
the semiseparable scan at f64 parity levels."""
import zlib
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mind_the_gaps_tpu.kernels import (
    Cosinus,
    DampedRandomWalk,
    Lorentzian,
    RealTerm,
    SHOTerm,
)
from mind_the_gaps_tpu.solver import log_likelihood
from mind_the_gaps_tpu.solver.kalman import (
    kalman_log_likelihood,
    parallel_kalman_log_likelihood,
)


def _problem(n=400, seed=0):
    rng = np.random.default_rng(seed)
    t = np.cumsum(rng.uniform(1.0, 4.0, n))
    y = rng.normal(0.0, 2.0, n)
    diag = rng.uniform(0.01, 0.1, n)
    return t, y, diag


KERNELS = [
    ("drw", DampedRandomWalk(0.5, -2.0)),
    ("real2", RealTerm(0.3, -1.2) + RealTerm(-0.5, -2.5)),
    ("lorentzian", Lorentzian(0.0, 1.5, -1.0)),
    ("drw+lor", DampedRandomWalk(0.5, -2.0) + Lorentzian(0.0, 1.5, -1.0)),
    ("sho_hiQ", SHOTerm(0.2, 1.3, -0.5)),
    ("sho_loQ_under", SHOTerm(0.2, np.log(0.6), -0.5)),  # b > a regime
    ("cosinus", Cosinus(-0.3, -0.7)),
]


@pytest.mark.parametrize("name,kern", KERNELS, ids=[k for k, _ in KERNELS])
def test_sequential_kalman_matches_celerite(name, kern):
    t, y, diag = _problem(seed=zlib.crc32(name.encode()) % 1000)
    co = kern.coefficients(jnp.asarray(kern.get_parameter_vector()))
    ll_ref = float(jax.jit(lambda: log_likelihood(co, t, y, diag))())
    ll_kal = float(jax.jit(lambda: kalman_log_likelihood(co, t, y, diag))())
    np.testing.assert_allclose(ll_kal, ll_ref, rtol=1e-8)


@pytest.mark.parametrize("name,kern", KERNELS, ids=[k for k, _ in KERNELS])
def test_parallel_kalman_matches_celerite(name, kern):
    t, y, diag = _problem(seed=zlib.crc32(name.encode()) % 1000)
    co = kern.coefficients(jnp.asarray(kern.get_parameter_vector()))
    ll_ref = float(jax.jit(lambda: log_likelihood(co, t, y, diag))())
    ll_par = float(parallel_kalman_log_likelihood(co, t, y, diag))
    np.testing.assert_allclose(ll_par, ll_ref, rtol=1e-8)


def test_parallel_kalman_gradients():
    kern = DampedRandomWalk(0.5, -2.0) + Lorentzian(0.0, 1.5, -1.0)
    t, y, diag = _problem(n=200, seed=3)

    def nll_par(theta):
        return -parallel_kalman_log_likelihood(kern.coefficients(theta), t, y, diag)

    def nll_ref(theta):
        return -log_likelihood(kern.coefficients(theta), t, y, diag)

    theta0 = jnp.asarray(kern.get_parameter_vector())
    g_par = np.asarray(jax.jit(jax.grad(nll_par))(theta0))
    g_ref = np.asarray(jax.jit(jax.grad(nll_ref))(theta0))
    np.testing.assert_allclose(g_par, g_ref, rtol=1e-6, atol=1e-8)


def test_small_inv_closed_form():
    """The Faddeev-LeVerrier / direct small inverses must match
    np.linalg.inv for every state dimension the kernels produce."""
    from mind_the_gaps_tpu.solver.kalman import _small_inv

    rng = np.random.default_rng(8)
    for p in [1, 2, 3, 4, 5, 6]:
        M = rng.normal(size=(7, p, p))
        M = M + 3.0 * p * np.eye(p)  # well-conditioned
        inv = np.asarray(_small_inv(jnp.asarray(M)))
        np.testing.assert_allclose(inv, np.linalg.inv(M), rtol=1e-9, atol=1e-11)
