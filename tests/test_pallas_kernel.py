"""Pallas celerite kernel (interpret mode on CPU) must match the XLA
batched scan exactly."""
import numpy as np

import jax
import jax.numpy as jnp

from mind_the_gaps_tpu.kernels import DampedRandomWalk, Lorentzian, RealTerm, SHOTerm
from mind_the_gaps_tpu.ops.pallas_celerite import pallas_log_likelihood
from mind_the_gaps_tpu.solver.batched import batched_log_likelihood


def _data(n=300, seed=0):
    rng = np.random.default_rng(seed)
    t = np.cumsum(rng.uniform(2.0, 8.0, n))
    y = rng.normal(0.0, 2.0, n)
    diag = np.full(n, 0.09)
    return t, y, diag


def _check(kernel, with_mean=False):
    t, y, diag = _data()
    theta0 = kernel.get_parameter_vector()
    thetas = jnp.asarray(
        theta0 + 0.05 * np.asarray(jax.random.normal(jax.random.key(1), (128, len(theta0))))
    )
    co = jax.vmap(kernel.coefficients)(thetas)
    mean = jnp.full((128,), float(np.mean(y))) if with_mean else None
    ref = np.asarray(batched_log_likelihood(co, t, y, diag, mean=mean))
    pal = np.asarray(pallas_log_likelihood(co, t, y, diag, mean=mean, interpret=True))
    np.testing.assert_allclose(pal, ref, rtol=1e-12)


def test_pallas_drw_lorentzian():
    _check(DampedRandomWalk(1.0, -3.0) + Lorentzian(-1.0, 2.0, -2.0))


def test_pallas_real_only():
    _check(DampedRandomWalk(1.0, -3.0) + RealTerm(0.0, -1.0))


def test_pallas_complex_only():
    _check(SHOTerm(0.5, 1.0, -2.5) + Lorentzian(-1.0, 2.0, -2.0))


def test_pallas_with_mean():
    _check(DampedRandomWalk(1.0, -3.0), with_mean=True)


def test_pallas_f32():
    t, y, diag = _data()
    kernel = DampedRandomWalk(1.0, -3.0) + Lorentzian(-1.0, 2.0, -2.0)
    theta0 = kernel.get_parameter_vector()
    thetas = jnp.asarray(
        theta0 + 0.05 * np.asarray(jax.random.normal(jax.random.key(2), (256, 5))),
        dtype=jnp.float32,
    )
    co = jax.vmap(kernel.coefficients)(thetas)
    ref = np.asarray(batched_log_likelihood(co, t, y.astype(np.float32), diag.astype(np.float32)))
    pal = np.asarray(
        pallas_log_likelihood(co, t, y.astype(np.float32), diag.astype(np.float32), interpret=True)
    )
    np.testing.assert_allclose(pal, ref, rtol=1e-5, atol=1e-3)


def test_pallas_sym_matches_dense_body():
    """The packed-symmetric-S kernel body (default) must match the dense
    R x R body on every block-structure case, including two complex
    pairs (off-diagonal complex-complex blocks, R=5)."""
    t, y, diag = _data()
    kernels = [
        DampedRandomWalk(log_S0=1.0, log_omega0=-3.0),                      # Jr=1
        Lorentzian(log_S0=-1.0, log_Q=2.0, log_omega0=-2.0),                # Jc=1
        DampedRandomWalk(log_S0=1.0, log_omega0=-3.0)
        + Lorentzian(log_S0=-1.0, log_Q=2.0, log_omega0=-2.0),              # R=3
        DampedRandomWalk(log_S0=1.0, log_omega0=-3.0)
        + Lorentzian(log_S0=-1.0, log_Q=2.0, log_omega0=-2.0)
        + Lorentzian(log_S0=-0.5, log_Q=1.0, log_omega0=-1.0),              # R=5, Jc=2
        RealTerm(0.5, -1.0) + RealTerm(-0.5, -2.0)
        + Lorentzian(-1.0, 2.0, -2.0) + Lorentzian(-0.5, 1.0, -1.0),        # R=6
    ]
    for kernel in kernels:
        theta0 = kernel.get_parameter_vector()
        thetas = jnp.asarray(
            theta0 + 0.05 * np.asarray(jax.random.normal(jax.random.key(2), (128, len(theta0))))
        )
        co = jax.vmap(kernel.coefficients)(thetas)
        dense = np.asarray(pallas_log_likelihood(co, t, y, diag, interpret=True, sym=False))
        sym = np.asarray(pallas_log_likelihood(co, t, y, diag, interpret=True, sym=True))
        ref = np.asarray(batched_log_likelihood(co, t, y, diag))
        np.testing.assert_allclose(sym, dense, rtol=1e-9, atol=1e-7)
        np.testing.assert_allclose(sym, ref, rtol=1e-9, atol=1e-7)
