"""Dense O(N^2) reference GP solver.

Independent ground truth for the fast semiseparable solver: builds the full
covariance matrix from the kernel's closed-form k(tau) and evaluates the
Gaussian log-likelihood by dense Cholesky.  This is the same validation
contract the original celerite library uses, and it is what the 1e-8
rtol parity requirement (BASELINE.md) is checked against in our tests.

Also used as the fallback path for predictive variances at moderate N.
"""
from __future__ import annotations

import math

import jax.numpy as jnp
import jax.scipy.linalg as jsl


def dense_covariance(term, t, yerr, theta=None):
    """Full covariance matrix K = k(|t_i - t_j|) + diag(yerr^2 + jitter)."""
    t = jnp.asarray(t)
    tau = jnp.abs(t[:, None] - t[None, :])
    K = term.covariance(tau, theta)
    diag = jnp.asarray(yerr) ** 2 + term.jitter(theta)
    return K + jnp.diag(diag)


def dense_log_likelihood(term, t, y, yerr, theta=None, mean=0.0):
    """log N(y | mean, K) via dense Cholesky."""
    y = jnp.asarray(y)
    r = y - mean
    K = dense_covariance(term, t, yerr, theta)
    L = jnp.linalg.cholesky(K)
    z = jsl.solve_triangular(L, r, lower=True)
    quad = jnp.sum(z**2)
    logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(L)))
    n = y.shape[-1]
    return -0.5 * (quad + logdet + n * math.log(2.0 * math.pi))
