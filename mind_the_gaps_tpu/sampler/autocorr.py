"""Integrated autocorrelation time, on device.

Same estimator emcee's ``get_autocorr_time(tol=0)`` uses (reference
convergence loop, gpmodelling.py:250-263): per-walker FFT
autocorrelation, averaged across walkers, tau = 2*cumsum(rho)-1 with
Sokal's automated windowing (c = 5).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["integrated_autocorr_time", "integrated_autocorr_time_np", "autocorr_function"]


def _next_pow_two(n: int) -> int:
    i = 1
    while i < n:
        i <<= 1
    return i


def autocorr_function(x):
    """Normalized autocorrelation of a 1-D series via FFT.

    Computed in float32: TPU FFTs support complex64 only, and tau
    estimation needs no more precision.
    """
    n = x.shape[0]
    m = 2 * _next_pow_two(n)
    xc = (x - jnp.mean(x)).astype(jnp.float32)
    f = jnp.fft.fft(xc, n=m)
    acf = jnp.fft.ifft(f * jnp.conj(f))[:n].real
    acf = acf.astype(x.dtype)
    return acf / acf[0]


def integrated_autocorr_time_np(chain, c: float = 5.0):
    """Host (numpy) version of integrated_autocorr_time.

    The convergence loop calls this every ``convergence_steps`` on a
    chain whose length keeps growing — on device that would recompile
    for every new length, and the arrays are tiny anyway.
    """
    import numpy as np

    chain = np.asarray(chain)
    n, w, d = chain.shape
    m = 2 * _next_pow_two(n)
    x = chain - chain.mean(axis=0, keepdims=True)
    f = np.fft.fft(x, n=m, axis=0)
    acf = np.fft.ifft(f * np.conj(f), axis=0)[:n].real
    # constant (stuck) walkers have acf[0] == 0; treat them as maximally
    # correlated (acf = 1 at all lags -> huge tau, blocks convergence)
    # instead of propagating NaN into the convergence logic
    norm = acf[:1].copy()
    dead = ~(norm > 0)  # (1, w, d)
    norm[dead] = 1.0
    acf = acf / norm
    acf = np.where(np.broadcast_to(dead, acf.shape), 1.0, acf)
    rho = acf.mean(axis=1)  # (n, d)
    taus = 2.0 * np.cumsum(rho, axis=0) - 1.0
    out = np.empty(d)
    ms = np.arange(n)
    for j in range(d):
        crossed = ms >= c * taus[:, j]
        window = int(np.argmax(crossed)) if crossed.any() else n - 1
        out[j] = taus[window, j]
    return out


@partial(jax.jit, static_argnames=("c",))
def integrated_autocorr_time(chain, c: float = 5.0):
    """tau for each parameter from a (n_steps, n_walkers, ndim) chain.

    Matches emcee.autocorr.integrated_time with tol=0: walker-averaged
    autocorrelation function, taus = 2*cumsum(rho)-1, window = first M
    with M >= c*tau_M (else argmax fallback).
    """
    n, w, d = chain.shape

    def per_param(x):  # x: (n, w)
        rho = jax.vmap(autocorr_function, in_axes=1, out_axes=1)(x)  # (n, w)
        f = jnp.mean(rho, axis=1)
        taus = 2.0 * jnp.cumsum(f) - 1.0
        m = jnp.arange(n)
        crossed = m >= c * taus
        # first index where window criterion holds; argmax of bool gives it
        any_cross = jnp.any(crossed)
        window = jnp.where(any_cross, jnp.argmax(crossed), n - 1)
        return taus[window]

    return jax.vmap(per_param, in_axes=2)(chain)
