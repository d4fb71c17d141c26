"""Observational noise models, vectorized on device.

Rebuild of reference mind_the_gaps/noise_models.py:14-184.  Each model
exposes two entry points:
- ``add_noise(rates)`` — host API parity (stateful numpy RNG-free; takes a
  jax key internally from a per-instance stream), returning
  (noisy_rates, dy) numpy arrays;
- ``add_noise_jax(key, rates)`` — the pure batched path used inside jitted
  pipelines (rates may be (..., N)).

The Kraft model replaces the reference's per-bin scipy/astropy loop
(noise_models.py:140-146) with closed-form incomplete-gamma bisection
(stats.kraft_posterior_median / kraft_hpd_interval), identical numerics,
fully batched.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from mind_the_gaps_tpu.stats import kraft_posterior_median, kraft_hpd_interval

__all__ = ["BaseNoise", "PoissonNoise", "KraftNoise", "GaussianNoise"]


class BaseNoise:
    def __init__(self, name: str):
        self.name = name
        self._key = jax.random.key(np.random.SeedSequence().entropy % (2**63))

    def _next_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    def seed(self, seed: int):
        self._key = jax.random.key(seed)

    def add_noise(self, rates):
        noisy, dy = self.add_noise_jax(self._next_key(), jnp.asarray(rates))
        return np.asarray(noisy), np.asarray(dy)

    def add_noise_jax(self, key, rates):
        raise NotImplementedError


class PoissonNoise(BaseNoise):
    """Poisson counting noise with optional background
    (reference noise_models.py:29-78): draw total counts, subtract
    background (frequentist), errors sqrt(counts)/exposure (+ bkg err)."""

    def __init__(self, exposures, background_counts=None, bkg_rate_err=None):
        super().__init__(name="Poisson")
        self.exposures = np.asarray(exposures, dtype=float)
        n = len(self.exposures)
        self.background_counts = (
            np.zeros(n) if background_counts is None else np.asarray(background_counts, dtype=float)
        )
        self.bkg_rate_err = (
            np.zeros(n) if bkg_rate_err is None else np.asarray(bkg_rate_err, dtype=float)
        )

    def add_noise_jax(self, key, rates):
        exposures = jnp.asarray(self.exposures)
        bkg = jnp.asarray(self.background_counts)
        bkg_err = jnp.asarray(self.bkg_rate_err)
        total_counts = rates * exposures + bkg
        total_poiss = jax.random.poisson(key, jnp.maximum(total_counts, 0.0)).astype(rates.dtype)
        net_counts = total_poiss - bkg
        dy = jnp.sqrt((jnp.sqrt(total_poiss) / exposures) ** 2 + bkg_err**2)
        return net_counts / exposures, dy


class KraftNoise(PoissonNoise):
    """Poisson noise with Bayesian Kraft+91 treatment of low-count bins
    (reference noise_models.py:81-149).

    Bins whose Poisson-drawn total counts fall below ``kraft_counts`` get:
    - rate = posterior median of the Kraft pdf (N = round(total), B = bkg),
    - dy = half-width of the 68% minimal (HPD) interval
      ('kraft-burrows-nousek', N = int(total) truncated like the
      reference's .astype(int)).
    """

    def __init__(self, exposures, background_counts=None, bkg_rate_err=None, kraft_counts: float = 15):
        super().__init__(exposures, background_counts, bkg_rate_err)
        self.name = "Kraft"
        self.kraft_counts = kraft_counts

    def add_noise_jax(self, key, rates):
        net_rates, dy = super().add_noise_jax(key, rates)
        exposures = jnp.asarray(self.exposures)
        bkg = jnp.asarray(self.background_counts)
        total_counts = net_rates * exposures + bkg

        low = total_counts < self.kraft_counts
        # medians use rounded counts (reference np.round(...).astype(int))
        N_med = jnp.clip(jnp.round(total_counts), 0.0, None)
        med = kraft_posterior_median(N_med, bkg)
        # intervals use truncated counts (reference .astype(int))
        N_int = jnp.clip(jnp.trunc(total_counts), 0.0, None)
        lo, hi = kraft_hpd_interval(N_int, bkg, cl=0.68)

        net_rates = jnp.where(low, med / exposures, net_rates)
        dy = jnp.where(low, (hi - lo) / 2.0 / exposures, dy)
        return net_rates, dy


class GaussianNoise(BaseNoise):
    """Additive white Gaussian noise of fixed sigma
    (reference noise_models.py:152-184)."""

    def __init__(self, exposures, sigma_noise: float):
        super().__init__(name="Gaussian")
        self.exposures = exposures
        self.sigma_noise = float(sigma_noise)

    def add_noise_jax(self, key, rates):
        noisy = rates + self.sigma_noise * jax.random.normal(key, rates.shape, dtype=rates.dtype)
        dy = jnp.full(rates.shape, self.sigma_noise, dtype=rates.dtype)
        return noisy, dy
