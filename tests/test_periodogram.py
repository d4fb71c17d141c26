"""Lomb-Scargle periodogram tests: peak recovery, parity with a direct
per-frequency weighted least-squares sinusoid fit, and normalizations."""
import numpy as np

import jax.numpy as jnp

from mind_the_gaps_tpu.periodogram import autofrequency, lomb_scargle, ls_false_alarm_level


def _ls_direct(t, y, dy, freq):
    """Reference: chi^2 of weighted LSQ fit of a + b cos + c sin at one
    frequency vs constant-only model; standard normalization."""
    w = 1.0 / dy**2
    X = np.column_stack([np.ones_like(t), np.cos(2 * np.pi * freq * t), np.sin(2 * np.pi * freq * t)])
    WX = X * w[:, None]
    beta = np.linalg.solve(X.T @ WX, WX.T @ y)
    chi2 = np.sum(w * (y - X @ beta) ** 2)
    ymean = np.sum(w * y) / np.sum(w)
    chi2_ref = np.sum(w * (y - ymean) ** 2)
    return 1.0 - chi2 / chi2_ref


def test_peak_recovery():
    rng = np.random.default_rng(0)
    t = np.sort(rng.uniform(0, 100, 400))
    f0 = 0.55
    y = 3.0 + 1.5 * np.sin(2 * np.pi * f0 * t + 0.3) + rng.normal(0, 0.5, len(t))
    dy = np.full(len(t), 0.5)
    freqs = autofrequency(t)
    power = np.asarray(lomb_scargle(t, y, freqs, dy=dy))
    fpeak = freqs[np.argmax(power)]
    assert abs(fpeak - f0) < 2.0 / 100  # within a couple of grid steps
    assert power.max() > 0.5


def test_matches_direct_least_squares():
    rng = np.random.default_rng(1)
    t = np.sort(rng.uniform(0, 50, 120))
    y = 2.0 + np.sin(2 * np.pi * 0.3 * t) + rng.normal(0, 0.4, len(t))
    dy = rng.uniform(0.3, 0.6, len(t))
    freqs = np.array([0.05, 0.13, 0.3, 0.77, 1.9])
    power = np.asarray(lomb_scargle(t, y, freqs, dy=dy))
    ref = np.array([_ls_direct(t, y, dy, f) for f in freqs])
    np.testing.assert_allclose(power, ref, rtol=1e-8, atol=1e-10)


def test_normalizations():
    rng = np.random.default_rng(2)
    t = np.sort(rng.uniform(0, 30, 100))
    y = rng.normal(0, 1, 100)
    freqs = np.linspace(0.05, 2, 50)
    std = np.asarray(lomb_scargle(t, y, freqs))
    model = np.asarray(lomb_scargle(t, y, freqs, normalization="model"))
    log = np.asarray(lomb_scargle(t, y, freqs, normalization="log"))
    np.testing.assert_allclose(model, std / (1 - std), rtol=1e-10)
    np.testing.assert_allclose(log, -np.log(1 - std), rtol=1e-10)
    assert np.all(std >= 0) and np.all(std <= 1)


def test_false_alarm_level_monotone():
    t = np.sort(np.random.default_rng(3).uniform(0, 100, 200))
    freqs = autofrequency(t)
    z1 = ls_false_alarm_level(0.01, 200, freqs, t)
    z5 = ls_false_alarm_level(0.05, 200, freqs, t)
    assert 0 < z5 < z1 < 1
