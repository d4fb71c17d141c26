"""Tests for the periodogram-fitting and misc time-series utilities."""
import numpy as np

from mind_the_gaps_tpu import fitting, utils


def test_linear_fit_recovers_powerlaw():
    rng = np.random.default_rng(0)
    f = np.logspace(-2, 0, 200)
    powers = 3.0 * f**-1.5 * np.exp(rng.normal(0, 0.05, f.size))
    slope, slope_err, norm, norm_err = fitting.fit_psd_powerlaw(f, powers)
    assert abs(slope + 1.5) < 0.05
    assert slope_err > 0 and norm_err > 0
    # the +0.25068 bias correction shifts the normalization up
    res_nocorr = fitting.linear_fit(f, powers)
    assert norm > 10 ** res_nocorr.params["pow_intercept"]


def test_fit_lomb_scargle_errors():
    rng = np.random.default_rng(1)
    f = np.logspace(-2, 0, 100)
    powers = 2.0 * f**-1.0 * np.exp(rng.normal(0, 0.2, f.size))
    slope, slope_err, norm, norm_err = fitting.fit_lomb_scargle(f, powers)
    assert abs(slope + 1.0) < 0.2
    assert slope_err > 0


def test_chose_ls_model_prefers_break_when_present():
    rng = np.random.default_rng(2)
    f = np.logspace(-3, 0, 300)
    fb = 0.05
    # the reference's brokenpl models a powerlaw flattening ABOVE the
    # break (a high-frequency noise floor, fitting.py:39-48)
    powers = np.where(f < fb, (f / fb) ** -2.0, 1.0) * np.exp(rng.normal(0, 0.1, f.size))
    best = fitting.chose_ls_model(f, powers)
    assert best.nvarys == 3  # broken fit wins
    _, fmax = fitting.chose_frequency_range(f, powers)
    assert 0.01 < fmax < 0.3

    # plain powerlaw data -> no break preferred
    powers2 = 2.0 * f**-1.0 * np.exp(rng.normal(0, 0.1, f.size))
    best2 = fitting.chose_ls_model(f, powers2)
    # bic comparison can go either way on noise, but the chosen break
    # (if any) must not truncate most of the range
    _, fmax2 = fitting.chose_frequency_range(f, powers2)
    assert fmax2 > 0.005


def test_minimize_powerlaw_s_statistic():
    rng = np.random.default_rng(3)
    f = np.logspace(-2, 0, 500)
    true = 5.0 * f**-1.2
    powers = true * rng.exponential(1.0, f.size)  # chi2_2-distributed periodogram
    norm, slope = fitting.minimize_powerlaw(f, powers)
    assert abs(slope + 1.2) < 0.15
    s0 = fitting.s_statistic(powers, true)
    s1 = fitting.s_statistic(powers, norm * f**slope)
    assert s1 <= s0 + 1.0  # fitted model at least as good


def test_phase_fold():
    rng = np.random.default_rng(4)
    t = np.sort(rng.uniform(0, 100, 500))
    freq = 0.25
    y = 2.0 + np.sin(2 * np.pi * freq * t * 1.0)  # folding freq in cycles/time
    means, stds, bins = utils.phase_fold(t, y, freq, dy=np.full(t.size, 0.1), n_bins=10)
    assert len(means) == 20 and len(bins) == 20
    # folded profile spans the sine amplitude
    assert means.max() - means.min() > 1.0


def test_detrend():
    rng = np.random.default_rng(5)
    t = np.linspace(0, 10, 200)
    y = 3.0 + 0.7 * t + rng.normal(0, 0.1, t.size)
    detrended, trend = utils.detrend(t, y)
    assert abs(np.polyfit(t, detrended, 1)[0]) < 0.01
    np.testing.assert_allclose(trend + detrended, y)


def test_fit_sines_recovers_amplitude():
    rng = np.random.default_rng(6)
    t = np.sort(rng.uniform(0, 40, 400))
    f0 = 0.25
    y = 5.0 + 1.5 * np.sin(2 * np.pi * f0 * t + 0.4) + rng.normal(0, 0.2, t.size)
    fit = utils.fit_sines(t, y, frequency=f0, dy=np.full(t.size, 0.2))
    model = fit.eval(t)
    assert np.std(y - model) < 0.35  # residuals ~ noise level


def test_mudelsee_and_ar1_roundtrip():
    rng = np.random.default_rng(7)
    tau_true = 20.0
    t = np.cumsum(rng.uniform(0.5, 1.5, 3000))
    sims = utils.simulate_ar1(tau_true, t, variance=4.0, mean=0.0, nsimulations=1, rng=rng)
    x = sims[0]
    # variance matches
    assert abs(np.var(x) - 4.0) / 4.0 < 0.3
    tau_fit, residuals = utils.mudelsee_fit(t, x)
    assert 0.5 * tau_true < tau_fit < 2.0 * tau_true
    assert len(residuals) == len(t) - 1


def test_psd_ar1_normalization():
    freqs = np.linspace(0.001, 0.5, 256)
    df = freqs[1] - freqs[0]
    g = utils.psd_ar1(tau=10.0, dt=1.0, df=df, frequencies=freqs, data_variance=2.5)
    np.testing.assert_allclose(np.sum(g) * df, 2.5, rtol=1e-10)
