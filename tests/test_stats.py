"""Statistics tests (rebuild of reference tests/stats_test.py, plus
device-tier checks for the batched Kraft posterior)."""
import numpy as np
import scipy.integrate
from scipy import special
from scipy.stats import lognorm

import jax

from mind_the_gaps_tpu.stats import (
    aic,
    aicc,
    bic,
    chi_cov,
    chi_log_likehood,
    chi_square,
    create_log_normal,
    create_uniform_distribution,
    kraft_hpd_interval,
    kraft_pdf,
    kraft_posterior_median,
    lognormal,
    sample_pdf,
)


def test_create_lognormal():
    var, mean = 5.0, 12.0
    samples = create_log_normal(mean, np.sqrt(var)).rvs(size=2_000_000, random_state=1)
    np.testing.assert_allclose(np.mean(samples), mean, atol=0.01)
    np.testing.assert_allclose(np.var(samples), var, atol=0.05)


def test_create_uniform():
    var = 5.0
    for mean in [1.0, 10.0, 12.0]:
        samples = create_uniform_distribution(mean, np.sqrt(var)).rvs(size=2_000_000, random_state=2)
        np.testing.assert_allclose(np.mean(samples), mean, atol=0.01)
        np.testing.assert_allclose(np.var(samples), var, atol=0.02)


def test_lognormal_rv():
    log_1 = lognorm(1)
    samples = log_1.rvs(size=200_000, random_state=3)
    log_2 = lognormal(a=0)(0, 1)
    # the custom rv_continuous has only _pdf, so scipy's generic rvs
    # numerically inverts the CDF per draw (~8 ms each) — 2k draws keep
    # the check (s.e. of the mean ~0.05 vs atol 0.5, measured deltas
    # 0.003/0.226 at random_state=4) at 1/10 the wall clock
    samples_2 = log_2.rvs(size=2_000, random_state=4)
    np.testing.assert_allclose(np.mean(samples), np.mean(samples_2), atol=0.5)
    np.testing.assert_allclose(np.std(samples), np.std(samples_2), atol=0.5)


def test_sample_pdf_moments():
    key = jax.random.key(0)
    for pdf in ["gaussian", "lognormal", "uniform"]:
        x = np.asarray(sample_pdf(key, pdf, 10.0, 2.0, (500_000,)))
        np.testing.assert_allclose(np.mean(x), 10.0, atol=0.05)
        np.testing.assert_allclose(np.std(x), 2.0, atol=0.05)
        if pdf == "lognormal":
            assert np.all(x > 0)


def test_chi_loglikelihood():
    data = np.array([0.0, 1, 2])
    model = np.array([0.5, 1.5, 2.5])
    expect = 2.0 * np.sum(np.log(model) + data / model)
    np.testing.assert_allclose(expect, float(chi_log_likehood(data, model, False)), atol=1e-12)

    data = np.array([0.0, 1, 2, 3])
    model = np.array([0.5, 1.5, 2.5, 3.5])
    expect = 2.0 * np.sum(np.log(model[:-1]) + data[:-1] / model[:-1])
    expect += np.log(np.pi * data[-1] * model[-1]) + 2 * data[-1] / model[-1]
    np.testing.assert_allclose(expect, float(chi_log_likehood(data, model, True)), atol=1e-12)


def test_chi_cov_vs_diag():
    input_cov = np.diag([1.5, 1.5, 1.5])
    model = np.array([5.0, 2, 6])
    data = np.array([4.0, 1, 5])
    np.testing.assert_allclose(
        float(chi_square(data, model, np.sqrt(np.diag(input_cov)))),
        float(chi_cov(data, model, np.linalg.inv(input_cov))),
        atol=1e-5,
    )


def test_information_criteria():
    np.testing.assert_allclose(bic(-10.0, 100, 3), 20 + 3 * np.log(100))
    np.testing.assert_allclose(aic(-10.0, 3), 26.0)
    np.testing.assert_allclose(aicc(-10.0, 100, 3), 26.0 + 2 * 3 * 4 / 96)


# ---------------------------------------------------------------------- #
# Kraft posterior: device tier vs host scipy ground truth
# ---------------------------------------------------------------------- #
def _np_kraft_pdf(x, N, B):
    n = np.arange(N + 1)
    C = (np.sum(np.exp(-B) * B**n / special.factorial(n))) ** -1
    return C * np.exp(-x - B) * (x + B) ** N / special.factorial(N)


def test_kraft_median_matches_scipy():
    pdf = kraft_pdf(a=0, b=35)
    cases = [(0, 0.0), (1, 0.5), (3, 1.2), (7, 4.0), (14, 9.3), (5, 0.0)]
    Ns = np.array([c[0] for c in cases], dtype=float)
    Bs = np.array([c[1] for c in cases], dtype=float)
    med = np.asarray(kraft_posterior_median(Ns, Bs))
    for i, (N, B) in enumerate(cases):
        ref = pdf(N, B).median()
        np.testing.assert_allclose(med[i], ref, rtol=1e-6, atol=1e-8)


def test_kraft_hpd_interval():
    """HPD interval: integrates to CL, endpoints have equal density (or
    lower endpoint 0), verified by numeric integration."""
    cases = [(0, 0.0), (2, 0.5), (6, 3.0), (12, 8.0)]
    Ns = np.array([c[0] for c in cases], dtype=float)
    Bs = np.array([c[1] for c in cases], dtype=float)
    lo, hi = (np.asarray(v) for v in kraft_hpd_interval(Ns, Bs, cl=0.68))
    for i, (N, B) in enumerate(cases):
        mass, _ = scipy.integrate.quad(_np_kraft_pdf, lo[i], hi[i], args=(N, B))
        np.testing.assert_allclose(mass, 0.68, atol=2e-3)
        if lo[i] > 1e-6:
            np.testing.assert_allclose(
                _np_kraft_pdf(lo[i], N, B), _np_kraft_pdf(hi[i], N, B), rtol=1e-3
            )
        else:
            # upper-limit case: density at 0 must exceed density at hi
            assert _np_kraft_pdf(0.0, N, B) >= _np_kraft_pdf(hi[i], N, B) * 0.999


def test_kraft_hpd_is_minimal_width():
    """Any other interval with the same mass must be at least as wide."""
    N, B = 4, 1.5
    lo, hi = (float(np.asarray(v)) for v in kraft_hpd_interval(np.array([N * 1.0]), np.array([B]), cl=0.68))
    width = hi - lo
    rng = np.random.default_rng(0)
    for _ in range(20):
        a = rng.uniform(0, 8)
        # find b such that mass == 0.68
        from scipy.optimize import brentq

        def mass_to(b):
            m, _ = scipy.integrate.quad(_np_kraft_pdf, a, b, args=(N, B))
            return m - 0.68

        total, _ = scipy.integrate.quad(_np_kraft_pdf, a, 60, args=(N, B))
        if total < 0.68:
            continue
        b = brentq(mass_to, a, 60)
        assert b - a >= width - 5e-3
