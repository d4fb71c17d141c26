"""PSD <-> kernel consistency tests (rebuild of reference tests/models_test.py):
the analytic PSD models must equal the corresponding kernel term's
``get_psd`` over a frequency grid."""
import numpy as np

from mind_the_gaps_tpu.kernels import (
    DampedRandomWalk,
    Lorentzian as LorentzianTerm,
    Matern32Term,
    SHOTerm,
)
from mind_the_gaps_tpu.models import psd_models


FREQS = np.arange(1, 1000, dtype=float)


def test_DRW():
    S_0, w_0 = 10.0, 5.0
    term = DampedRandomWalk(log_S0=np.log(S_0), log_omega0=np.log(w_0))
    psd = psd_models.BendingPowerlaw(S0=S_0, omega0=w_0, Q=0.5)
    np.testing.assert_array_almost_equal(np.asarray(psd(FREQS)), np.asarray(term.get_psd(FREQS)))


def test_SHO():
    S_0, w_0 = 10.0, 5.0
    for Q in [10, 1, 1 / np.sqrt(2), 0.1]:
        term = SHOTerm(log_S0=np.log(S_0), log_Q=np.log(Q), log_omega0=np.log(w_0))
        psd = psd_models.SHO(S0=S_0, omega0=w_0, Q=Q)
        np.testing.assert_array_almost_equal(np.asarray(psd(FREQS)), np.asarray(term.get_psd(FREQS)))


def test_materns():
    sigma = 10.0
    for rho in [1, 10, 20]:
        term = Matern32Term(log_sigma=np.log(sigma), log_rho=np.log(rho), eps=1e-8)
        psd32 = psd_models.Matern32(sigma=sigma, rho=rho)
        np.testing.assert_array_almost_equal(np.asarray(psd32(FREQS)), np.asarray(term.get_psd(FREQS)))

        m52 = psd_models.Matern52(sigma=sigma, rho=rho)
        m52_gen = psd_models.Matern(FREQS, sigma=sigma, rho=rho, n=1, nu=5 / 2)
        np.testing.assert_array_almost_equal(np.asarray(m52(FREQS)), np.asarray(m52_gen))

        m32_gen = psd_models.Matern(FREQS, sigma=sigma, rho=rho, n=1, nu=3 / 2)
        np.testing.assert_array_almost_equal(np.asarray(psd32(FREQS)), np.asarray(m32_gen))


def test_Lorentzian():
    w_0 = 5.0
    for Q in [10, 1, 1 / np.sqrt(2), 0.1]:
        for S in [10, 5, 1]:
            term = LorentzianTerm(log_S0=np.log(S), log_Q=np.log(Q), log_omega0=np.log(w_0))
            psd = psd_models.Lorentzian(S0=S, omega0=w_0, Q=Q)
            np.testing.assert_array_almost_equal(np.asarray(psd(FREQS)), np.asarray(term.get_psd(FREQS)))


def test_sho_covariance_continuity_at_half_Q():
    """The SHO static-width masking must be seamless across Q = 1/2."""
    t = np.linspace(0, 10, 50)
    lo = SHOTerm(log_S0=0.0, log_Q=np.log(0.4999), log_omega0=0.0)
    hi = SHOTerm(log_S0=0.0, log_Q=np.log(0.5001), log_omega0=0.0)
    np.testing.assert_allclose(np.asarray(lo.covariance(t)), np.asarray(hi.covariance(t)), atol=1e-3)


def test_bendingpowerlaw_prior_constraint():
    from mind_the_gaps_tpu.kernels import BendingPowerlaw

    ok = BendingPowerlaw(log_S0=1.0, log_Q=0.0, log_omega0=-1.0, bounds=[(-5, 5)] * 3)
    bad_theta = np.array([0.0, 1.0, -1.0])  # log_S0 < log_Q
    assert float(ok.log_prior()) == 0.0
    assert float(ok.log_prior(bad_theta)) == -np.inf


def test_jitter_property():
    from mind_the_gaps_tpu.kernels import DampedRandomWalk, JitterTerm

    k = DampedRandomWalk(0.0, -1.0) + JitterTerm(log_sigma=0.5)
    np.testing.assert_allclose(float(k.jitter()), np.exp(2 * 0.5), rtol=1e-12)


def test_gaussian_mean_model_constant_param():
    """Reference mean_models.py:6-10 declares (mean, sigma, amplitude,
    constant); both the 4-param standalone form and the 3-param form
    GPModelling constructs must work."""
    import numpy as np
    from mind_the_gaps_tpu.models import GaussianModel

    t = np.linspace(0.0, 10.0, 50)
    g3 = GaussianModel(5.0, 1.0, 2.0)
    g4 = GaussianModel(5.0, 1.0, 2.0, 3.5)
    assert g3.ndim == 3 and g4.ndim == 4
    v3 = np.asarray(g3.value(t, g3.get_parameter_vector()))
    v4 = np.asarray(g4.value(t, g4.get_parameter_vector()))
    np.testing.assert_allclose(v4, v3 + 3.5, rtol=1e-12)
    g4k = GaussianModel(5.0, 1.0, 2.0, constant=3.5)
    np.testing.assert_allclose(
        np.asarray(g4k.value(t, g4k.get_parameter_vector())), v4, rtol=1e-12
    )


def test_sine_mean_models_values():
    """SineModel / TwoSineModel / 4-param GaussianModel / LensingProfile
    evaluate per the reference formulas (mean_models.py:6-38)."""
    import numpy as np
    from mind_the_gaps_tpu.models.mean_models import (
        GaussianModel,
        LensingProfile,
        SineModel,
        TwoSineModel,
    )

    t = np.linspace(0, 10, 50)
    s = SineModel(2.0, 0.5, 1.2, 0.3)
    np.testing.assert_allclose(
        np.asarray(s.value(t, s.get_parameter_vector())),
        2.0 + 0.5 * np.sin(1.2 * t + 0.3), rtol=1e-12,
    )
    ts = TwoSineModel(1.0, 0.4, 0.1, 0.2, 0.5, 0.8)
    np.testing.assert_allclose(
        np.asarray(ts.value(t, ts.get_parameter_vector())),
        1.0 + 0.4 * np.sin(0.8 * t + 0.1) + 0.2 * np.sin(1.6 * t + 0.5), rtol=1e-12,
    )
    g = GaussianModel(5.0, 1.5, 2.0, 0.7)  # 4-param form with constant
    expected = 2.0 / (2 * np.pi * 1.5) * np.exp(-((t - 5.0) ** 2) / (2 * 1.5**2)) + 0.7
    np.testing.assert_allclose(
        np.asarray(g.value(t, g.get_parameter_vector())), expected, rtol=1e-12
    )
    lp = LensingProfile(1.0, 2.0)
    assert np.all(np.isnan(np.asarray(lp.value(t, lp.get_parameter_vector()))))
