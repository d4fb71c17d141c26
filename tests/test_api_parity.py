"""Public-API parity lock: every public name the reference package
defines must exist at the corresponding import path here.

The name lists are the reference's public defs (ast-extracted from
/root/reference/mind_the_gaps at snapshot 2025-07-04; SURVEY.md §2) —
hardcoded so this test guards against regressions without needing the
reference mounted.
"""
import importlib

import pytest

REFERENCE_API = {
    "mind_the_gaps_tpu.fitting": [
        "chose_ls_model", "chose_frequency_range", "brokenpl", "linear_fit_break",
        "linear_fit", "s_statistic", "s_stat_powerlaw", "minimize_powerlaw",
        "fit_lomb_scargle", "fit_psd_powerlaw",
    ],
    "mind_the_gaps_tpu.gpmodelling": ["GPModelling"],
    "mind_the_gaps_tpu.noise_models": ["BaseNoise", "PoissonNoise", "KraftNoise", "GaussianNoise"],
    "mind_the_gaps_tpu.readingutils": [
        "read_data", "read_data2", "read_zero_point", "readPCCURVE", "readPCUL",
        "readsimplePCCURVE", "readPCHR", "readPC_catalog", "read_best_fit",
        "read_standard_lightcurve",
    ],
    "mind_the_gaps_tpu.simulator": [
        "BaseSimulatorMethod", "TK95Simulator", "E13Simulator", "Simulator",
        "add_poisson_noise", "get_fft", "get_segment", "cut_random_segment",
    ],
    "mind_the_gaps_tpu.stats": [
        "kraft_pdf", "lognormal", "fit_N", "chi_cov", "chi_log_likehood",
        "chi_log_likehood_nonyq", "chi_square", "chi_square_N", "create_log_normal",
        "create_uniform_distribution", "neg_log_like", "bic", "aic", "aicc",
    ],
    "mind_the_gaps_tpu.utils": [
        "phase_fold", "fit_sines", "detrend", "psd_ar1", "mudelsee_residuals",
        "mudelsee_fit", "mudelsee_least_squares", "simulate_ar1",
    ],
    "mind_the_gaps_tpu.models.celerite_models": [
        "Lorentzian", "Cosinus", "DampedRandomWalk", "BendingPowerlaw",
    ],
    "mind_the_gaps_tpu.models.mean_models": [
        "GaussianModel", "SineModel", "TwoSineModel", "LinearModel", "LensingProfile",
    ],
    "mind_the_gaps_tpu.models.psd_models": [
        "SHO", "Lorentzian", "BendingPowerlaw", "Matern", "Matern32", "Matern52", "Jitter",
    ],
    "mind_the_gaps_tpu.lightcurves": [
        "FermiLightcurve", "ExposureTimeError", "GappyLightcurve",
        "SimpleLightcurve", "SwiftLightcurve",
    ],
}

# reference class methods (public) that must exist on ours
REFERENCE_METHODS = {
    ("mind_the_gaps_tpu.gpmodelling", "GPModelling"): [
        "fit", "derive_posteriors", "spread_walkers", "standarized_residuals",
        "get_rstat", "generate_from_posteriors", "loglikelihoods", "autocorr",
        "sampler", "mcmc_samples", "max_loglikelihood", "max_parameters",
        "median_parameters", "parameter_names", "k", "tau",
    ],
    ("mind_the_gaps_tpu.lightcurves", "GappyLightcurve"): [
        "times", "n", "y", "dy", "exposures", "bkg_rate", "bkg_rate_err",
        "duration", "mean", "truncate", "split", "rand_remove", "to_csv",
        "get_simulator",
    ],
    ("mind_the_gaps_tpu.simulator", "Simulator"): [
        "psd_model", "set_psd_params", "add_noise", "downsample",
        "simulate_regularly_sampled", "generate_lightcurve",
    ],
}


@pytest.mark.parametrize("module,names", sorted(REFERENCE_API.items()))
def test_reference_names_exist(module, names):
    mod = importlib.import_module(module)
    missing = [n for n in names if not hasattr(mod, n)]
    assert not missing, f"{module} missing reference names: {missing}"


@pytest.mark.parametrize("target,members", sorted(REFERENCE_METHODS.items()))
def test_reference_class_members_exist(target, members):
    module, cls_name = target
    cls = getattr(importlib.import_module(module), cls_name)
    missing = [m for m in members if not hasattr(cls, m)]
    assert not missing, f"{cls_name} missing reference members: {missing}"
