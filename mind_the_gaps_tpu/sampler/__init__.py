"""Vectorized MCMC machinery.

Replaces the reference's emcee + multiprocessing.Pool
(gpmodelling.py:245-267) with a pure-JAX affine-invariant ensemble
sampler: all walkers — and, via vmap, all bootstrap lightcurves — advance
as one batched kernel per step, with on-device integrated
autocorrelation times.
"""
from mind_the_gaps_tpu.sampler.ensemble import (
    run_ensemble,
    sample_ensemble,
    sample_ensemble_impl,
    max_loglike_ensemble_impl,
)
from mind_the_gaps_tpu.sampler.autocorr import integrated_autocorr_time

__all__ = [
    "run_ensemble",
    "sample_ensemble",
    "sample_ensemble_impl",
    "max_loglike_ensemble_impl",
    "integrated_autocorr_time",
]
