"""Celerite-style covariance kernels (terms) in pure JAX.

Functional re-design of the covariance models of the reference package
(`mind_the_gaps/models/celerite_models.py` and the celerite built-ins used
by its notebooks/tests): a term is a *static* description (names, widths,
bounds) while every numerical quantity — coefficients, PSD, covariance,
prior — is a pure function of a flat parameter vector ``theta`` that can be
jit/vmap/grad-ed.
"""
from mind_the_gaps_tpu.kernels.terms import (
    Term,
    TermSum,
    RealTerm,
    ComplexTerm,
    SHOTerm,
    Matern32Term,
    JitterTerm,
    Lorentzian,
    Cosinus,
    DampedRandomWalk,
    BendingPowerlaw,
    Coefficients,
)

__all__ = [
    "Term",
    "TermSum",
    "RealTerm",
    "ComplexTerm",
    "SHOTerm",
    "Matern32Term",
    "JitterTerm",
    "Lorentzian",
    "Cosinus",
    "DampedRandomWalk",
    "BendingPowerlaw",
    "Coefficients",
]
