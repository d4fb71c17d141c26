"""Model namespace: covariance (kernel) terms, mean models, analytic PSDs.

Mirrors reference mind_the_gaps/models/__init__.py:1-2 exports plus the
kernels, so user code can do
``from mind_the_gaps_tpu.models import DampedRandomWalk``.
"""
from mind_the_gaps_tpu.kernels import (
    Lorentzian,
    Cosinus,
    DampedRandomWalk,
    BendingPowerlaw,
    RealTerm,
    ComplexTerm,
    SHOTerm,
    Matern32Term,
    JitterTerm,
)
from mind_the_gaps_tpu.models.mean_models import (
    LinearModel,
    GaussianModel,
    SineModel,
    TwoSineModel,
    ConstantModel,
    LensingProfile,
)
from mind_the_gaps_tpu.models import psd_models

__all__ = [
    "Lorentzian",
    "Cosinus",
    "DampedRandomWalk",
    "BendingPowerlaw",
    "RealTerm",
    "ComplexTerm",
    "SHOTerm",
    "Matern32Term",
    "JitterTerm",
    "LinearModel",
    "GaussianModel",
    "SineModel",
    "TwoSineModel",
    "ConstantModel",
    "LensingProfile",
    "psd_models",
]
