"""Mean models for the GP.

Rebuild of reference mind_the_gaps/models/mean_models.py:6-38 plus the
celerite ConstantModel used by GPModelling._build_mean_model
(gpmodelling.py:83-96).  Functional style matching the kernel terms:
static structure (names/bounds) + pure ``value(t, theta)``.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

__all__ = [
    "MeanModel",
    "ConstantModel",
    "LinearModel",
    "GaussianModel",
    "SineModel",
    "TwoSineModel",
    "LensingProfile",
]


class MeanModel:
    parameter_names: Tuple[str, ...] = ()

    def __init__(self, *args, bounds: Optional[Sequence[Tuple]] = None, **kwargs):
        values = dict(zip(self.parameter_names, args))
        values.update(kwargs)
        missing = [n for n in self.parameter_names if n not in values]
        if missing:
            raise TypeError(f"Missing parameters {missing} for {type(self).__name__}")
        self._values = np.array([float(values[n]) for n in self.parameter_names])
        if bounds is None:
            bounds = [(None, None)] * len(self.parameter_names)
        self._bounds = [
            (-np.inf if lo is None else float(lo), np.inf if hi is None else float(hi))
            for lo, hi in bounds
        ]

    @property
    def ndim(self) -> int:
        return len(self.parameter_names)

    def get_parameter_names(self):
        return tuple(self.parameter_names)

    def get_parameter_vector(self):
        return self._values.copy()

    def set_parameter_vector(self, theta):
        self._values = np.asarray(theta, dtype=float).copy()

    def get_parameter_bounds(self):
        return list(self._bounds)

    def log_prior(self, theta=None):
        if theta is None:
            theta = jnp.asarray(self._values)
        theta = jnp.asarray(theta)
        lo = jnp.asarray([b[0] for b in self._bounds], dtype=theta.dtype)
        hi = jnp.asarray([b[1] for b in self._bounds], dtype=theta.dtype)
        return jnp.where(jnp.all((theta >= lo) & (theta <= hi)), 0.0, -jnp.inf)

    def value(self, t, theta):
        raise NotImplementedError


class ConstantModel(MeanModel):
    parameter_names = ("value",)

    def value(self, t, theta):
        return jnp.broadcast_to(theta[0], jnp.asarray(t).shape)


class LinearModel(MeanModel):
    """slope * t + intercept (reference mean_models.py:24-31)."""

    parameter_names = ("slope", "intercept")

    def value(self, t, theta):
        return theta[0] * jnp.asarray(t) + theta[1]


class GaussianModel(MeanModel):
    """Gaussian bump + constant (reference mean_models.py:6-10).

    The reference declares 4 parameters (mean, sigma, amplitude,
    constant) but its GPModelling only ever constructs the 3-parameter
    form (reference gpmodelling.py:114-122 passes no constant, which
    celerite would reject).  Both forms work here: pass a 4th value (or
    ``constant=``) to fit the offset; omit it for the 3-parameter model
    with the offset fixed at 0."""

    parameter_names = ("mean", "sigma", "amplitude", "constant")

    def __init__(self, *args, bounds: Optional[Sequence[Tuple]] = None, **kwargs):
        if len(args) < 4 and "constant" not in kwargs:
            # 3-parameter form: the constant is not a free parameter
            self.parameter_names = ("mean", "sigma", "amplitude")
        super().__init__(*args, bounds=bounds, **kwargs)

    def value(self, t, theta):
        mean, sigma, amplitude = theta[0], theta[1], theta[2]
        constant = theta[3] if len(self.parameter_names) == 4 else 0.0
        t = jnp.asarray(t)
        return (
            amplitude / (2 * jnp.pi * sigma) * jnp.exp(-((t - mean) ** 2) / (2 * sigma**2))
            + constant
        )


class SineModel(MeanModel):
    parameter_names = ("constant", "amplitude", "frequency", "phase")

    def value(self, t, theta):
        return theta[0] + theta[1] * jnp.sin(theta[2] * jnp.asarray(t) + theta[3])


class TwoSineModel(MeanModel):
    parameter_names = ("constant", "amplitude0", "phase0", "amplitude1", "phase1", "frequency")

    def value(self, t, theta):
        t = jnp.asarray(t)
        c, a0, p0, a1, p1, f = (theta[i] for i in range(6))
        return c + a0 * jnp.sin(f * t + p0) + a1 * jnp.sin(2 * f * t + p1)


class LensingProfile(MeanModel):
    """Microlensing magnification profile placeholder (the reference ships
    this as an unimplemented stub returning NaN, mean_models.py:34-38)."""

    parameter_names = ("lense_mass", "stellar_mass")

    def value(self, t, theta):
        return jnp.full(jnp.asarray(t).shape, jnp.nan)
