"""Immutable container for irregularly-sampled lightcurves.

API-parity rebuild of reference mind_the_gaps/lightcurves/gappylightcurve.py:20
(fields, properties, truncate/split/rand_remove/to_csv/get_simulator and the
exposure-spacing validation at :61-64), holding host numpy arrays; the
compute layers (solver/simulator/sampler) pull JAX arrays from it once and
stay on device.
"""
from __future__ import annotations

from typing import List, Optional, Union

import numpy as np

__all__ = ["GappyLightcurve", "ExposureTimeError"]


class ExposureTimeError(Exception):
    pass


class GappyLightcurve:
    """An irregularly-sampled lightcurve: times, rates, uncertainties,
    exposures and background rates."""

    def __init__(
        self,
        times,
        y,
        dy: Optional[np.ndarray] = None,
        exposures: Union[float, np.ndarray, None] = None,
        bkg_rate: Optional[np.ndarray] = None,
        bkg_rate_err: Optional[np.ndarray] = None,
    ):
        self._times = np.asarray(times, dtype=float)
        self._y = np.asarray(y, dtype=float)
        self._dy = None if dy is None else np.asarray(dy, dtype=float)

        n = len(self._times)
        if exposures is not None:
            if np.isscalar(exposures):
                self._exposures = np.full(n, float(exposures))
            else:
                self._exposures = np.asarray(exposures, dtype=float)
            # timestamps must be spaced at least half an exposure apart
            # (reference gappylightcurve.py:61-64, epsilon = 1.01)
            epsilon = 1.01
            wrong = np.count_nonzero(
                np.diff(self._times) < self._exposures[:-1] * epsilon / 2
            )
            if wrong > 0:
                raise ExposureTimeError(
                    "Some timestamps (%d) have a spacing below the exposure sampling time!"
                    % wrong
                )
        else:
            self._exposures = np.zeros(n)

        self._bkg_rate = (
            np.asarray(bkg_rate, dtype=float) if bkg_rate is not None else np.zeros(n)
        )
        self._bkg_rate_err = (
            np.asarray(bkg_rate_err, dtype=float)
            if bkg_rate_err is not None
            else np.zeros(n)
        )

    # ------------------------------------------------------------------ #
    @property
    def times(self) -> np.ndarray:
        return self._times

    @property
    def n(self) -> int:
        return len(self._times)

    @property
    def y(self) -> np.ndarray:
        return self._y

    @property
    def dy(self) -> Optional[np.ndarray]:
        return self._dy

    @property
    def exposures(self) -> np.ndarray:
        return self._exposures

    @property
    def bkg_rate(self) -> np.ndarray:
        return self._bkg_rate

    @property
    def bkg_rate_err(self) -> np.ndarray:
        return self._bkg_rate_err

    @property
    def duration(self) -> float:
        return float(self._times[-1] - self._times[0])

    @property
    def mean(self) -> float:
        return float(np.mean(self._y))

    # ------------------------------------------------------------------ #
    def truncate(self, tmin: float = -np.inf, tmax: float = np.inf) -> "GappyLightcurve":
        """New lightcurve restricted to tmin <= t <= tmax."""
        if tmin >= tmax:
            raise ValueError(
                "Minimum truncation time (%.2es) is greater than or equal to maximum truncation time (%.3es)!"
                % (tmin, tmax)
            )
        if tmax < self._times[0]:
            raise ValueError(
                "Maximum truncation time (%.2f) is lower than initial lightcurve time (%.2f)"
                % (tmax, self._times[0])
            )
        mask = (self._times >= tmin) & (self._times <= tmax)
        return self._masked(mask)

    def _masked(self, mask: np.ndarray) -> "GappyLightcurve":
        return GappyLightcurve(
            self._times[mask],
            self._y[mask],
            None if self._dy is None else self._dy[mask],
            self._exposures[mask],
            self._bkg_rate[mask],
            self._bkg_rate_err[mask],
        )

    def split(self, interval: float) -> List["GappyLightcurve"]:
        """Split wherever consecutive samples are further apart than
        ``interval`` (reference gappylightcurve.py:209-235)."""
        lightcurves = []
        indexes = np.where(np.diff(self._times) > interval)[0]
        indexes = np.append(indexes, -1)
        j = 0
        for i in indexes:
            lightcurves.append(self.truncate(self._times[j], self._times[i]))
            j = i + 1
        return lightcurves

    def rand_remove(self, points_remove: int, rng=None) -> "GappyLightcurve":
        """Randomly drop ``points_remove`` samples."""
        if points_remove > self.n:
            raise ValueError(
                "Number of points to remove (%d) is greater than number of lightcurve datapoints (%d)"
                % (points_remove, self.n)
            )
        rng = np.random.default_rng() if rng is None else rng
        ints = rng.choice(self.n, size=points_remove, replace=False)
        mask = np.ones(self.n, dtype=bool)
        mask[ints] = False
        return self._masked(mask)

    def to_csv(self, outname: str) -> None:
        """Serialize in the reference's column layout
        (gappylightcurve.py:256-262)."""
        dy = self._dy if self._dy is not None else np.zeros(self.n)
        outputs = np.array(
            [self._times, self._y, dy, self._exposures, self._bkg_rate, self._bkg_rate_err]
        )
        np.savetxt(
            outname,
            outputs.T,
            fmt="%.8e\t%.5f\t%.5f\t%.3f\t%.5f\t%.5f",
            header="t\trate\terror\texposure\tbkg_rate\tbkg_rate_err",
        )

    def get_simulator(self, psd_model, pdf: str = "gaussian", **kwargs):
        """Build a Simulator matching this lightcurve's observing window
        (reference gappylightcurve.py:265-290)."""
        from mind_the_gaps_tpu.simulator import Simulator

        return Simulator(
            psd_model,
            self._times,
            self._exposures,
            self.mean,
            pdf,
            self._bkg_rate,
            self._bkg_rate_err,
            **kwargs,
        )
