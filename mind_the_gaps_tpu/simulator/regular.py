"""Minimal regular-grid lightcurve container.

Replaces the reference's internal use of ``stingray.Lightcurve``
(simulator.py:17,391-393,412-416): the simulator only needs a regular
time grid with countrate, truncate-by-time, and shift — plain index
arithmetic over arrays.
"""
from __future__ import annotations

import numpy as np

__all__ = ["RegularLightcurve"]


class RegularLightcurve:
    """Regularly-sampled lightcurve: ``time`` are bin centers with spacing
    ``dt``; ``countrate`` has the same length."""

    def __init__(self, time, countrate, dt=None):
        self.time = np.asarray(time, dtype=float)
        self.countrate = np.asarray(countrate, dtype=float)
        if dt is None:
            dt = float(np.median(np.diff(self.time)))
        self.dt = float(dt)

    @property
    def n(self) -> int:
        return len(self.time)

    @property
    def meanrate(self) -> float:
        return float(np.mean(self.countrate))

    @property
    def tstart(self) -> float:
        return float(self.time[0] - self.dt / 2)

    @property
    def tseg(self) -> float:
        """Total duration covered by the bins (stingray convention)."""
        return float(self.time[-1] + self.dt / 2) - self.tstart

    def truncate(self, start: float, stop: float, method: str = "time") -> "RegularLightcurve":
        """Keep samples with start <= time < stop (stingray's time-method
        truncation semantics used at reference simulator.py:533,539)."""
        if method != "time":
            raise ValueError("only method='time' is supported")
        mask = (self.time >= start) & (self.time < stop)
        return RegularLightcurve(self.time[mask], self.countrate[mask], dt=self.dt)

    def shift(self, time_shift: float) -> "RegularLightcurve":
        return RegularLightcurve(self.time + time_shift, self.countrate, dt=self.dt)
