"""File-format loaders producing GappyLightcurve instances.

Host-side parsing (pure numpy) — these replace the reference's loader
classes (simplelightcurve.py:12, swiftlightcurve.py:10,
fermilightcurve.py:11).  Day-unit columns are converted to seconds.
"""
from __future__ import annotations

import warnings

import numpy as np

from mind_the_gaps_tpu.lightcurves.gappylightcurve import GappyLightcurve

__all__ = ["SimpleLightcurve", "SwiftLightcurve", "FermiLightcurve"]

_DAY_S = 86400.0


class SimpleLightcurve(GappyLightcurve):
    """CSV with columns: time, rate, error[, exposure[, bkg_rate, bkg_err]].

    Time columns named mjd/jd/day are interpreted as days and converted to
    seconds (reference simplelightcurve.py:38-42).
    """

    def __init__(self, input_file, skip_header: int = 0, delimiter=None):
        data = np.genfromtxt(
            input_file, names=True, skip_header=skip_header, delimiter=delimiter
        )
        names = data.dtype.names
        time = np.asarray(data[names[0]], dtype=float)
        if names[0].lower() in ["mjd", "jd", "day"]:
            time = time * _DAY_S
        y = data[names[1]]
        yerr = data[names[2]]
        if len(names) > 3:
            exposures = data[names[3]]
            if len(names) >= 6:
                bkg_rate = data[names[4]]
                bkg_err = data[names[5]]
            else:
                bkg_rate = np.zeros(len(time))
                bkg_err = np.zeros(len(time))
        else:
            warnings.warn("Lightcurve has no exposures!")
            exposures = np.zeros(len(time))
            bkg_rate = np.zeros(len(time))
            bkg_err = np.zeros(len(time))
        super().__init__(time, y, yerr, exposures, bkg_rate, bkg_err)


class SwiftLightcurve(GappyLightcurve):
    """Swift-XRT QDP products (PCCURVE.qdp), with SNR/Sigma/Cts filtering
    and correction-factor handling (reference swiftlightcurve.py:10-108)."""

    def __init__(self, swift_xrt_file="PCCURVE.qdp", minSNR=0, minSigma=0, minCts=0):
        try:
            data = self._read_pccurve(swift_xrt_file, minSNR=minSNR, minSigma=minSigma, minCts=minCts)
        except ValueError:
            data = self._read_simple_pccurve(swift_xrt_file, minSigma=minSigma)

        names = data.dtype.names
        time_column = names[0]
        rate_column = names[3]
        bkg_rate = names[7]
        bkg_rate_err = names[8]
        corr_factor_column = names[9]
        exposure_column = names[12]

        time = np.asarray(data[time_column], dtype=float)
        if time_column == "MJD":
            time = time * _DAY_S
        y = data[rate_column]
        yerr = (-data["%sneg" % rate_column] + data["%spos" % rate_column]) / 2
        corr_factor = data[corr_factor_column]
        # exposure is live-time corrected; background rescaled so that
        # bkg * (exposure / corrfactor) recovers the true bkg contribution
        exposures = data[exposure_column] / corr_factor
        super().__init__(
            time,
            y,
            yerr,
            exposures,
            data[bkg_rate] * corr_factor,
            data[bkg_rate_err] * corr_factor,
        )

    @staticmethod
    def _read_pccurve(file, minExposure=0, minSigma=0, minSNR=0, minCts=0):
        try:
            data = np.genfromtxt(
                file, names=True, delimiter="\t", skip_header=2, comments="!",
                dtype=("f8, f8, f8, f8, f8, f8, f8, f8, f8, f8, i8, f8, f8, f8, f8, U30"),
            )
        except ValueError:
            data = np.genfromtxt(
                file, names=True, delimiter="\t", skip_header=2, comments="!",
                dtype=("f8, f8, f8, f8, f8, f8, f8, f8, f8, f8, i8, f8, f8, f8, f8"),
            )
        return data[
            (data["Exposure"] > minExposure)
            & (data["SNR"] > minSNR)
            & (data["Sigma"] > minSigma)
            & (data["CtsInSrc"] >= minCts)
        ]

    @staticmethod
    def _read_simple_pccurve(file, minExposure=0, minSigma=0):
        data = np.genfromtxt(
            file, names=True, delimiter="\t", comments="!",
            dtype=("f8, f8, f8, f8, f8, f8"), deletechars="~", usecols=(0, 1, 2, 3, 4, 5),
        )
        return data[
            ((data["T_+ve"] - data["T_-ve"]) > minExposure) & (data["Sigma"] > minSigma)
        ]


class FermiLightcurve(GappyLightcurve):
    """CSV with asymmetric errors: time, rate, rate_err_neg, rate_err_pos
    (reference fermilightcurve.py:11-46); errors are averaged."""

    def __init__(self, input_file):
        data = np.genfromtxt(input_file, names=True, delimiter=",")
        names = data.dtype.names
        time_column, rate_column = names[0], names[1]
        time = np.asarray(data[time_column], dtype=float)
        if "mjd" in time_column.lower() or "day" in time_column.lower():
            time = time * _DAY_S
        y = data[rate_column]
        yerr = (
            np.abs(data["%s_err_neg" % rate_column]) + data["%s_err_pos" % rate_column]
        ) / 2
        super().__init__(time, y, yerr)
