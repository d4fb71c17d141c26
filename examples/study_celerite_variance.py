"""The celerite normalization (variance) contract — script port of the
reference's docs/notebooks/celerite_variance.ipynb.

The convention (reference simulator.py:389, psd_models.py:79-85): when a
celerite PSD is integrated over positive ordinary frequencies, the
lightcurve variance is

    var = sum(PSD(omega)) * df * 2*pi * (2 / sqrt(2*pi))

where the 2/sqrt(2*pi) accounts for the one-sided integration and the
1/sqrt(2*pi) of the Fourier-transform convention, and the 2*pi converts
the angular-frequency density.  For a DampedRandomWalk / BendingPowerlaw
kernel the exact variance is k(0) = S0, so the script asserts

  1. the frequency integral of the analytic PSD reproduces S0, and
  2. an ensemble of simulated lightcurves has that same variance,

which is precisely what the reference notebook demonstrates with a
celerite MCMC fit (here the ensemble check is direct and 1000x faster).

Run:  python examples/study_celerite_variance.py     (~30 s on CPU)
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from mind_the_gaps_tpu.models.psd_models import BendingPowerlaw
from mind_the_gaps_tpu.simulator import Simulator

NORMALIZATION_FACTOR = 2.0 / np.sqrt(2.0 * np.pi)


def main():
    n_points = 2000
    times = np.linspace(0.0, 2000.0, n_points)
    exposures = 0.5 * np.ones(n_points)
    duration = times[-1] + 1.5 * exposures[-1] - (times[0] - exposures[0])
    sim_dt = np.min(exposures) / 2

    S0 = 1.0
    break_timescale = 100.0
    w0 = 2 * np.pi / break_timescale
    psd_model = BendingPowerlaw(S0=S0, omega0=w0)

    # 1. integrate the PSD over the observable band (reference nb cell 4)
    extension_factor = 1.0
    df = 1.0 / (duration * extension_factor)
    int_freq = np.arange(1.0 / duration, 1.0 / sim_dt, df)
    w_int = int_freq * 2 * np.pi
    var_integral = float(np.sum(np.asarray(psd_model(w_int))) * df * 2 * np.pi * NORMALIZATION_FACTOR)
    print(f"PSD integral variance: {var_integral:.4f}  (kernel k(0) = S0 = {S0})")
    assert abs(var_integral / S0 - 1.0) < 0.05, "PSD integral must reproduce k(0)=S0"

    # 2. ensemble variance of simulated lightcurves matches the integral
    simulator = Simulator(psd_model, times, exposures, mean=0.0, pdf="Gaussian",
                          extension_factor=extension_factor, random_state=45)
    n_sims = 256
    psd_values = np.asarray(simulator._psd_values())
    psd_batch = jnp.asarray(np.broadcast_to(psd_values, (n_sims, len(psd_values))).copy())
    rates = np.asarray(simulator.simulate_batch(jax.random.key(45), psd_batch))
    ens_var = float(np.mean(np.var(rates, axis=1)))
    print(f"ensemble variance of {n_sims} simulated lightcurves: {ens_var:.4f}")
    assert abs(ens_var / var_integral - 1.0) < 0.15, (
        "simulated variance must match the PSD integral (the sqrt(2*pi) "
        "normalization of simulator.tk95_rates)"
    )
    print("OK: variance = sum(PSD) * df * 2*pi * 2/sqrt(2*pi) = k(0) holds end to end")


if __name__ == "__main__":
    main()
