"""E13 cut length: power-of-two vs 5-smooth (round 4, follow-up to
e13_periter_probe).

The per-iteration split at the production segment showed the remap sorts
at 26.1 of 31 ms/iter (84%) — and sorts scale with the CUT LENGTH, which
the pow2 fast path rounds UP (the production LRT's ~50k segment pads to
65536, +30% sort work every iteration).  The pow2 cut's original win
(72 -> 227 lcs/s, round 2) was over the RAW segment length (6586 =
2 x 37 x 89 — a Bluestein FFT); a 5-smooth cut keeps the FFT on the
cheap mixed-radix path (the TK95 fine grid itself is already 5-smooth
for exactly this reason, simulator/core.py:300-311) while shrinking
every sort to the minimum.

Measured per scenario: raw segment length, the 5-smooth and pow2 cuts,
and the pipeline rate with each (chunk fixed at the measured-best for
the scale).

MEASURED: see the printed table (recorded in CLAUDE.md round-4 notes).
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

from scipy.fft import next_fast_len

from benchmarks.experiments.e13_periter_probe import (
    B,
    build_scenario,
    make_pipeline,
    time_pipeline,
)

import jax


def main():
    for n_points, label, chunk in ((500, "tutorial", 512), (5000, "production", 128)):
        sim, psd_b = build_scenario(n_points)
        seg_len = sim._segment_len
        n_fft = len(sim.sim_timestamps)
        p2 = 1 << (seg_len - 1).bit_length()
        smooth = next_fast_len(seg_len, real=True)
        print(
            f"\n=== {label}: n={n_points}, segment {seg_len}, fine grid {n_fft}, "
            f"pow2 {p2}, 5-smooth {smooth} ===",
            flush=True,
        )
        for m_cut, tag in ((p2, "pow2  "), (smooth, "smooth"), (seg_len, "raw   ")):
            if m_cut > n_fft:
                print(f"  {tag} m={m_cut}: skipped (exceeds fine grid)")
                continue
            pipe = make_pipeline(sim, "angle", chunk, m_cut=m_cut)
            wall, iters = time_pipeline(pipe, psd_b, seed0=23)
            print(
                f"  {tag} m={m_cut:6d} chunk={chunk}: {B / wall:6.1f} lcs/s "
                f"({wall:6.2f} s)  iters mean {iters.mean():5.1f} max {iters.max():3d}",
                flush=True,
            )


if __name__ == "__main__":
    main()
