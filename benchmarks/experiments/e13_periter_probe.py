"""E13 PER-ITERATION cost levers (round-4 judge item #1).

Iteration-COUNT levers are exhausted (compaction r5, ordering r6,
init/over-relaxation r7 — all measured negative).  This probe targets the
cost of one lock-step iteration and the chunk width:

  1. NO-ANGLE spectral step.  The production step (simulator/core.py:110)
     computes ``phases = angle(rfft(x)); adj = irfft(A * exp(1j*phases))``
     — an atan2 plus a sincos per frequency.  The identical projection is
     ``adj = irfft(F * (A / |F|))`` (guarded at |F|=0 where angle's
     convention gives exp(0)=1): one sqrt and one divide, no
     transcendentals, and the same unit-modulus rescale up to rounding.
  2. CHUNK WIDTH.  The 128-row lock-step chunk guard dates from f64-sort
     TPU-worker crashes; the loop has been f32 end to end since round 5.
     Wider chunks amortize dispatch but pay a higher lock-step max
     (max of 512 iters >= max of 128); at large m the sorts already
     saturate the chip so the waste should dominate.

Measured at the tutorial segment (m_cut=8192, n=500 points) and the
production lognormal-LRT segment (m_cut=65536, n=5000 points — the
regime that makes the lognormal 10k LRT 271.5 s vs ~100 s Gaussian).
B=512 lightcurves per measurement = one production generation dispatch
(GEN_CHUNK).  Timing per the runtime rules: fresh key per rep, one
device-side reduce, single float() fetch, first timed loop discarded.

MEASURED (v5e single chip, 2026-08-19, B=512, DRW lognormal scenarios;
lcs/s, within one process — cross-process varies +-2-3x):

  m_cut=8192  (tutorial, n=500):
    angle   chunk=128: 687.8  chunk=256: 725.3  chunk=512: 741.2
    noangle chunk=128: 732.8  chunk=256: 714.3  chunk=512: 737.6
    split: spectral(angle) 1.7 ms/iter, (noangle) 1.6, remap sorts 3.1
  m_cut=65536 (production, n=5000):
    angle   chunk=128: 207.9  chunk=256: 191.0  chunk=512: 186.0
    noangle chunk=128: 204.6  chunk=256: 191.4  chunk=512: 186.4
    split: spectral(angle) 5.0 ms/iter, (noangle) 4.9, remap sorts 26.1

CONCLUSIONS (chunk policy applied in simulator/core.py):
  - NO-ANGLE is a WASH everywhere (the spectral step is FFT-bound:
    atan2+sincos are <5% of it).  The production step keeps the angle
    form (reference-parity expression, simulator.py:94-121).
  - CHUNK: 512 wins at small m (+8% at 8k: dispatch-bound), 128 wins at
    large m (-11% for 512 at 65k: the sorts saturate the chip and the
    lock-step max only adds waste).  Adopted: chunk=None ->
    Simulator._e13_chunk_default picks ~4M resident elements, clamped
    to [128, 512].
  - The REMAP SORTS are 84% of the production per-iteration cost
    (26.1 of 31 ms at m=65536) — the 8k "sorts are ~60%" split
    understates it at scale.  With XLA's sort measured near-optimal
    (round-4 Pallas bitonic: 1.1x) and the iteration count closed
    (rounds 5-7), the per-iteration floor is the sort.
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import jax
import jax.numpy as jnp

from mind_the_gaps_tpu.kernels import DampedRandomWalk
from mind_the_gaps_tpu.simulator import Simulator
from mind_the_gaps_tpu.simulator.core import tk95_rates
from mind_the_gaps_tpu.stats import sample_pdf

B = 512
MAX_ITER = 400
MEAN = 10.0
REPS = 2


def build_scenario(n_points):
    rng = np.random.default_rng(0)
    t = np.cumsum(rng.uniform(4.0, 9.0, n_points))
    kernel = DampedRandomWalk(log_S0=1.0, log_omega0=-3.0)
    theta0 = kernel.get_parameter_vector()
    sim = Simulator(
        lambda w: np.asarray(kernel.get_psd(jnp.asarray(w), jnp.asarray(theta0))),
        t, exposures=1.0, mean=MEAN, pdf="lognormal", extension_factor=2,
        max_iter=MAX_ITER,
    )
    omega = jnp.asarray(sim.omega)
    thetas = theta0[None, :] + 0.15 * rng.standard_normal((B, 2))

    @jax.jit
    def psd_batch(ths):
        def one(th):
            v = kernel.get_psd(omega[1:], th)
            return jnp.concatenate([jnp.zeros((1,), v.dtype), v])
        return jax.vmap(one)(ths)

    return sim, psd_batch(jnp.asarray(thetas))


def make_pipeline(sim, spectral_form: str, chunk: int, m_cut: int | None = None):
    """Generation pipeline parameterized by the spectral-step form and the
    lock-step chunk width; spectral_form='angle' at chunk=128 reproduces
    production (simulator/core.py:88-139 e13_adjust + simulate_batch).
    ``m_cut`` overrides the cut length (must be >= the segment length and
    <= the fine grid)."""
    m_cut = sim._e13_cut_len if m_cut is None else m_cut
    grid_t0 = float(sim.sim_timestamps[0])
    grid_t1 = float(sim.sim_timestamps[-1])
    duration = float(sim.sim_duration)
    dt = float(sim.sim_dt)
    n_fft = len(sim.sim_timestamps)
    namp = m_cut // 2 + 1

    def cut_segment(key, psd_values):
        k_fft, k_cut, k_pdf = jax.random.split(key, 3)
        rate = tk95_rates(k_fft, psd_values, n_fft, dt)
        rate = rate - jnp.mean(rate) + MEAN
        shift = jax.random.uniform(
            k_cut, (), minval=grid_t0, maxval=grid_t1 - duration, dtype=rate.dtype
        )
        k0 = jnp.ceil((shift - grid_t0) / dt).astype(jnp.int32)
        k0 = jnp.clip(k0, 0, n_fft - m_cut)
        return k_pdf, jax.lax.dynamic_slice(rate, (k0,), (m_cut,))

    def e13(k_pdf, seg):
        std = jnp.std(seg)
        xsim = sample_pdf(k_pdf, "lognormal", MEAN, std, (m_cut,))
        A = jnp.abs(jnp.fft.rfft(seg.astype(jnp.float32))) / namp
        sorted32 = (-jnp.sort(-xsim)).astype(jnp.float32)

        def spectral(x):
            F = jnp.fft.rfft(x)
            if spectral_form == "angle":
                return jnp.fft.irfft(A * jnp.exp(1j * jnp.angle(F)), n=m_cut)
            a = jnp.abs(F)
            scale = jnp.where(a > 0, A / jnp.where(a > 0, a, 1.0), A)
            return jnp.fft.irfft(F * scale, n=m_cut)

        def step(x):
            order = jnp.argsort(-spectral(x))
            _, xnew = jax.lax.sort_key_val(order, sorted32)
            return xnew

        x0 = xsim.astype(jnp.float32)
        x1 = step(x0)

        def cond(s):
            xp, xc, it = s
            close = jnp.all(jnp.abs(xc - xp) <= 1e-8 + 1e-4 * jnp.abs(xp))
            return jnp.logical_and(jnp.logical_not(close), it < MAX_ITER)

        def body(s):
            _, xc, it = s
            return xc, step(xc), it + 1

        _, xf, iters = jax.lax.while_loop(cond, body, (x0, x1, 0))
        return xf, iters

    def one(key, psd_values):
        k_pdf, seg = cut_segment(key, psd_values)
        return e13(k_pdf, seg)

    vone = jax.vmap(one)

    @jax.jit
    def pipeline(keys, psd_b):
        outs, its = [], []
        for s in range(0, B, chunk):
            o, it = vone(keys[s:s + chunk], psd_b[s:s + chunk])
            outs.append(o)
            its.append(it)
        return (
            sum(jnp.sum(o) for o in outs),
            jnp.concatenate(its),
        )

    return pipeline


def time_pipeline(pipeline, psd_b, seed0):
    acc_iters = None
    elapsed = None
    for rep in range(REPS + 1):  # rep 0 = compile+session warmup, discarded
        keys = jax.random.split(jax.random.key(seed0 + rep), B)
        start = time.perf_counter()
        acc, iters = pipeline(keys, psd_b)
        float(acc)
        wall = time.perf_counter() - start
        if rep > 0:
            elapsed = wall if elapsed is None else min(elapsed, wall)
            acc_iters = np.asarray(iters)
    return elapsed, acc_iters


def split_probe(sim, psd_b, n_iters=40, chunk=128):
    """Fixed-iteration loops isolating the spectral step vs the remap
    sorts at this scenario's segment length."""
    m_cut = sim._e13_cut_len
    namp = m_cut // 2 + 1
    results = {}

    def run(tag, step_builder):
        def one(key, psd_values):
            k1, k2 = jax.random.split(key)
            seg = tk95_rates(k1, psd_values, len(sim.sim_timestamps), float(sim.sim_dt))[:m_cut]
            seg = seg - jnp.mean(seg) + MEAN
            x0 = sample_pdf(k2, "lognormal", MEAN, jnp.std(seg), (m_cut,)).astype(jnp.float32)
            A = jnp.abs(jnp.fft.rfft(seg.astype(jnp.float32))) / namp
            sorted32 = -jnp.sort(-x0)
            step = step_builder(A, sorted32)
            x = jax.lax.fori_loop(0, n_iters, lambda i, x: step(x), x0)
            return jnp.sum(x)

        vone = jax.vmap(one)

        @jax.jit
        def prog(keys, psd):
            return sum(jnp.sum(vone(keys[s:s + chunk], psd[s:s + chunk]))
                       for s in range(0, chunk, chunk))

        best = None
        for rep in range(3):
            keys = jax.random.split(jax.random.key(100 + rep), chunk)
            start = time.perf_counter()
            float(prog(keys, psd_b[:chunk]))
            wall = time.perf_counter() - start
            if rep > 0:
                best = wall if best is None else min(best, wall)
        results[tag] = best / n_iters
        print(f"    {tag}: {best / n_iters * 1e3:7.1f} ms/iter (chunk={chunk})", flush=True)

    run("spectral(angle)", lambda A, s: (
        lambda x: jnp.fft.irfft(A * jnp.exp(1j * jnp.angle(jnp.fft.rfft(x))), n=m_cut)))
    run("spectral(noangle)", lambda A, s: (
        lambda x: (lambda F: jnp.fft.irfft(
            F * jnp.where(jnp.abs(F) > 0, A / jnp.where(jnp.abs(F) > 0, jnp.abs(F), 1.0), A),
            n=m_cut))(jnp.fft.rfft(x))))
    run("remap sorts", lambda A, s: (
        lambda x: jax.lax.sort_key_val(jnp.argsort(-x), s)[1] * (1.0 + 1e-7)))
    return results


def main():
    for n_points, label in ((500, "tutorial"), (5000, "production")):
        sim, psd_b = build_scenario(n_points)
        print(f"\n=== {label}: n={n_points}, m_cut={sim._e13_cut_len}, "
              f"fine grid {len(sim.sim_timestamps)} ===", flush=True)
        for form in ("angle", "noangle"):
            for chunk in (128, 256, 512):
                pipe = make_pipeline(sim, form, chunk)
                wall, iters = time_pipeline(pipe, psd_b, seed0=17)
                cm = sum(int(iters[s:s + chunk].max()) for s in range(0, B, chunk))
                print(
                    f"  {form:7s} chunk={chunk:3d}: {B / wall:6.1f} lcs/s "
                    f"({wall:6.2f} s)  iters mean {iters.mean():5.1f} "
                    f"max {iters.max():3d} lockstep-sum {cm}",
                    flush=True,
                )
        print("  per-iteration split:", flush=True)
        split_probe(sim, psd_b)


if __name__ == "__main__":
    main()
