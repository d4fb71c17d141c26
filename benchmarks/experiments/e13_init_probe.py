"""Can the E13 loop converge in fewer iterations without changing its output?

Round-6 left one lever on the lognormal pipeline: the E13 iteration count
(mean ~47, lock-step chunk max ~69).  The loop is alternating projections
onto two constraint sets — A = "series with the target Fourier amplitudes"
(spectral replace, keeping phases) and B = "series whose value multiset is
the PDF draw" (rank remap, the L2 projection onto the permutation set by
the rearrangement inequality).  Two classic accelerations, untried so far:

  1. INITIALIZATION.  The production loop starts from the raw draw in its
     random order (reference simulator.py:65-131: phases come from the PDF
     draw's DFT) — i.e. from a point deep inside B with *uniform random*
     phases.  Starting instead from remap(segment) — the draws arranged in
     the TK95 segment's rank order — starts from a point of B whose phase
     structure already approximates the target spectrum.  The TK95 phases
     are themselves iid uniform and independent of the amplitudes, so the
     randomness source is statistically identical.
  2. OVER-RELAXATION.  Replace the projection step with the relaxed point
     z = x + beta*(P_A(x) - x), beta in (1, 2], before projecting onto B
     (beta=1 is the production loop; beta=2 is reflection).  Standard POCS
     acceleration.

Both variants keep the stopping rule (elementwise allclose of consecutive
B-iterates, rtol=1e-4) and the output contract (an exact permutation of
the full-precision draws).  Measured per variant, B sims:

  - per-sim iteration counts (mean / median / p90 / max) and the lock-step
    chunk-max total that sets production wall-clock at chunk=128
  - non-converged count at max_iter
  - spectral fidelity of the OUTPUT: mean relative amplitude error vs the
    target amplitudes (the stopping rule is in value space, so this is the
    honest quality metric — a faster variant must not stop "earlier" in
    spectrum space)
  - ensemble-mean output periodogram ratio vs the baseline variant
    (statistical-equivalence check; should be 1 within MC error)

MEASURED (CPU, B=128, m=8192, DRW lognormal tutorial scenario) — NEGATIVE:

  base (draw, b=1.00): iters mean 46.4 med 46 p90 59 max 64 chunkmax 64
                       nonconv 0 specrelerr 0.0088 Pratio 1.0000
  seginit      b=1.00: iters mean 44.2 med 44 p90 53 max 65 chunkmax 65
                       nonconv 0 specrelerr 0.0088 Pratio 0.9998
  draw         b=1.50: iters 400 ALL NON-CONVERGED specrelerr 10.5
  draw         b=2.00: iters 400 ALL NON-CONVERGED specrelerr 10.4
  (B=256 rerun, E13_PROBE_ONLY=seginit, 2026-08-19 — the multi-chunk
   chunkmax column and the beta>1 seginit rows:)
  seginit      b=1.00: iters mean 44.5 med 43 p90 55 max 77 chunkmax 142
                       nonconv 0 specrelerr 0.0087 Pratio 1.0000
  seginit      b=1.50: iters 400 ALL 256 NON-CONVERGED specrelerr 0.246
  seginit      b=1.75: iters 400 ALL 256 NON-CONVERGED specrelerr 0.246
  seginit      b=2.00: iters 400 ALL 256 NON-CONVERGED specrelerr 0.246

Conclusions: (1) the iteration count is set by the problem's conditioning,
not by the starting point — starting from the spectrum-consistent
remap(segment) saves only ~5% mean iterations and does NOT move the
lock-step chunk max (64 -> 65) that sets production wall-clock, so the
production draw-phase init (reference parity) stays; (2) value-space
over-relaxation of the spectral projection DIVERGES for every beta > 1
tried — the rank-remap projection is expansive enough that plain
alternating projections is already at the stable edge.  Together with the
round-6 predictability negative and the round-5 compaction bound, E13
iteration scheduling/acceleration is exhausted: the lock-step max (~p90+
of a light-tailed iteration distribution) is the floor.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from mind_the_gaps_tpu.kernels import DampedRandomWalk
from mind_the_gaps_tpu.simulator import Simulator
from mind_the_gaps_tpu.simulator.core import tk95_rates
from mind_the_gaps_tpu.stats import sample_pdf

B = 256  # > CHUNK so the lock-step chunkmax column measures multi-chunk cost
CHUNK = 128
MAX_ITER = 400
MEAN = 10.0

rng = np.random.default_rng(0)
t = np.cumsum(rng.uniform(4.0, 9.0, 500))
kernel = DampedRandomWalk(log_S0=1.0, log_omega0=-3.0)
theta0 = kernel.get_parameter_vector()
sim = Simulator(
    lambda w: np.asarray(kernel.get_psd(jnp.asarray(w), jnp.asarray(theta0))),
    t, exposures=1.0, mean=MEAN, pdf="lognormal", extension_factor=2, max_iter=MAX_ITER,
)
omega = jnp.asarray(sim.omega)
thetas = theta0[None, :] + 0.15 * rng.standard_normal((B, 2))

m_cut = sim._e13_cut_len
grid_t0 = float(sim.sim_timestamps[0]); grid_t1 = float(sim.sim_timestamps[-1])
duration = float(sim.sim_duration)
dt = float(sim.sim_dt)
n_fft_len = len(sim.sim_timestamps)
print(f"segment length m_cut={m_cut}, fine grid {n_fft_len}")


@jax.jit
def psd_batch(ths):
    def one(th):
        v = kernel.get_psd(omega[1:], th)
        return jnp.concatenate([jnp.zeros((1,), v.dtype), v])
    return jax.vmap(one)(ths)


def cut_segment(key, psd_values):
    k_fft, k_cut, k_pdf = jax.random.split(key, 3)
    rate = tk95_rates(k_fft, psd_values, n_fft_len, dt)
    rate = rate - jnp.mean(rate) + MEAN
    shift = jax.random.uniform(k_cut, (), minval=grid_t0, maxval=grid_t1 - duration, dtype=rate.dtype)
    k0 = jnp.ceil((shift - grid_t0) / dt).astype(jnp.int32)
    k0 = jnp.clip(k0, 0, n_fft_len - m_cut)
    return k_pdf, jax.lax.dynamic_slice(rate, (k0,), (m_cut,))


def e13_variant(k_pdf, seg, init: str, beta: float, rtol=1e-4, atol=1e-8):
    """e13_adjust (simulator/core.py:88) parameterized by init point and
    relaxation factor; init='draw', beta=1 reproduces production exactly."""
    m = seg.shape[-1]
    namp = m // 2 + 1
    std = jnp.std(seg)
    xsim = sample_pdf(k_pdf, "lognormal", MEAN, std, (m,))
    A = jnp.abs(jnp.fft.rfft(seg.astype(jnp.float32))) / namp
    sorted32 = (-jnp.sort(-xsim)).astype(jnp.float32)

    def remap(z):
        order = jnp.argsort(-z)
        _, xnew = jax.lax.sort_key_val(order, sorted32)
        return xnew

    def spectral(x):
        ph = jnp.angle(jnp.fft.rfft(x))
        return jnp.fft.irfft(A * jnp.exp(1j * ph), n=m)

    if init == "draw":
        x0 = xsim.astype(jnp.float32)
    elif init == "segment":
        x0 = remap(seg.astype(jnp.float32))
    else:
        raise ValueError(init)

    def step(x):
        adj = spectral(x)
        z = adj if beta == 1.0 else x + beta * (adj - x)
        return remap(z)

    x1 = step(x0)

    def cond(s):
        xp, xc, it = s
        close = jnp.all(jnp.abs(xc - xp) <= atol + rtol * jnp.abs(xp))
        return jnp.logical_and(jnp.logical_not(close), it < MAX_ITER)

    def body(s):
        _, xc, it = s
        return xc, step(xc), it + 1

    _, xf, iters = jax.lax.while_loop(cond, body, (x0, x1, 0))
    Af = jnp.abs(jnp.fft.rfft(xf)) / namp
    relerr = jnp.mean(jnp.abs(Af[1:] - A[1:]) / (A[1:] + 1e-12))
    return iters, relerr, Af


VARIANTS = [
    ("base (draw, b=1.00)", "draw", 1.0),
    ("seginit      b=1.00", "segment", 1.0),
    ("draw         b=1.50", "draw", 1.5),
    ("draw         b=2.00", "draw", 2.0),
    ("seginit      b=1.50", "segment", 1.5),
    ("seginit      b=1.75", "segment", 1.75),
    ("seginit      b=2.00", "segment", 2.0),
]
# substring filter for resuming a partial sweep (diverging variants cost
# ~18 min each at B=256 on CPU): E13_PROBE_ONLY="seginit" runs only those
_only = os.environ.get("E13_PROBE_ONLY")
if _only:
    VARIANTS = [v for v in VARIANTS if _only in v[0]]

keys = jax.random.split(jax.random.key(1), B)
psd_b = psd_batch(jnp.asarray(thetas))


def chunk_cost(iters):
    return sum(int(iters[s:s + CHUNK].max()) for s in range(0, B, CHUNK))


# parity gate: e13_variant(init='draw', beta=1) must reproduce the
# production e13_adjust exactly (same seeded iterate sequence) — guards
# this hand-parameterized copy against drift from simulator/core.py:88
from mind_the_gaps_tpu.simulator.core import e13_adjust  # noqa: E402

_k_pdf0, _seg0 = jax.jit(cut_segment)(keys[0], psd_b[0])
_out_p, _iters_p = jax.jit(
    lambda k, s: e13_adjust(k, s, "lognormal", MEAN, MAX_ITER)
)(_k_pdf0, _seg0)
_iters_v, _relerr_v, _Af_v = jax.jit(
    lambda k, s: e13_variant(k, s, "draw", 1.0)
)(_k_pdf0, _seg0)
assert int(_iters_p) == int(_iters_v), (
    "probe drifted from production e13_adjust", int(_iters_p), int(_iters_v))
_Af_p = np.abs(np.fft.rfft(np.asarray(_out_p, dtype=np.float32))) / (
    _seg0.shape[-1] // 2 + 1)
np.testing.assert_allclose(np.asarray(_Af_v), _Af_p, rtol=1e-3, atol=1e-6)
print("parity gate: variant(draw, b=1) == production e13_adjust OK", flush=True)

base_P = None
for name, init, beta in VARIANTS:
    def one(key, psd_values, init=init, beta=beta):
        k_pdf, seg = cut_segment(key, psd_values)
        return e13_variant(k_pdf, seg, init, beta)

    f = jax.jit(jax.vmap(one))
    t0 = time.time()
    iters, relerr, Af = jax.tree.map(np.asarray, f(keys, psd_b))
    wall = time.time() - t0
    P = (Af ** 2).mean(axis=0)
    if base_P is None:
        base_P = P
    ratio = np.exp(np.mean(np.log(P[1:] / base_P[1:])))
    print(
        f"{name}: iters mean {iters.mean():6.1f} med {np.median(iters):4.0f} "
        f"p90 {np.percentile(iters, 90):4.0f} max {iters.max():4.0f} "
        f"chunkmax {chunk_cost(iters):4d} nonconv {(iters >= MAX_ITER).sum():3d} "
        f"specrelerr {relerr.mean():.4f} Pratio {ratio:.4f} ({wall:.1f}s)",
        flush=True,
    )
