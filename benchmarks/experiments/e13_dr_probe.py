"""Can Douglas-Rachford splitting converge the E13 iteration faster?

Round-7 closed plain-relaxation levers: over-relaxed POCS (z = x +
beta*(P_A(x) - x), beta > 1) DIVERGES outright, and a spectrum-consistent
init saves ~5%.  One classical scheme remains untried: DOUGLAS-RACHFORD
splitting, which often beats alternating projections on nonconvex
feasibility problems (phase retrieval uses exactly this A="prescribed
Fourier amplitudes" set):

    y_{k+1} = y_k + P_B(2 P_A(y_k) - y_k) - P_A(y_k)

with the B-iterate x_k = P_B(2 P_A(y_k) - y_k) as the output candidate
(always an exact permutation of the draws — the output contract holds).
A relaxed variant damps the update by lambda: y + lam*(P_B(2P_A(y)-y) -
P_A(y)).  The stopping rule matches production (elementwise allclose of
consecutive B-iterates, rtol 1e-4), and quality is checked the same way
as the round-7 probe: mean relative amplitude error of the OUTPUT
spectrum vs the target, and the ensemble-mean output periodogram ratio
vs the baseline (must be 1 within MC error).

MEASURED: see the printed table (recorded here and in CLAUDE.md once run).
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

B = 128
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
print(f"segment length m_cut={m_cut}, fine grid {n_fft_len}", flush=True)


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


def e13_scheme(k_pdf, seg, scheme: str, lam: float = 1.0, rtol=1e-4, atol=1e-8):
    """scheme='ap' reproduces production e13_adjust (simulator/core.py:88);
    scheme='dr' is (relaxed) Douglas-Rachford on the same two sets."""
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

    x0 = xsim.astype(jnp.float32)

    if scheme == "ap":
        init = (x0, remap(spectral(x0)))

        def advance(s):
            _, xc = s
            return xc, remap(spectral(xc))
    elif scheme == "dr":
        def b_iterate(y):
            return remap(2.0 * spectral(y) - y)

        def advance(s):
            _, xc, y = s
            pa = spectral(y)
            pb = remap(2.0 * pa - y)
            ynew = y + lam * (pb - pa)
            return xc, b_iterate(ynew), ynew
        init = (x0, b_iterate(x0), x0)
    else:
        raise ValueError(scheme)

    def cond2(state):
        s, it = state
        xp, xc = s[0], s[1]
        close = jnp.all(jnp.abs(xc - xp) <= atol + rtol * jnp.abs(xp))
        return jnp.logical_and(jnp.logical_not(close), it < MAX_ITER)

    def body2(state):
        s, it = state
        return advance(s), it + 1

    (sfin, iters) = jax.lax.while_loop(cond2, body2, (init, 0))
    xf = sfin[1]
    Af = jnp.abs(jnp.fft.rfft(xf)) / namp
    relerr = jnp.mean(jnp.abs(Af[1:] - A[1:]) / (A[1:] + 1e-12))
    return iters, relerr, Af


VARIANTS = [
    ("base AP      ", "ap", 1.0),
    ("DR   lam=1.0 ", "dr", 1.0),
    ("DR   lam=0.5 ", "dr", 0.5),
    ("DR   lam=0.25", "dr", 0.25),
]

keys = jax.random.split(jax.random.key(1), B)
psd_b = psd_batch(jnp.asarray(thetas))

base_P = None
for name, scheme, lam in VARIANTS:
    def one(key, psd_values, scheme=scheme, lam=lam):
        k_pdf, seg = cut_segment(key, psd_values)
        return e13_scheme(k_pdf, seg, scheme, lam)

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
        f"nonconv {(iters >= MAX_ITER).sum():3d} "
        f"specrelerr {relerr.mean():.4f} Pratio {ratio:.4f} ({wall:.1f}s)",
        flush=True,
    )
