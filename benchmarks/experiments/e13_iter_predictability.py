"""Is the E13 iteration count predictable before running the loop?

Round-5 closed straggler *compaction* (host-sync cost eats the ~32%
ceiling).  The remaining scheduling idea is difficulty-ORDERED chunking:
sort sims by a cheap predictor of their iteration count so each
lock-step chunk is homogeneous and pays its own (smaller) max instead of
the global straggler.  That only works if iters correlate with something
computable before the loop.  Candidates measured here, per sim:

  - theta (the posterior draw's PSD params)
  - realized segment CV (std/mean) and skewness
  - the first-iteration displacement ||x1 - x0||  (nearly free: the
    loop computes x1 anyway)
  - iters of a cheap LOW-RESOLUTION pilot run (decimated segment)

Prints per-candidate Spearman correlation with the true iteration count
and the implied chunk-max saving of sorting by the best predictor.
"""
import time

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from mind_the_gaps_tpu.kernels import DampedRandomWalk
from mind_the_gaps_tpu.simulator import Simulator
from mind_the_gaps_tpu.simulator.core import e13_adjust

B = 512
CHUNK = 128
rng = np.random.default_rng(0)
t = np.cumsum(rng.uniform(4.0, 9.0, 500))
kernel = DampedRandomWalk(log_S0=1.0, log_omega0=-3.0)
theta0 = kernel.get_parameter_vector()
sim = Simulator(
    lambda w: np.asarray(kernel.get_psd(jnp.asarray(w), jnp.asarray(theta0))),
    t, exposures=1.0, mean=10.0, pdf="lognormal", extension_factor=2, max_iter=400,
)
omega = jnp.asarray(sim.omega)
# posterior-like tight draws
thetas = theta0[None, :] + 0.15 * rng.standard_normal((B, 2))


@jax.jit
def psd_batch(ths):
    def one(th):
        v = kernel.get_psd(omega[1:], th)
        return jnp.concatenate([jnp.zeros((1,), v.dtype), v])
    return jax.vmap(one)(ths)


# ---- reproduce the pipeline up to the segment, then instrument ------- #
from mind_the_gaps_tpu.simulator.core import tk95_rates

n_fft = sim._n_fft if hasattr(sim, "_n_fft") else None
# build segments exactly as the internal pipeline does
m_cut = sim._e13_cut_len if hasattr(sim, "_e13_cut_len") else None
print("m_cut:", m_cut)

grid_t0 = float(sim.sim_timestamps[0]); grid_t1 = float(sim.sim_timestamps[-1])
duration = float(sim.sim_duration)
dt = float(sim.sim_dt)
n_fft_len = len(sim.sim_timestamps)


def cut_segment(key, psd_values):
    k_fft, k_cut, k_pdf = jax.random.split(key, 3)
    rate = tk95_rates(k_fft, psd_values, n_fft_len, dt)
    rate = rate - jnp.mean(rate) + 10.0
    shift = jax.random.uniform(k_cut, (), minval=grid_t0, maxval=grid_t1 - duration, dtype=rate.dtype)
    k0 = jnp.floor((shift - grid_t0) / dt).astype(jnp.int32)
    k0 = jnp.clip(k0, 0, n_fft_len - m_cut)
    return k_pdf, jax.lax.dynamic_slice(rate, (k0,), (m_cut,))


def one(key, psd_values):
    k_pdf, seg = cut_segment(key, psd_values)
    out, iters = e13_adjust(k_pdf, seg, "lognormal", 10.0, 400)
    # predictors
    cv = jnp.std(seg) / jnp.mean(seg)
    sk = jnp.mean(((seg - jnp.mean(seg)) / jnp.std(seg)) ** 3)
    return iters, cv, sk


keys = jax.random.split(jax.random.key(1), B)
psd_b = psd_batch(jnp.asarray(thetas))
f = jax.jit(jax.vmap(one))
t0 = time.time()
iters, cv, sk = jax.tree.map(np.asarray, f(keys, psd_b))
print(f"ran {B} sims in {time.time()-t0:.1f}s")
print("iters: mean %.1f median %.0f p90 %.0f max %.0f" % (iters.mean(), np.median(iters), np.percentile(iters, 90), iters.max()))

from scipy.stats import spearmanr

for name, x in [("theta0", thetas[:, 0]), ("theta1", thetas[:, 1]), ("cv", cv), ("skew", sk)]:
    r = spearmanr(x, iters).statistic
    print(f"spearman(iters, {name}) = {r:+.3f}")

# first-iteration displacement predictor: rerun with an instrumented adjust
def one_disp(key, psd_values):
    k_pdf, seg = cut_segment(key, psd_values)
    # replicate e13_adjust's first step
    m = seg.shape[-1]
    namp = m // 2 + 1
    sample_std = jnp.std(seg)
    from mind_the_gaps_tpu.simulator.core import sample_pdf
    xsim = sample_pdf(k_pdf, "lognormal", 10.0, sample_std, (m,))
    amplitudes_norm = jnp.abs(jnp.fft.rfft(seg.astype(jnp.float32))) / namp
    sorted_draws32 = (-jnp.sort(-xsim)).astype(jnp.float32)
    x0 = xsim.astype(jnp.float32)
    phases = jnp.angle(jnp.fft.rfft(x0))
    adj = jnp.fft.irfft(amplitudes_norm * jnp.exp(1j * phases), n=m)
    order = jnp.argsort(-adj)
    _, x1 = jax.lax.sort_key_val(order, sorted_draws32)
    d1 = jnp.mean(jnp.abs(x1 - x0) / (jnp.abs(x0) + 1e-8))
    return d1

d1 = np.asarray(jax.jit(jax.vmap(one_disp))(keys, psd_b))
print(f"spearman(iters, first-step displacement) = {spearmanr(d1, iters).statistic:+.3f}")

# implied saving of oracle sort and of sorting by the best predictor
def chunk_cost(order):
    tot = 0
    for s in range(0, B, CHUNK):
        tot += iters[order[s:s+CHUNK]].max()
    return tot

base = chunk_cost(np.arange(B))
oracle = chunk_cost(np.argsort(iters))
best_pred = max([("cv", cv), ("skew", sk), ("d1", d1), ("theta0", thetas[:,0]), ("theta1", thetas[:,1])],
                key=lambda p: abs(spearmanr(p[1], iters).statistic))
by_pred = chunk_cost(np.argsort(best_pred[1]))
print(f"chunk-max iteration total: unsorted {base}, oracle-sorted {oracle} ({100*(1-oracle/base):.0f}% saving), "
      f"sorted by {best_pred[0]} {by_pred} ({100*(1-by_pred/base):.0f}% saving)")
