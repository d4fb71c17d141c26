"""R=6 (pod-scale BASELINE config 5) kernel sweep: can the vreg-carry
form win at smaller tiles where the carry fits the register file?

Current heuristic: n_carry = nS + 2R + 7 = 21+12+7 = 40 rows; carry
enabled iff tile >= 256 and n_carry * max(tile//1024, 1) <= 48 — so
tile 1024 (40 <= 48) carries, tile 2048 (80) does not.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import mind_the_gaps_tpu  # noqa: F401
from mind_the_gaps_tpu.kernels import DampedRandomWalk, Lorentzian, SHOTerm
from mind_the_gaps_tpu.ops import pallas_log_likelihood

n_points = 10000
rng = np.random.default_rng(0)
t = np.cumsum(rng.uniform(2.0, 8.0, n_points))
y = rng.normal(0.0, 2.0, n_points)
diag = np.full(n_points, 0.09)
# R = 6: DRW (1 real) + Lorentzian (complex) + SHO underdamped (complex)
# + one more real-ish term via DRW
kernel = (
    DampedRandomWalk(log_S0=1.0, log_omega0=-3.0)
    + Lorentzian(log_S0=-1.0, log_Q=2.0, log_omega0=-2.0)
    + SHOTerm(log_S0=0.0, log_Q=1.0, log_omega0=-1.0)
)
theta0 = kernel.get_parameter_vector()
co_probe = jax.vmap(kernel.coefficients)(jnp.zeros((128, len(theta0)), dtype=jnp.float32))
R = co_probe[0].shape[1] + 2 * co_probe[2].shape[1]
print("R =", R, flush=True)

batch = 32768
dtype = jnp.float32
tt = jnp.asarray(t, dtype=dtype)
yy = jnp.asarray(y, dtype=dtype)
dd = jnp.asarray(diag, dtype=dtype)
REPS = 3


def run(label, tile, tb, unroll):
    @jax.jit
    def sweep(th):
        return pallas_log_likelihood(
            jax.vmap(kernel.coefficients)(th), tt, yy, dd,
            tile=tile, time_block=tb, unroll=unroll,
        )

    try:
        th0 = jnp.asarray(theta0, dtype=dtype) + 0.05 * jax.random.normal(
            jax.random.key(0), (batch, len(theta0)), dtype=dtype)
        float(jnp.sum(sweep(th0)))
    except Exception as e:
        print(f"{label:34s} FAIL {type(e).__name__}: {str(e)[:80]}", flush=True)
        return

    best = 0.0
    for loop in range(3):
        xs = [jnp.asarray(theta0, dtype=dtype) + 0.05 * jax.random.normal(
            jax.random.key(1000 * loop + r + 1), (batch, len(theta0)), dtype=dtype)
            for r in range(REPS)]
        _ = [float(x[0, 0]) for x in xs]
        t0 = time.perf_counter()
        acc = 0.0
        for x in xs:
            acc = acc + jnp.sum(sweep(x))
        float(acc)
        el = time.perf_counter() - t0
        if loop > 0:
            best = max(best, batch * REPS / el)
    print(f"{label:34s} {best/1e3:8.1f} k evals/s", flush=True)


run("tile=2048 tb=512 u=4 (r3 default)", 2048, 512, 4)
run("tile=1024 tb=512 u=4 (carry on)", 1024, 512, 4)
run("tile=1024 tb=256 u=4", 1024, 256, 4)
run("tile=512  tb=512 u=4", 512, 512, 4)
run("tile=2048 tb=256 u=8", 2048, 256, 8)
run("tile=1024 tb=512 u=8", 1024, 512, 8)
