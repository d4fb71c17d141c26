"""Cold-compile cost of every production LRT program, timed one by one.

Run: JAX_COMPILATION_CACHE_DIR=/tmp/cc_$RANDOM python _scratch/compile_breakdown3.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import mind_the_gaps_tpu  # noqa: F401
from mind_the_gaps_tpu import GappyLightcurve
from mind_the_gaps_tpu.gpmodelling import GPModelling, _advance_segment
from mind_the_gaps_tpu.kernels import DampedRandomWalk, Lorentzian
from mind_the_gaps_tpu.lrt import _ChunkFitter, _f64_logprob_chunk_from_dy

print("cache dir:", jax.config.jax_compilation_cache_dir, flush=True)

n_points = 5000
rng = np.random.default_rng(0)
t = np.cumsum(rng.uniform(2.0, 8.0, n_points))
y = rng.normal(0.0, 2.0, n_points) + 10.0
dy = np.full(n_points, 0.3)
lc = GappyLightcurve(t, y, dy, exposures=1.0)

null_kernel = DampedRandomWalk(log_S0=1.0, log_omega0=-3.0, bounds=[(-5, 10), (-8, 2)])
alt_kernel = null_kernel + Lorentzian(log_S0=-1.0, log_Q=2.0, log_omega0=-2.0,
                                      bounds=[(-8, 5), (0, 6), (-5, 0)])


def timed(label, fn):
    t0 = time.perf_counter()
    fn()
    print(f"{label:50s} {time.perf_counter() - t0:8.1f} s", flush=True)


# pallas probe (the first TPU compile of the process)
from mind_the_gaps_tpu.gpmodelling import _pallas_backend_ok

timed("pallas backend probes (2 tiny kernels)", _pallas_backend_ok)

# chunk fitter programs
for name, kern in (("null", null_kernel), ("alt", alt_kernel)):
    fitter = _ChunkFitter(
        kern, t, kern.get_parameter_vector(), walkers=16, n_steps=500,
        chunk=512, dtype=jnp.float32,
    )
    nb = 512
    yb = np.zeros((nb, n_points), dtype=np.float64)
    db = np.ones((nb, n_points), dtype=np.float64)
    yb_j, db_j = fitter._prep(yb, db, 10001)
    timed(f"chunk fitter {name} (512x16x500)",
          lambda: fitter._exec_for(jax.random.key(0), yb_j, db_j))

# generation program
gp_null = GPModelling(lc, null_kernel)
gen = gp_null.make_device_generator("Gaussian")
timed("generation program (512 sims)",
      lambda: gen.lower(jax.random.key(0), jax.random.key(0),
                        jnp.zeros((512, 2), dtype=jnp.float64)).compile())

# f64 refine programs
t64 = jnp.asarray(t, dtype=jnp.float64)
for name, kern, d in (("null", null_kernel, 2), ("alt", alt_kernel, 5)):
    timed(f"f64 refine {name} (512 rows)",
          lambda: _f64_logprob_chunk_from_dy.lower(
              jnp.zeros((512, d), dtype=jnp.float32), t64,
              jnp.zeros((512, n_points), dtype=jnp.float64),
              jnp.zeros((512, n_points), dtype=jnp.float64),
              kernel=kern).compile())

# observed-fit segment programs + f64 recompute
for name, kern in (("null", null_kernel), ("alt", alt_kernel)):
    gp = GPModelling(lc, kern)
    D = gp._ndim
    state = jnp.zeros((32, D))
    chain_buf = jnp.zeros((10000, 32, D))
    lp_buf = jnp.zeros((10000, 32))
    timed(f"segment program {name} (500 steps)",
          lambda: _advance_segment.lower(
              jax.random.key(0), state, chain_buf, lp_buf,
              jnp.asarray(0, dtype=jnp.int32), *gp._seg_data(),
              log_prob_fn=gp._logprob_batch_fast_d, n_steps=500).compile())
    timed(f"obs f64 recompute {name} (4096 rows)",
          lambda: gp._logprob_batch.lower(
              jnp.zeros((4096, D), dtype=jnp.float64)).compile())
