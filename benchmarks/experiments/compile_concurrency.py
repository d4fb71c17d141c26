"""Do concurrent .compile() calls through the remote tunnel overlap, or
does the server serialize them?

Compiles K distinct trivial-scan programs sequentially, then K more (new
shapes) concurrently on K threads.  If the tunnel parallelizes, the
concurrent wall-clock ~= one compile.

Run: JAX_COMPILATION_CACHE_DIR=/tmp/cc_$RANDOM python _scratch/compile_concurrency.py
"""
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import mind_the_gaps_tpu  # noqa: F401

print("cache dir:", jax.config.jax_compilation_cache_dir, flush=True)


def make_prog(n_steps, w):
    def body(c, k):
        x = c + jax.random.normal(k, c.shape)
        return x * 0.999, jnp.sum(x)

    def run(key, s):
        keys = jax.random.split(key, n_steps)
        return jax.lax.scan(body, s, keys)

    return jax.jit(run), jnp.zeros((w, 8))


def compile_one(n_steps, w):
    f, s = make_prog(n_steps, w)
    f.lower(jax.random.key(0), s).compile()


K = 4
t0 = time.perf_counter()
for i in range(K):
    compile_one(500 + i, 32)
seq = time.perf_counter() - t0
print(f"sequential x{K}: {seq:.1f} s ({seq/K:.1f} s each)", flush=True)

t0 = time.perf_counter()
with ThreadPoolExecutor(K) as pool:
    futs = [pool.submit(compile_one, 600 + i, 32) for i in range(K)]
    for f in futs:
        f.result()
conc = time.perf_counter() - t0
print(f"concurrent x{K}: {conc:.1f} s", flush=True)
