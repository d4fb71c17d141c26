"""Pure-numpy celerite log-likelihood — the compile-free reference tier.

The Foreman-Mackey+17 §5 Cholesky recursion with the same local-phase
(rotation-propagator) generators as ``solver/batched.py``, as a plain
Python loop over numpy arrays.  O(N R^2) time, O(R^2) state — exactly
what celerite's C++/Eigen solver computes per evaluation (the reference
calls it per MCMC step through ``gp.log_likelihood``, reference
gpmodelling.py:152).

Two in-tree uses:
- ``GPModelling`` validates the kernel at construction with ONE
  evaluation here instead of compiling the MAP objective: an XLA-CPU
  value_and_grad compile of the N=5k f64 scan costs ~10-12 s per process
  (and this environment's persistent cache cannot reload XLA:CPU
  executables across hosts — cpu_aot_loader machine-feature mismatch),
  while this loop evaluates in ~0.26 s at N=5k with zero compile.
- ``benchmarks/cpu_baseline.py`` uses it as the no-compiler floor of the
  measured CPU baseline.
"""
from __future__ import annotations

import numpy as np

__all__ = ["numpy_log_likelihood"]


def numpy_log_likelihood(coeffs, t, y, diag):
    """Celerite log-likelihood of ``y`` (mean already subtracted) with
    observation variances ``diag``; ``coeffs`` is the standard
    (ar, cr, ac, bc, cc, dc) tuple.  Returns -inf when the factorization
    loses positive-definiteness (the reference's LinAlgError case)."""
    ar, cr, ac, bc, cc, dc = [np.asarray(x, dtype=np.float64) for x in coeffs]
    t = np.asarray(t, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    diag = np.asarray(diag, dtype=np.float64)
    jr, jc = len(ar), len(ac)
    r = jr + 2 * jc
    n = len(t)
    u = np.concatenate([ar, np.stack([ac, bc], 1).ravel()]) if jc else ar.copy()
    v = np.concatenate([np.ones(jr), np.stack([np.ones(jc), np.zeros(jc)], 1).ravel()])
    k0 = ar.sum() + ac.sum()
    a = diag + k0
    if a[0] <= 0 or not np.all(np.isfinite(u)):
        return -np.inf
    dt = np.diff(t)

    s = np.zeros((r, r))
    d_prev = a[0]
    w_prev = v / d_prev
    f = np.zeros(r)
    z_prev = y[0]
    logdet = np.log(d_prev)
    quad = z_prev * z_prev / d_prev
    p = np.zeros((r, r))
    for nn in range(1, n):
        h = dt[nn - 1]
        # block-diagonal propagator: exp(-c h) (real), decay-rotation (complex)
        p[:, :] = 0.0
        for j in range(jr):
            p[j, j] = np.exp(-cr[j] * h)
        for j in range(jc):
            e = np.exp(-cc[j] * h)
            cs, sn = np.cos(dc[j] * h), np.sin(dc[j] * h)
            i0 = jr + 2 * j
            p[i0, i0] = e * cs
            p[i0, i0 + 1] = -e * sn
            p[i0 + 1, i0] = e * sn
            p[i0 + 1, i0 + 1] = e * cs
        s = p @ (s + d_prev * np.outer(w_prev, w_prev)) @ p.T
        su = s @ u
        d_n = a[nn] - u @ su
        if d_n <= 0 or not np.isfinite(d_n):
            return -np.inf
        w_n = (v - su) / d_n
        f = p @ (f + w_prev * z_prev)
        z = y[nn] - u @ f
        logdet += np.log(d_n)
        quad += z * z / d_n
        d_prev, w_prev, z_prev = d_n, w_n, z
    return -0.5 * (quad + logdet + n * np.log(2.0 * np.pi))
