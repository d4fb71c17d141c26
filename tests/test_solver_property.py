"""Property sweep: randomized kernel structures / parameters / sizes vs
the dense-Cholesky ground truth, across every solver tier.

The named parity tests (test_solver.py, test_batched_solver.py,
test_kalman.py) pin each tier at hand-picked parameters; this sweep
draws random term COMBINATIONS with randomized log-parameters over wide
ranges and random problem sizes (down to N=2) and asserts that all f64
tiers agree with an independent pure-numpy dense Cholesky to the 1e-8
celerite-parity contract (BASELINE.md) wherever the dense problem is
well-conditioned.  Near-singular draws (condition number beyond f64)
are skipped rather than asserted — the contract is parity with
celerite, which has the same conditioning limits.

Seeds are fixed (zlib.crc32 of the case tag, per repo convention); the
sweep is deterministic.
"""
import math
import zlib

import numpy as np
import pytest
import scipy.linalg

import jax
import jax.numpy as jnp

from mind_the_gaps_tpu.kernels import (
    BendingPowerlaw,
    ComplexTerm,
    Cosinus,
    DampedRandomWalk,
    JitterTerm,
    Lorentzian,
    Matern32Term,
    RealTerm,
    SHOTerm,
)
from mind_the_gaps_tpu.solver import log_likelihood
from mind_the_gaps_tpu.solver.batched import batched_log_likelihood
from mind_the_gaps_tpu.solver.kalman import kalman_log_likelihood


def _np_loglike_or_none(term, t, y, diag, max_cond=1e10):
    """Dense ground truth; None when the draw is too ill-conditioned for
    an f64 parity assertion to be meaningful."""
    tau = np.abs(t[:, None] - t[None, :])
    ar, cr, ac, bc, cc, dc = (np.asarray(x) for x in term.coefficients())
    K = np.zeros_like(tau)
    if ar.size:
        K += np.sum(ar * np.exp(-cr * tau[..., None]), axis=-1)
    if ac.size:
        e = np.exp(-cc * tau[..., None])
        K += np.sum(
            e * (ac * np.cos(dc * tau[..., None]) + bc * np.sin(dc * tau[..., None])),
            axis=-1,
        )
    K = K + np.diag(diag)
    if np.linalg.cond(K) > max_cond:
        return None
    try:
        L = scipy.linalg.cholesky(K, lower=True)
    except scipy.linalg.LinAlgError:
        return None
    z = scipy.linalg.solve_triangular(L, y, lower=True)
    return -0.5 * (
        z @ z + 2.0 * np.sum(np.log(np.diag(L))) + len(y) * math.log(2 * math.pi)
    )


# (constructor, randomized log-parameter ranges)
_ZOO = [
    (RealTerm, [(-2.0, 1.0), (-3.0, 1.0)]),
    (ComplexTerm, [(-2.0, 1.0), (-4.0, -1.0), (-2.5, 0.5), (-1.5, 1.0)]),
    (SHOTerm, [(-2.0, 1.0), (-2.0, 2.0), (-2.0, 0.5)]),
    (Matern32Term, [(-1.5, 1.0), (-1.0, 2.0)]),
    (Lorentzian, [(-2.0, 1.0), (0.0, 2.5), (-2.0, 0.5)]),
    (Cosinus, [(-2.0, 1.0), (-2.0, 0.5)]),
    (DampedRandomWalk, [(-2.0, 1.5), (-3.0, 0.5)]),
    # BendingPowerlaw's PD prior requires log_S0 >= log_Q
    (BendingPowerlaw, [(0.0, 1.5), (-2.0, -0.5), (-2.0, 0.5)]),
    (JitterTerm, [(-2.0, 0.5)]),
]


def _random_case(tag: str):
    rng = np.random.default_rng(zlib.crc32(tag.encode()))
    n_terms = int(rng.integers(1, 4))
    term = None
    for k in range(n_terms):
        # a jitter-ONLY kernel has zero semiseparable terms (pure white
        # noise) — not a valid celerite model; keep the first draw real
        zoo = _ZOO[:-1] if k == 0 else _ZOO
        ctor, ranges = zoo[int(rng.integers(len(zoo)))]
        params = [float(rng.uniform(lo, hi)) for lo, hi in ranges]
        t_new = ctor(*params)
        term = t_new if term is None else term + t_new
    n = int(rng.choice([2, 3, 8, 64, 257]))
    t = np.sort(rng.uniform(0.0, 120.0, n))
    t += np.arange(n) * 1e-9  # strictly increasing
    y = rng.normal(0.0, 2.0, n)
    diag = rng.uniform(0.01, 0.3, n) ** 2
    return term, t, y, diag


CASES = [f"case{i}" for i in range(40)]


@pytest.mark.parametrize("tag", CASES)
def test_all_f64_tiers_match_dense(tag):
    term, t, y, diag = _random_case(tag)
    ref = _np_loglike_or_none(term, t, y, diag)
    if ref is None:
        pytest.skip("draw too ill-conditioned for an f64 parity assertion")

    theta = jnp.asarray(term.get_parameter_vector())
    co = term.coefficients(theta)

    ll_semi = float(jax.jit(lambda: log_likelihood(co, t, y, diag))())
    assert ll_semi == pytest.approx(ref, rel=1e-8, abs=1e-7), (
        f"{tag}: semiseparable {ll_semi} vs dense {ref} ({term!r}, n={len(t)})"
    )

    co_b = jax.tree.map(lambda x: jnp.asarray(x)[None], co)
    ll_bat = float(
        np.asarray(
            jax.jit(lambda: batched_log_likelihood(co_b, t, y[None], diag[None]))()
        )[0]
    )
    assert ll_bat == pytest.approx(ref, rel=1e-8, abs=1e-7), (
        f"{tag}: batched {ll_bat} vs dense {ref} ({term!r}, n={len(t)})"
    )

    ll_kal = float(jax.jit(lambda: kalman_log_likelihood(co, t, y, diag))())
    assert ll_kal == pytest.approx(ref, rel=1e-7, abs=1e-6), (
        f"{tag}: kalman {ll_kal} vs dense {ref} ({term!r}, n={len(t)})"
    )


def test_sweep_is_not_degenerate():
    """At least 2/3 of the random draws must be well-conditioned — the
    sweep would silently assert nothing if the ranges drifted into
    always-skipping territory."""
    ok = 0
    for tag in CASES:
        term, t, y, diag = _random_case(tag)
        if _np_loglike_or_none(term, t, y, diag) is not None:
            ok += 1
    assert ok >= 2 * len(CASES) // 3, f"only {ok}/{len(CASES)} cases usable"
