"""Benchmark: batched GP log-likelihood throughput at N=5000, plus the
LRT-bootstrap wall-clock (BASELINE.md's primary metric pair).

Primary metric (BASELINE.md): GP log-likelihood evaluations/sec at
N = 5k points with a DRW+Lorentzian (null+QPO) kernel — the kernel every
MCMC step of the LRT bootstrap executes, batched over
(simulations x walkers).  The measured path is the production f32
bootstrap solver (local-phase rotation form + Kahan accumulation),
which tracks the f64 parity solver to <0.1 in absolute log-likelihood
at this N (tests/test_mixed_precision.py); the run also cross-checks
that agreement on a small batch and refuses to report if it fails.

Second metric (same JSON line, extra keys): the measured wall-clock of
one production bootstrap chunk — 512 simulated lightcurves x 12 walkers
x 500 stretch-move steps, refit with BOTH the null (DRW) and the
alternative (DRW+QPO) kernel — scaled to the full 10,000-simulation
Protassov bootstrap.  ``bootstrap_10k_seconds`` is that scaled
single-chip number (stated as scaled: x (10000/512) chunks);
``bootstrap_10k_seconds_v5e8_est`` divides by 8 for the BASELINE.md
v5e-8 target (the simulation axis is embarrassingly parallel and the
sharded path is exercised by __graft_entry__.dryrun_multichip).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...},
ALWAYS — every phase after the primary metric is time-boxed against a
wall-clock budget (MTG_BENCH_BUDGET, default 450 s; the driver's cap is
~600); phases that time out or are not reached are listed under
"skipped" and a watchdog emits a fallback record even if the first
device interaction wedges (round-8 measured cold+contended runs blowing
past 590 s).

vs_baseline: the reference publishes no numbers (BASELINE.md), so the
denominator is MEASURED by benchmarks/cpu_baseline.py (round 3): the
compiled celerite-equivalent XLA-CPU f64 scan at N=5k, DRW+QPO, times
one core on this image's host measures 88.1 evals/s (11.36 ms/eval; a
pure-numpy loop is 259 ms/eval), floored at celerite's published
~670 evals/s/core (~1.5 ms at N~5k, J~2-4, Foreman-Mackey+2017 scaling
figure — generous to the baseline since this host's core is slower),
x the reference's typical 12 cores -> 8,040 evals/s.
vs_baseline = measured / 8,040 (single chip; the >= 100x BASELINE.md
target refers to a v5e-8).
"""
from __future__ import annotations

import json
import os
import sys
import threading
import time

import numpy as np

import jax
import jax.numpy as jnp

# measured 2026-08-17 by benchmarks/cpu_baseline.py (see its JSON line):
# max(88.1 measured, 670 published) evals/s/core x 12 cores
CPU_PIPELINE_BASELINE_EVALS_PER_SEC = 8_040.0

# The driver runs bench.py under a wall-clock budget; a cold compile
# cache in a contended pool phase has blown past 590 s twice (round-8
# notes).  Every phase after the primary metric is therefore OPTIONAL:
# it runs on a daemon thread with a deadline, the first timeout skips
# everything after it, and the JSON line is emitted no matter what —
# with a "skipped" key naming what was dropped.  os._exit guarantees a
# hung remote call cannot keep the process (and the round artifact)
# hostage.
BENCH_BUDGET_SECONDS = float(os.environ.get("MTG_BENCH_BUDGET", "540"))
_T0 = time.monotonic()


def _mark(msg: str) -> None:
    """Phase marker on stderr (stdout carries ONLY the JSON line) — lets
    a blown budget be attributed (entry stall vs compile vs loop) from
    the driver's captured tail."""
    print(f"[bench +{time.monotonic() - _T0:6.1f}s] {msg}", file=sys.stderr, flush=True)


def _remaining(reserve: float = 20.0) -> float:
    return BENCH_BUDGET_SECONDS - (time.monotonic() - _T0) - reserve


def _run_phase(name, fn, results, skipped, timeout=None):
    """Run one optional bench phase with a deadline.  Returns False when
    the phase timed out — the device queue is then likely wedged or
    contended, so the caller stops scheduling further device phases."""
    budget = _remaining()
    if timeout is not None:
        budget = min(budget, timeout)
    if budget <= 5.0:
        skipped.append({"phase": name, "reason": "budget exhausted"})
        return False
    _mark(f"phase {name}: start (budget {budget:.0f}s)")
    box = {}

    def run():
        try:
            box["out"] = fn()
        except Exception as e:  # noqa: BLE001 — recorded, never fatal
            box["err"] = f"{type(e).__name__}: {e}"

    th = threading.Thread(target=run, daemon=True, name=f"bench-{name}")
    th.start()
    th.join(budget)
    if th.is_alive():
        skipped.append({"phase": name, "reason": f"timed out after {budget:.0f}s"})
        return False
    if "err" in box:
        skipped.append({"phase": name, "reason": box["err"]})
        return True  # the phase failed fast; later phases may still fit
    results.update(box.get("out") or {})
    return True


_EMIT_LOCK = threading.Lock()
_EMITTED = False

# Filled by main() the moment the primary metric exists: if a LATER,
# non-phase-boxed step wedges (e.g. a fetch on the main thread), the
# watchdog emits the real measurement instead of a 0.0 fallback.
_PRIMARY: dict = {}

_LAST_GOOD_PATH = os.path.join(
    os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
    "mind_the_gaps_tpu", "bench_last_good.json",
)


def _save_last_good(record) -> None:
    try:
        os.makedirs(os.path.dirname(_LAST_GOOD_PATH), exist_ok=True)
        with open(_LAST_GOOD_PATH, "w") as f:
            json.dump({"measured_at_unix": round(time.time(), 1), **record}, f)
    except OSError:
        pass


def _load_last_good():
    try:
        with open(_LAST_GOOD_PATH) as f:
            return json.load(f)
    except (OSError, ValueError):
        return None


def _emit(record) -> None:
    """Print the one JSON line exactly once (main path or watchdog)."""
    global _EMITTED
    with _EMIT_LOCK:
        if _EMITTED:
            return
        _EMITTED = True
        print(json.dumps(record))
        sys.stdout.flush()


def _watchdog():
    """If even the primary metric hasn't produced a line by the budget
    (a wedged first device interaction / remote compile), emit a
    fallback record so the driver artifact still parses, and exit 0."""
    delay = BENCH_BUDGET_SECONDS - (time.monotonic() - _T0)
    if delay > 0:
        time.sleep(delay)
    if _PRIMARY:
        # the primary metric WAS measured; something after it wedged
        # outside a phase box — report the real number
        record = dict(_PRIMARY)
        record["skipped"] = [
            {"phase": "optional", "reason": "watchdog fired after the primary metric"}
        ]
        _emit(record)
        os._exit(0)
    record = {
        "metric": "GP loglike evals/sec (N=5k, DRW+QPO kernel, f32 path, f64-checked)",
        "value": 0.0,
        "unit": "evals/s",
        "vs_baseline": 0.0,
        "skipped": [{"phase": "primary", "reason": f"budget ({BENCH_BUDGET_SECONDS:.0f}s) exceeded"}],
    }
    # a wedged run says nothing about the code — attach the last
    # successful record from this machine (clearly labeled) so the
    # artifact distinguishes "pool stall" from "benchmark broken"
    last = _load_last_good()
    if last is not None:
        record["last_known_good"] = last
    _emit(record)
    os._exit(0)


def main():
    threading.Thread(target=_watchdog, daemon=True, name="bench-watchdog").start()
    from mind_the_gaps_tpu.kernels import DampedRandomWalk, Lorentzian
    from mind_the_gaps_tpu.solver.batched import batched_log_likelihood

    n_points = 5000
    rng = np.random.default_rng(0)
    t = np.cumsum(rng.uniform(2.0, 8.0, n_points))
    y = rng.normal(0.0, 2.0, n_points)
    diag = np.full(n_points, 0.09)

    kernel = DampedRandomWalk(log_S0=1.0, log_omega0=-3.0) + Lorentzian(
        log_S0=-1.0, log_Q=2.0, log_omega0=-2.0
    )
    theta0 = kernel.get_parameter_vector()

    # --- build every primary-phase program, compile them CONCURRENTLY #
    # The primary phase serialized 4 distinct compiles (two f64-heavy
    # gate programs, two 65k-batch sweeps) behind the entry stall —
    # measured 2026-08-20: two truly-cold runs blew the 450 s budget
    # before the primary metric existed.  Remote-tunnel compiles have a
    # tens-of-seconds floor each but overlap almost perfectly
    # (CLAUDE.md), so: lowers stay serial on THIS thread (persistent-
    # cache key determinism), only the backend compiles fan out.
    _mark("imports done")
    thetas_check = jnp.asarray(
        theta0 + 0.05 * np.asarray(jax.random.normal(jax.random.key(7), (8, len(theta0))))
    )
    _mark("first device interaction done")  # the intermittent entry stall lands here
    batch = 65536
    dtype = jnp.float32
    t64, y64, d64 = jnp.asarray(t), jnp.asarray(y), jnp.asarray(diag)
    tt = jnp.asarray(t, dtype=dtype)
    yy = jnp.asarray(y, dtype=dtype)
    dd = jnp.asarray(diag, dtype=dtype)
    thetas = jnp.asarray(theta0, dtype=dtype) + 0.05 * jax.random.normal(
        jax.random.key(1), (batch, len(theta0)), dtype=dtype
    )

    from mind_the_gaps_tpu.ops import pallas_log_likelihood

    @jax.jit
    def gate64(th):
        return batched_log_likelihood(jax.vmap(kernel.coefficients)(th), t64, y64, d64)

    @jax.jit
    def gate32(th):
        c = jax.tree.map(
            lambda x: x.astype(jnp.float32), jax.vmap(kernel.coefficients)(th)
        )
        return batched_log_likelihood(c, tt, yy, dd)

    @jax.jit
    def sweep_pallas(th):
        # tile swept on a v5e chip for the packed-symmetric kernel
        # (round 3): 2048 -> 1.41M evals/s vs 0.96M at 1024 (the packed
        # S state halves VMEM so the larger tile fits)
        return pallas_log_likelihood(jax.vmap(kernel.coefficients)(th), tt, yy, dd, tile=2048)

    @jax.jit
    def sweep_xla(th):
        return batched_log_likelihood(jax.vmap(kernel.coefficients)(th), tt, yy, dd, unroll=1)

    from concurrent.futures import ThreadPoolExecutor

    lowered = []
    for name, fn, arg in [
        ("gate64", gate64, thetas_check),
        ("gate32", gate32, thetas_check),
        ("pallas", sweep_pallas, thetas),
        ("xla", sweep_xla, thetas),
    ]:
        try:
            lowered.append((name, fn.lower(arg)))
        except Exception:
            lowered.append((name, None))  # e.g. Mosaic lower off-TPU
    _mark("4 primary programs lowered")
    compile_ok = {}
    with ThreadPoolExecutor(max_workers=4) as pool:
        futs = [(name, pool.submit(low.compile)) for name, low in lowered if low is not None]
        for name, fut in futs:
            try:
                fut.result()  # seeds the in-process jit fast path
                compile_ok[name] = True
            except Exception:
                compile_ok[name] = False
            _mark(f"compile {name}: {'ok' if compile_ok[name] else 'FAILED'}")

    # --- correctness gate: f32 must track f64 on this problem -------- #
    ll64 = np.asarray(gate64(thetas_check))
    ll32 = np.asarray(gate32(thetas_check))
    max_err = float(np.max(np.abs(ll64 - ll32)))
    if not np.all(np.isfinite(ll64)) or max_err > 1.0:
        _emit(
            {"metric": "GP loglike evals/sec (N=5k)", "value": 0.0, "unit": "evals/s",
             "vs_baseline": 0.0, "error": f"f32/f64 mismatch {max_err}"}
        )
        os._exit(1)

    # prefer the Pallas kernel; fall back to the XLA scan if Mosaic
    # cannot compile on this backend
    try:
        if not compile_ok.get("pallas"):
            raise RuntimeError("pallas compile failed")
        out_p = sweep_pallas(thetas)
        out_x = sweep_xla(thetas)
        if float(jnp.max(jnp.abs(out_p - out_x))) > 0.5:
            raise RuntimeError("pallas/xla mismatch")
        sweep = sweep_pallas
    except Exception:
        sweep = sweep_xla

    _mark(f"sweep selected: {'pallas' if sweep is sweep_pallas else 'xla'}")
    float(jnp.sum(sweep(thetas)))  # compile + warmup + drain
    _mark("sweep warmup drained")

    # Measurement rules for this serving runtime: (a) identical input
    # buffers get memoized — use a fresh input per repetition; (b)
    # block_until_ready does not force remote execution — accumulate on
    # device and fetch ONE scalar at the end; (c) the FIRST timed loop
    # in a process runs ~2x slow (runtime/session warmup beyond the
    # compile) — run a throwaway timed loop before the real one.
    reps = 4

    def timed_loop(key0):
        inputs = [
            jnp.asarray(theta0, dtype=dtype)
            + 0.05 * jax.random.normal(jax.random.key(key0 + r), (batch, len(theta0)), dtype=dtype)
            for r in range(reps)
        ]
        _ = [float(x[0, 0]) for x in inputs]  # materialize inputs
        start = time.perf_counter()
        acc = 0.0
        for th in inputs:
            acc = acc + jnp.sum(sweep(th))
        float(acc)  # single fetch forces all executions
        return time.perf_counter() - start

    timed_loop(500)  # session warmup (discarded)
    _mark("discarded warmup loop done")
    elapsed = timed_loop(100)
    _mark("timed loop done")

    evals_per_sec = batch * reps / elapsed

    record = {
        "metric": "GP loglike evals/sec (N=5k, DRW+QPO kernel, f32 path, f64-checked)",
        "value": round(evals_per_sec, 1),
        "unit": "evals/s",
        "vs_baseline": round(evals_per_sec / CPU_PIPELINE_BASELINE_EVALS_PER_SEC, 2),
    }
    _PRIMARY.update(record)

    # --- optional phases, in increasing cost, each time-boxed -------- #
    skipped: list = []
    phases = [
        ("bootstrap_chunk", lambda: _bootstrap_chunk_seconds(t, y, diag)),
        ("e13_generation", _e13_generation_rate),
        ("derive_posteriors", lambda: _derive_posteriors_seconds(t, y, diag)),
        # the full measured LRT re-enters programs the chunk phase
        # compiled; it is the most expensive and the most skippable
        ("lrt_512", lambda: _lrt_512_measured_seconds(t)),
    ]
    for i, (name, fn) in enumerate(phases):
        if not _run_phase(name, fn, record, skipped):
            # a timeout means the device queue is wedged or the budget
            # is gone — later phases would only queue behind it
            skipped.extend(
                {"phase": later, "reason": "not attempted"}
                for later, _ in phases[i + 1:]
            )
            break
    record["skipped"] = skipped
    if record["value"] > 0:
        _save_last_good(record)
    _emit(record)
    # daemon phase threads may still hold a wedged remote call — exit
    # hard so the driver always gets rc=0 with the line above
    os._exit(0)


def _bootstrap_chunk_seconds(t, y, diag, chunk_sims=512, walkers=12, n_steps=500, nsims_total=10_000):
    """Time one production bootstrap chunk (null + alternative refits) and
    scale to the 10k-sim Protassov bootstrap.

    The measured program is exactly what protassov_lrt runs per chunk
    (lrt.fit_lightcurves_batch -> _make_batched_max_loglike): grouped
    stretch-move chains, every step one (chunk*walkers/2)-element batched
    likelihood.  Memoization rules: warm up on one key, time on a fresh
    key (different input => distinct remote execution), fetch ONE scalar.
    """
    from mind_the_gaps_tpu.kernels import DampedRandomWalk, Lorentzian
    from mind_the_gaps_tpu.lrt import _make_batched_max_loglike

    null_kernel = DampedRandomWalk(log_S0=1.0, log_omega0=-3.0)
    alt_kernel = DampedRandomWalk(log_S0=1.0, log_omega0=-3.0) + Lorentzian(
        log_S0=-1.0, log_Q=2.0, log_omega0=-2.0
    )
    dtype = jnp.float32

    rng = np.random.default_rng(42)
    ys = (np.asarray(y)[None, :] + rng.normal(0.0, 0.3, (chunk_sims, len(y)))).astype(np.float32)
    diags = np.broadcast_to(np.asarray(diag, dtype=np.float32), ys.shape)
    ys_j, diags_j = jnp.asarray(ys), jnp.asarray(diags)
    tt = jnp.asarray(t, dtype=dtype)

    use_pallas = jax.default_backend() == "tpu"
    out = {
        "bootstrap_chunk_sims": chunk_sims,
        "bootstrap_walkers": walkers,
        "bootstrap_steps": n_steps,
        "bootstrap_early_stop": [0.01, 50],
        "bootstrap_scaled_from_chunk": True,
    }
    total = 0.0
    for name, kernel in (("null", null_kernel), ("alt", alt_kernel)):
        theta0 = jnp.asarray(kernel.get_parameter_vector(), dtype=dtype)
        # early_stop is protassov_lrt's production default: the chunk's
        # step loop stops once no sim improved its best loglike by >0.01
        # for 50 consecutive steps (the DRW null plateaus near step ~130;
        # the alt runs its full budget — benchmarks/experiments/
        # plateau_probe.py)
        runner = _make_batched_max_loglike(
            kernel, tt, n_steps, walkers, dtype=dtype,
            backend="pallas" if use_pallas else "xla", early_stop=(0.01, 50),
        )
        try:
            exec_fn = runner.lower(jax.random.key(0), ys_j, diags_j, theta0, 0.1).compile()
        except Exception:
            runner = _make_batched_max_loglike(
                kernel, tt, n_steps, walkers, dtype=dtype, backend="xla",
                early_stop=(0.01, 50),
            )
            exec_fn = runner.lower(jax.random.key(0), ys_j, diags_j, theta0, 0.1).compile()
        lls, _ = exec_fn(jax.random.key(0), ys_j, diags_j, theta0, 0.1)  # warmup
        float(jnp.sum(lls))
        start = time.perf_counter()
        lls, _ = exec_fn(jax.random.key(1), ys_j, diags_j, theta0, 0.1)
        float(jnp.sum(lls))  # fetch forces the remote execution
        elapsed = time.perf_counter() - start
        out[f"bootstrap_chunk_seconds_{name}"] = round(elapsed, 2)
        total += elapsed

    scale = nsims_total / chunk_sims
    out["bootstrap_10k_seconds"] = round(total * scale, 1)
    out["bootstrap_10k_seconds_v5e8_est"] = round(total * scale / 8.0, 1)
    return out


def _derive_posteriors_seconds(t, y, diag, steps=4000, walkers=32):
    """Wall-clock of the production observed-fit sampler:
    derive_posteriors equivalent at N=5k, 32 walkers, 4000 steps
    (round-3 target < 15 s; round 2 measured ~47 s of which only ~9 s
    was device time — the convergence loop now runs on device with one
    end-of-run chain fetch)."""
    from mind_the_gaps_tpu import GappyLightcurve, GPModelling
    from mind_the_gaps_tpu.kernels import DampedRandomWalk, Lorentzian

    lc = GappyLightcurve(np.asarray(t), np.asarray(y) + 10.0, np.sqrt(np.asarray(diag)))
    kernel = DampedRandomWalk(log_S0=1.0, log_omega0=-3.0, bounds=[(-5, 10), (-8, 2)]) + Lorentzian(
        log_S0=-1.0, log_Q=2.0, log_omega0=-2.0, bounds=[(-8, 5), (0, 6), (-5, 0)]
    )
    gp = GPModelling(lc, kernel)
    theta0 = np.asarray(gp.initial_params)
    init = gp.spread_walkers(walkers, theta0, np.array(gp.get_parameter_bounds(), dtype=object))
    # warmup run MUST use the same max_steps: the chain-buffer shape is
    # part of the segment program, so a different budget would push a
    # fresh compile into the timed region (plus the usual session warmup).
    # converge=False makes the "chains did not converge" warning expected
    # here — suppress it so the bench's JSON line stays the only output.
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        gp.derive_posteriors(initial_chain_params=init, max_steps=steps, converge=False, seed=11)
        start = time.perf_counter()
        gp.derive_posteriors(initial_chain_params=init, max_steps=steps, converge=False, seed=12)
        elapsed = time.perf_counter() - start
    return {
        "derive_posteriors_4k_seconds": round(elapsed, 2),
        "derive_posteriors_steps": steps,
        "derive_posteriors_walkers": walkers,
    }


def _lrt_512_measured_seconds(t, nsims=512):
    """MEASURED end-to-end Protassov LRT wall-clock (not chunk-scaled):
    one real ``protassov_lrt`` call — observed fits (two models, 32
    walkers, up to 10k steps), 512 posterior-predictive simulations
    generated and refit with both kernels (12 walkers x 500 steps), the
    T statistic and p-value — on the benchmarks/lrt_10k.py scenario
    (DRW-true observed data at N=5k).  Complements the chunk-scaled
    ``bootstrap_10k_seconds`` with a first-class measured pipeline
    number (round-6 measured: warm ~33-45 s on one v5e chip; the 10k
    run is tracked separately by benchmarks/lrt_10k.py).
    """
    import warnings

    from mind_the_gaps_tpu import GappyLightcurve
    from mind_the_gaps_tpu.kernels import DampedRandomWalk, Lorentzian
    from mind_the_gaps_tpu.lrt import protassov_lrt

    t = np.asarray(t)
    n = len(t)
    # observed data = exact DRW(=OU) realization + noise, as in
    # benchmarks/lrt_10k.py:56-69, so both observed fits are well-posed
    rng = np.random.default_rng(0)
    rng.uniform(2.0, 8.0, n)  # keep the stream aligned with lrt_10k.py
    S0, w0 = np.exp(1.0), np.exp(-3.0)
    y = np.empty(n)
    y[0] = rng.normal(0.0, np.sqrt(S0))
    phi = np.exp(-w0 * np.diff(t))
    innov = rng.normal(0.0, np.sqrt(S0 * (1.0 - phi**2)))
    for i in range(1, n):
        y[i] = phi[i - 1] * y[i - 1] + innov[i - 1]
    dy = np.full(n, 0.3)
    y = y + 10.0 + rng.normal(0.0, dy)
    lc = GappyLightcurve(t, y, dy, exposures=1.0)

    null_kernel = DampedRandomWalk(log_S0=1.0, log_omega0=-3.0, bounds=[(-5, 10), (-8, 2)])
    alt_kernel = null_kernel + Lorentzian(
        log_S0=-1.0, log_Q=2.0, log_omega0=-2.0, bounds=[(-8, 5), (0, 6), (-5, 0)]
    )
    start = time.perf_counter()
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        result = protassov_lrt(
            lc, null_kernel, alt_kernel, nsims=nsims, seed=0,
            observed_max_steps=10_000, observed_walkers=32,
            sim_max_steps=500, sim_walkers=12, chunk=512,
        )
    elapsed = time.perf_counter() - start
    return {
        "lrt_512_measured_seconds": round(elapsed, 1),
        "lrt_512_t_obs": round(float(result.t_obs), 3),
        "lrt_512_p_value": float(result.p_value),
    }


def _e13_generation_rate(n_points=500, B=256):
    """Lognormal (E13) posterior-predictive generation rate at the
    tutorial-scale segment (~6.6k fine samples -> 8192 pow2 cut):
    the non-Gaussian bootstrap's generation-side cost."""
    from mind_the_gaps_tpu.kernels import DampedRandomWalk
    from mind_the_gaps_tpu.simulator import Simulator

    rng = np.random.default_rng(0)
    t = np.cumsum(rng.uniform(4.0, 9.0, n_points))
    kernel = DampedRandomWalk(log_S0=1.0, log_omega0=-3.0)
    theta0 = kernel.get_parameter_vector()
    sim = Simulator(
        lambda w: np.asarray(kernel.get_psd(jnp.asarray(w), jnp.asarray(theta0))),
        t, exposures=1.0, mean=10.0, pdf="lognormal", extension_factor=2, max_iter=400,
    )
    omega = jnp.asarray(sim.omega)
    thetas = theta0[None, :] + 0.15 * rng.standard_normal((B, 2))

    @jax.jit
    def psd_batch(ths):
        def one(th):
            v = kernel.get_psd(omega[1:], th)
            return jnp.concatenate([jnp.zeros((1,), v.dtype), v])
        return jax.vmap(one)(ths)

    psd_b = psd_batch(jnp.asarray(thetas))
    out = sim.simulate_batch(jax.random.key(1), psd_b)
    float(jnp.sum(out))  # compile + warmup
    start = time.perf_counter()
    out = sim.simulate_batch(jax.random.key(2), psd_b)
    float(jnp.sum(out))
    elapsed = time.perf_counter() - start
    return {"e13_lognormal_lcs_per_sec": round(B / elapsed, 1)}


if __name__ == "__main__":
    main()
