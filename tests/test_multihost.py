"""True multi-process (jax.distributed) execution of the shard_map
bootstrap path.

The reference's only parallelism is multiprocessing.Pool
(gpmodelling.py:245,511); the pod-scale analog here is multi-host
jax.distributed over DCN.  This test spawns TWO OS processes, each
owning 4 virtual CPU devices, initializes the distributed runtime, and
runs the explicit-SPMD bootstrap program
(lrt._make_batched_max_loglike(mesh=...) — shard_map with per-shard RNG
fold_in and no collectives) over the resulting 8-device global mesh.
Every process feeds only its local shard of the global batch
(jax.make_array_from_callback); the gathered per-simulation results must
be IDENTICAL to the single-process 8-device run of the same program —
the per-shard RNG streams depend only on mesh position, not on the
process layout.
"""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import jax

_CHILD = r"""
import json, sys
import numpy as np

pid, nproc, port, outfile = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]

import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)
jax.distributed.initialize(
    coordinator_address=f"localhost:{port}", num_processes=nproc, process_id=pid
)

import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental import multihost_utils

from mind_the_gaps_tpu.kernels import DampedRandomWalk
from mind_the_gaps_tpu.lrt import _make_batched_max_loglike

devices = sorted(jax.devices(), key=lambda d: d.id)
assert len(devices) == 4 * nproc, devices
assert len(jax.local_devices()) == 4

mesh = Mesh(np.array(devices), ("batch",))
sharding = NamedSharding(mesh, P("batch"))

# deterministic global problem, identical in every process
rng = np.random.default_rng(0)
n_points, n_sims, walkers, steps = 48, 16, 8, 5
t = np.cumsum(rng.uniform(1.0, 3.0, n_points))
ys = rng.normal(5.0, 1.0, (n_sims, n_points))
diags = np.full((n_sims, n_points), 0.04)
kernel = DampedRandomWalk(log_S0=1.0, log_omega0=-2.0, bounds=[(-5, 10), (-8, 2)])
theta0 = jnp.asarray(kernel.get_parameter_vector())

# each process materializes ONLY its addressable shards of the batch
gys = jax.make_array_from_callback(ys.shape, sharding, lambda idx: ys[idx])
gdiags = jax.make_array_from_callback(diags.shape, sharding, lambda idx: diags[idx])

runner = _make_batched_max_loglike(kernel, t, n_steps=steps, walkers=walkers, mesh=mesh)
cache_dir = sys.argv[5] if len(sys.argv) > 5 else ""
if cache_dir:
    # pod-warm-start path: lower through the exported-program cache (the
    # mechanism ChunkFitter._lowered_runner uses under a mesh) — a warm
    # pod process deserializes the pre-traced artifact instead of
    # re-tracing the program
    import os as _os

    _os.environ["MTG_TPU_PROGRAM_CACHE"] = cache_dir
    from mind_the_gaps_tpu.program_cache import lower_via_cache

    sig = f"multihost_chunk|w={walkers}|s={steps}|mesh={tuple(mesh.shape.items())}"
    exec_fn = lower_via_cache(
        sig, runner, (jax.random.key(0), gys, gdiags, theta0, 0.1)
    ).compile()
    best_lp, best_x = exec_fn(jax.random.key(0), gys, gdiags, theta0, 0.1)
else:
    best_lp, best_x = runner(jax.random.key(0), gys, gdiags, theta0, 0.1)

full_lp = np.asarray(multihost_utils.process_allgather(best_lp, tiled=True))
full_x = np.asarray(multihost_utils.process_allgather(best_x, tiled=True))
assert full_lp.shape == (n_sims,)
if pid == 0:
    with open(outfile, "w") as fh:
        json.dump({"best_lp": full_lp.tolist(), "best_x": full_x.tolist()}, fh)
jax.distributed.shutdown()
"""


_CHILD_E13 = r"""
import json, sys
import numpy as np

pid, nproc, port, outfile = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]

import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)
jax.distributed.initialize(
    coordinator_address=f"localhost:{port}", num_processes=nproc, process_id=pid
)

import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental import multihost_utils

from mind_the_gaps_tpu.kernels import DampedRandomWalk
from mind_the_gaps_tpu.simulator import Simulator

devices = sorted(jax.devices(), key=lambda d: d.id)
assert len(devices) == 4 * nproc, devices
mesh = Mesh(np.array(devices), ("batch",))
sharding = NamedSharding(mesh, P("batch", None))

# deterministic global problem, identical in every process (the
# reference's generation Pool fan-out, gpmodelling.py:511)
rng = np.random.default_rng(0)
n_points, n_sims = 64, 16
t = np.cumsum(rng.uniform(1.0, 3.0, n_points))
kernel = DampedRandomWalk(log_S0=1.0, log_omega0=-2.0)
theta0 = np.asarray(kernel.get_parameter_vector())
sim = Simulator(
    lambda w: np.asarray(kernel.get_psd(jnp.asarray(w), jnp.asarray(theta0))),
    t, exposures=0.5, mean=10.0, pdf="Lognormal", extension_factor=1.2,
    max_iter=50,
)
omega = np.asarray(sim.omega)
thetas = theta0[None, :] + 0.1 * rng.standard_normal((n_sims, kernel.ndim))
psd_b = np.stack([
    np.concatenate([[0.0], np.asarray(kernel.get_psd(jnp.asarray(omega[1:]), jnp.asarray(th)))])
    for th in thetas
])

# each process materializes ONLY its addressable shards of the PSD
# batch; the E13 lock-step while-loop's convergence test becomes a
# global cross-process reduce GSPMD inserts
gpsd = jax.make_array_from_callback(psd_b.shape, sharding, lambda idx: psd_b[idx])
rates = sim.simulate_batch(jax.random.key(1), gpsd, warn_nonconverged=False)

# the generated lightcurves must come back PARTITIONED (each process
# computed only its sims), not replicated
local = [s.data.shape for s in rates.addressable_shards]
assert len(local) == 4 and all(sh == (n_sims // (4 * nproc), len(t)) for sh in local), local
nonconv = sim.report_nonconverged(warn=False)  # replicated-scalar fetch

full = np.asarray(multihost_utils.process_allgather(rates, tiled=True))
assert full.shape == (n_sims, len(t))
if pid == 0:
    with open(outfile, "w") as fh:
        json.dump({"rates": full.tolist(), "nonconv": int(nonconv)}, fh)
jax.distributed.shutdown()
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _spawn_pair(outfile, cache_dir: str = "", script: str = _CHILD):
    """Run the 2-process distributed child pair; return pid-0's result."""
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env.pop("XLA_FLAGS", None)
    argv_tail = [str(port), str(outfile)] + ([cache_dir] if cache_dir else [])
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", script, str(pid), "2"] + argv_tail,
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=420)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"child failed:\n{out[-3000:]}"
    with open(outfile) as fh:
        return json.load(fh)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs the 8-device CPU mesh")
def test_two_process_distributed_matches_single_process(tmp_path):
    dist = _spawn_pair(tmp_path / "dist_result.json")
    dist_lp = np.asarray(dist["best_lp"])
    dist_x = np.asarray(dist["best_x"])

    # single-process 8-device run of the IDENTICAL program
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from mind_the_gaps_tpu.kernels import DampedRandomWalk
    from mind_the_gaps_tpu.lrt import _make_batched_max_loglike

    devices = sorted(jax.devices(), key=lambda d: d.id)[:8]
    mesh = Mesh(np.array(devices), ("batch",))
    sharding = NamedSharding(mesh, P("batch"))
    rng = np.random.default_rng(0)
    n_points, n_sims, walkers, steps = 48, 16, 8, 5
    t = np.cumsum(rng.uniform(1.0, 3.0, n_points))
    ys = rng.normal(5.0, 1.0, (n_sims, n_points))
    diags = np.full((n_sims, n_points), 0.04)
    kernel = DampedRandomWalk(log_S0=1.0, log_omega0=-2.0, bounds=[(-5, 10), (-8, 2)])
    theta0 = jnp.asarray(kernel.get_parameter_vector())
    gys = jax.device_put(jnp.asarray(ys), sharding)
    gdiags = jax.device_put(jnp.asarray(diags), sharding)
    runner = _make_batched_max_loglike(kernel, t, n_steps=steps, walkers=walkers, mesh=mesh)
    ref_lp, ref_x = runner(jax.random.key(0), gys, gdiags, theta0, 0.1)

    # per-shard RNG is a pure function of mesh position: the 2-process
    # run must reproduce the single-process run exactly
    np.testing.assert_allclose(dist_lp, np.asarray(ref_lp), rtol=0, atol=1e-10)
    np.testing.assert_allclose(dist_x, np.asarray(ref_x), rtol=0, atol=1e-10)
    assert np.all(np.isfinite(dist_lp))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs the 8-device CPU mesh")
def test_two_process_e13_generation_matches_single_process(tmp_path):
    """The reference's OTHER Pool fan-out is posterior-predictive
    generation (gpmodelling.py:511); its non-Gaussian (E13) branch runs
    the lock-step PDF-adjustment while-loop.  Across 2 processes the
    loop's convergence test is a cross-process reduce — the generated
    lightcurves must still be BIT-IDENTICAL to the single-process
    8-device run (per-sim randomness keys off the split key, not the
    process layout)."""
    dist = _spawn_pair(tmp_path / "e13_result.json", script=_CHILD_E13)
    dist_rates = np.asarray(dist["rates"])

    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from mind_the_gaps_tpu.kernels import DampedRandomWalk
    from mind_the_gaps_tpu.simulator import Simulator

    rng = np.random.default_rng(0)
    n_points, n_sims = 64, 16
    t = np.cumsum(rng.uniform(1.0, 3.0, n_points))
    kernel = DampedRandomWalk(log_S0=1.0, log_omega0=-2.0)
    theta0 = np.asarray(kernel.get_parameter_vector())
    sim = Simulator(
        lambda w: np.asarray(kernel.get_psd(jnp.asarray(w), jnp.asarray(theta0))),
        t, exposures=0.5, mean=10.0, pdf="Lognormal", extension_factor=1.2,
        max_iter=50,
    )
    omega = np.asarray(sim.omega)
    thetas = theta0[None, :] + 0.1 * rng.standard_normal((n_sims, kernel.ndim))
    psd_b = np.stack([
        np.concatenate([[0.0], np.asarray(kernel.get_psd(jnp.asarray(omega[1:]), jnp.asarray(th)))])
        for th in thetas
    ])

    devices = sorted(jax.devices(), key=lambda d: d.id)[:8]
    mesh = Mesh(np.array(devices), ("batch",))
    gpsd = jax.device_put(jnp.asarray(psd_b), NamedSharding(mesh, P("batch", None)))
    ref_rates = sim.simulate_batch(jax.random.key(1), gpsd, warn_nonconverged=False)
    ref_nonconv = sim.report_nonconverged(warn=False)

    assert dist_rates.shape == (n_sims, n_points)
    assert np.all(np.isfinite(dist_rates))
    np.testing.assert_array_equal(dist_rates, np.asarray(ref_rates))
    assert dist["nonconv"] == ref_nonconv


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs the 8-device CPU mesh")
def test_pod_warm_start_adds_zero_trace_work(tmp_path):
    """Pod-ready warm start (round 4): the exported-program cache covers
    MESH programs, so a restarted pod job deserializes pre-traced
    artifacts instead of re-tracing.

    Acceptance: run the 2-process distributed bootstrap twice against
    one fresh program-cache dir.  The first job exports the artifact(s);
    the second job must add ZERO entries and rewrite none (same files,
    same mtimes — i.e. it loaded, it did not re-export), and its results
    must be bit-identical."""
    cache_dir = str(tmp_path / "programs")

    r1 = _spawn_pair(tmp_path / "r1.json", cache_dir=cache_dir)
    arts = sorted(os.listdir(cache_dir))
    assert any(a.endswith(".jaxprog") for a in arts), (
        "cold pod job exported no mesh artifacts"
    )
    mtimes = {a: os.path.getmtime(os.path.join(cache_dir, a)) for a in arts}

    r2 = _spawn_pair(tmp_path / "r2.json", cache_dir=cache_dir)
    arts2 = sorted(os.listdir(cache_dir))
    assert arts2 == arts, f"warm pod job changed the artifact set: {arts} -> {arts2}"
    for a in arts:
        assert os.path.getmtime(os.path.join(cache_dir, a)) == mtimes[a], (
            f"warm pod job re-exported {a} (cache key unstable across jobs)"
        )
    np.testing.assert_array_equal(np.asarray(r1["best_lp"]), np.asarray(r2["best_lp"]))
    np.testing.assert_array_equal(np.asarray(r1["best_x"]), np.asarray(r2["best_x"]))
