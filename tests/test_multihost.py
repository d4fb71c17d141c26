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
best_lp, best_x = runner(jax.random.key(0), gys, gdiags, theta0, 0.1)

full_lp = np.asarray(multihost_utils.process_allgather(best_lp, tiled=True))
full_x = np.asarray(multihost_utils.process_allgather(best_x, tiled=True))
assert full_lp.shape == (n_sims,)
if pid == 0:
    with open(outfile, "w") as fh:
        json.dump({"best_lp": full_lp.tolist(), "best_x": full_x.tolist()}, fh)
jax.distributed.shutdown()
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs the 8-device CPU mesh")
def test_two_process_distributed_matches_single_process(tmp_path):
    port = _free_port()
    outfile = tmp_path / "dist_result.json"
    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # the children must NOT inherit the parent's 8-device XLA_FLAGS
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _CHILD, str(pid), "2", str(port), str(outfile)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
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
        dist = json.load(fh)
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
