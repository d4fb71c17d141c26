"""mind_the_gaps_tpu — TPU-native (quasi-)periodicity detection in
irregularly-sampled astronomical lightcurves.

A ground-up JAX/XLA re-design of the capabilities of
``andresgur/mind_the_gaps`` (GP modelling with celerite-style kernels,
TK95/E13 lightcurve simulation, ensemble MCMC, Protassov et al. 2002
posterior-predictive likelihood-ratio tests), built TPU-first:

- the celerite O(N) semiseparable Cholesky factorization is a pure-JAX
  ``lax.scan`` / associative-scan kernel with autodiff support,
- the affine-invariant ensemble sampler is fully vectorized so
  (simulations x walkers) log-likelihoods evaluate as one batched kernel,
- the Timmer & Koenig / Emmanoulopoulos simulators run as batched
  on-device FFTs,
- batch axes (walkers, bootstrap simulations, kernel hypotheses) shard
  across a ``jax.sharding.Mesh`` via ``shard_map``/``NamedSharding``.

Precision: GP likelihood parity with celerite requires float64
(see reference gpmodelling.py:54 — celerite computes in double).  Importing
this package enables JAX x64 mode unless ``MTG_TPU_X64=0`` is set.
"""
from __future__ import annotations

import os

import jax

if os.environ.get("MTG_TPU_X64", "1") != "0":
    jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: the production pipeline re-runs the same
# few programs (observed-fit sampler, bootstrap runners) across
# processes, and on a remote-compile TPU runtime each compile costs tens
# of seconds (measured: a fresh-process derive_posteriors drops 42 s ->
# 24 s with a warm cache).  Only set when the user hasn't configured a
# cache; disable with MTG_TPU_NO_COMPILE_CACHE=1.
def _host_isa_fingerprint() -> str:
    """Short stable fingerprint of the host CPU's ISA feature set.

    XLA:CPU AOT executables embed the compile machine's target features;
    loading one on a host with a *different* ISA can SIGILL (observed as
    cpu_aot_loader "machine type doesn't match" errors when a cache
    directory written on one machine generation is reused on another).
    Partitioning the default cache directory by the real cpuinfo flags
    keeps homogeneous pools sharing a cache while making cross-ISA reuse
    impossible.  TPU executables are machine-independent, so the split
    only costs a re-warm when the driver host's CPU generation changes.

    The basis includes the CPU model name and core count, not just the
    flag set: XLA's AOT tuning pseudo-features (``prefer-no-gather`` /
    ``prefer-no-scatter``) follow the detected CPU model, so two hosts
    with identical cpuinfo flags but different models still emit
    incompatible AOT results (observed 2026-08-19 as cpu_aot_loader
    feature-mismatch errors on artifacts written by a same-flags host).
    """
    import platform
    import zlib

    flags = model = ""
    try:
        with open("/proc/cpuinfo") as fh:
            for line in fh:
                if line.startswith("flags") and not flags:
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                elif line.startswith("model name") and not model:
                    model = line.split(":", 1)[1].strip()
                if flags and model:
                    break
    except OSError:
        pass
    basis = f"{platform.machine()}|{model}|{os.cpu_count()}|{flags}".encode()
    return f"{zlib.crc32(basis) & 0xFFFFFFFF:08x}"


if (
    os.environ.get("MTG_TPU_NO_COMPILE_CACHE", "0") != "1"
    and not os.environ.get("JAX_COMPILATION_CACHE_DIR")
    and not jax.config.jax_compilation_cache_dir
):
    _cache_dir = os.path.join(
        os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
        "mind_the_gaps_tpu", "jax", f"host-{_host_isa_fingerprint()}",
    )
    try:
        os.makedirs(_cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except OSError:
        pass

__version__ = "0.1.0"

from mind_the_gaps_tpu.lightcurves import (  # noqa: E402
    GappyLightcurve,
    SimpleLightcurve,
    SwiftLightcurve,
    FermiLightcurve,
)

__all__ = [
    "GappyLightcurve",
    "SimpleLightcurve",
    "SwiftLightcurve",
    "FermiLightcurve",
    "__version__",
]


def __getattr__(name):
    # lazy: avoid importing the heavy inference stack at package import
    if name == "GPModelling":
        from mind_the_gaps_tpu.gpmodelling import GPModelling

        return GPModelling
    if name == "AutocorrError":
        from mind_the_gaps_tpu.gpmodelling import AutocorrError

        return AutocorrError
    if name == "Simulator":
        from mind_the_gaps_tpu.simulator import Simulator

        return Simulator
    if name == "protassov_lrt":
        from mind_the_gaps_tpu.lrt import protassov_lrt

        return protassov_lrt
    raise AttributeError(f"module 'mind_the_gaps_tpu' has no attribute {name!r}")
