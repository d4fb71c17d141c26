"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Tests exercise the multi-chip sharding path without TPU hardware (the
driver separately dry-run-compiles the multichip path via
__graft_entry__.dryrun_multichip).  CPU also gives native float64, which
the parity tests rely on.

Note: this environment's sitecustomize force-registers the 'axon' TPU
platform and overrides JAX_PLATFORMS, so we must select CPU via
jax.config *after* importing jax.
"""
import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
