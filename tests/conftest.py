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

if os.environ.get("MTG_TPU_TESTS"):
    # on-chip mode: keep the default (axon TPU) backend so the
    # @pytest.mark.tpu tests exercise real Mosaic executables:
    #   MTG_TPU_TESTS=1 python -m pytest tests -m tpu
    # (the CPU-suite tests that need float64/8 devices are skipped by
    # their own backend/device-count guards)
    import jax  # noqa: E402, F401
else:
    os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

    import jax  # noqa: E402

    jax.config.update("jax_platforms", "cpu")


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "tpu: parity tests that run Mosaic executables on a real TPU chip "
        "(skipped on CPU; run with MTG_TPU_TESTS=1 python -m pytest tests -m tpu)",
    )


def pytest_collection_modifyitems(config, items):
    import pytest

    if os.environ.get("MTG_TPU_TESTS"):
        return
    skip_tpu = pytest.mark.skip(reason="needs the real TPU backend (MTG_TPU_TESTS=1)")
    for item in items:
        if "tpu" in item.keywords:
            item.add_marker(skip_tpu)
