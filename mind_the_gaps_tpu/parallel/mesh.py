"""Mesh / sharding helpers.

The natural parallel axes of this workload are pure batch axes —
bootstrap simulations x walkers (SURVEY.md §2.9-bis): there is no
cross-example communication in a likelihood sweep, so the right
multi-chip strategy is data parallelism over a 1-D mesh: shard the
simulation axis with NamedSharding and let XLA partition the whole
scan/FFT program; the only collectives are the trivial gathers of
per-simulation scalars at the end.
"""
from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["default_mesh", "shard_batch", "pad_to_multiple"]


def default_mesh(axis_name: str = "batch", devices=None) -> Mesh:
    """1-D mesh over all available devices."""
    devices = jax.devices() if devices is None else devices
    return Mesh(np.array(devices), (axis_name,))


def pad_to_multiple(x, multiple: int, axis: int = 0):
    """Pad axis 0 so its length divides ``multiple``; returns (padded, n)."""
    n = x.shape[axis]
    rem = (-n) % multiple
    if rem == 0:
        return x, n
    pad_widths = [(0, 0)] * x.ndim
    pad_widths[axis] = (0, rem)
    return np.pad(np.asarray(x), pad_widths, mode="edge"), n


def shard_batch(x, mesh: Mesh, axis_name: str = "batch"):
    """Place an array with its leading axis sharded over the mesh."""
    spec = P(axis_name, *([None] * (np.ndim(x) - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec))
