"""Device mesh + sharding utilities (data-parallel over ICI).

Model sizes here (10-100M params) fit one chip, so the design point is pure
DP: batch axis sharded, params replicated, XLA's psum over ICI for gradients
(SURVEY.md section 2.3). Tensor/pipeline parallelism is deliberately not
implemented - see the same section for the rationale.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None, axis_name: str = DATA_AXIS) -> Mesh:
    """1-D mesh over the first n_devices (default: all)."""
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    assert n_devices <= len(devices), (n_devices, len(devices))
    mesh_devices = mesh_utils.create_device_mesh(
        (n_devices,), devices=devices[:n_devices]
    )
    return Mesh(mesh_devices, (axis_name,))


def batch_sharding(mesh: Mesh, ndim: int, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Shard dim 0 over the mesh, replicate the rest."""
    return NamedSharding(mesh, P(axis_name, *([None] * (ndim - 1))))


def shard_batch(x, mesh: Mesh, axis_name: str = DATA_AXIS):
    """Place a host array as a batch-sharded global device array."""
    return jax.device_put(x, batch_sharding(mesh, np.ndim(x), axis_name))


def stacked_batch_sharding(mesh: Mesh, ndim: int,
                           axis_name: str = DATA_AXIS) -> NamedSharding:
    """Shard dim 1 (batch) of a (K, B, ...) stack of K batches over the
    mesh; dim 0 is the steps-per-dispatch axis (scanned on device)."""
    return NamedSharding(mesh, P(None, axis_name, *([None] * (ndim - 2))))


def shard_stacked_batch(x, mesh: Mesh, axis_name: str = DATA_AXIS):
    """Place a (K, B, ...) host array with the batch dim sharded."""
    return jax.device_put(
        x, stacked_batch_sharding(mesh, np.ndim(x), axis_name))


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (params/opt state) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def pad_batch_to_devices(x: np.ndarray, n_devices: int):
    """Pad dim 0 to a multiple of n_devices; returns (padded, real_count)."""
    b = x.shape[0]
    rem = (-b) % n_devices
    if rem:
        pad = np.repeat(x[-1:], rem, axis=0)
        x = np.concatenate([x, pad], axis=0)
    return x, b
