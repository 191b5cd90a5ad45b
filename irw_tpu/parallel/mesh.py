"""Mesh + sharding helpers.

Single axis ``data`` for the v5e-8 target: batch data-parallelism for
training, gallery sharding for eval.  Model/tensor axes can be added to the
mesh later without touching call sites (shardings are built from the mesh's
axis names).
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, axis_name: str = "data") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension over the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_to_multiple(array, multiple: int, axis: int = 0):
    """Pad axis to a multiple (for even sharding); returns (padded, n_real)."""
    n = array.shape[axis]
    pad = (-n) % multiple
    if pad == 0:
        return array, n
    widths = [(0, 0)] * array.ndim
    widths[axis] = (0, pad)
    return np.pad(np.asarray(array), widths), n


def shard_train_batch(batch: dict, mesh: Mesh, axis_name: str = "data") -> dict:
    """Shard a training batch (leading axis) over the mesh — no padding:
    the batch size must divide the mesh (losses must not see pad rows)."""
    n_dev = mesh.devices.size
    sharding = batch_sharding(mesh, axis_name)
    out = {}
    for key, value in batch.items():
        value = np.asarray(value)
        assert value.shape[0] % n_dev == 0, (
            f"train batch dim {value.shape[0]} not divisible by mesh size {n_dev}"
        )
        out[key] = jax.device_put(value, sharding)
    return out


def shard_batch(batch: dict, mesh: Mesh, axis_name: str = "data") -> dict:
    """Device-put a host batch with the leading axis sharded over the mesh.
    Pads the batch to a multiple of the mesh size, adding a ``valid`` mask."""
    n_dev = mesh.devices.size
    sharding = batch_sharding(mesh, axis_name)
    out = {}
    n_real = None
    for key, value in batch.items():
        padded, n_real = pad_to_multiple(np.asarray(value), n_dev, axis=0)
        out[key] = jax.device_put(padded, sharding)
    if n_real is not None and "valid" not in out:
        valid = np.arange(out[next(iter(out))].shape[0]) < n_real
        out["valid"] = jax.device_put(valid, sharding)
    return out
