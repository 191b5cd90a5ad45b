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


def make_mesh_2d(devices=None, model_parallel: int = 1,
                 axis_names=("data", "model")) -> Mesh:
    """A (data × model) mesh: the trailing (fastest-varying, ICI-adjacent)
    device axis carries the model/tensor dimension so tp collectives ride
    the shortest links."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n % model_parallel != 0:
        raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
    grid = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, axis_names)


def make_mesh_3d(devices=None, band_parallel: int = 1, model_parallel: int = 1,
                 axis_names=("data", "band", "model")) -> Mesh:
    """A (data × band × model) mesh.  The trailing axes are ICI-adjacent:
    tensor-parallel psums ride the shortest links, the band all_gather the
    next ring out, and data-parallel gradient psums the remainder."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    inner = band_parallel * model_parallel
    if n % inner != 0:
        raise ValueError(
            f"{n} devices not divisible by band_parallel×model_parallel={inner}")
    grid = np.asarray(devices).reshape(n // inner, band_parallel, model_parallel)
    return Mesh(grid, axis_names)


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
    the batch size must divide the mesh (losses must not see pad rows).

    When the mesh carries a live ``band`` axis (band parallelism,
    parallel/band.py), subband image stacks (B, S, H, W, C) are co-sharded
    on their band dimension so each shard feeds its local branch."""
    n_shards = mesh.shape[axis_name]  # only the batch axis's mesh extent matters
    sharding = batch_sharding(mesh, axis_name)
    band_n = dict(zip(mesh.axis_names, mesh.devices.shape)).get("band", 1)
    out = {}
    for key, value in batch.items():
        value = np.asarray(value)
        assert value.shape[0] % n_shards == 0, (
            f"train batch dim {value.shape[0]} not divisible by mesh axis "
            f"{axis_name}={n_shards}"
        )
        if band_n > 1 and value.ndim >= 5 and value.shape[1] % band_n == 0:
            out[key] = jax.device_put(
                value, NamedSharding(mesh, P(axis_name, "band")))
        else:
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
