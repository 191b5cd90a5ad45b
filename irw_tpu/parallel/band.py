"""Band parallelism: shard the vmapped subband-branch axis over devices.

The flagship 4-branch models run one ``nn.vmap``-ed backbone over the
wavelet-band axis (irw_tpu/models/multi_dino.py) — every branch parameter
leaf carries a leading band dimension (flax lifts the module under a
``Vmap<Cls>_N`` path component).  That axis is architecture-given model
parallelism: placing one branch per device shard makes the entire backbone
forward/backward band-local — zero collectives until the fusion head
consumes all bands (XLA inserts one all_gather there, and the matching
scatter in backward).  Branch parameter gradients and Adam moments stay
band-local too, so optimizer updates run fully sharded.

Composes with the Megatron-style tensor-parallel specs (parallel/tp.py):
band takes the leading (stack) axis, tp rules address trailing axes via
negative positions — a (4, D, H, hd) q-kernel can shard band×head at once
on a (data × band × model) mesh.

The reference has no counterpart — its only parallelism was one-process
``nn.DataParallel`` (/root/reference/run.py:132-134).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from irw_tpu.parallel.tp import _path_names, tp_leaf_spec


def is_band_stacked(path_names) -> bool:
    """True for leaves under a flax-lifted ``nn.vmap`` module (the band
    stack): their leading axis is the branch/band dimension."""
    return any(name.startswith("Vmap") for name in path_names)


def band_tp_leaf_spec(path_names, ndim: int, band_axis: str | None = None,
                      model_axis: str | None = None) -> P:
    """PartitionSpec combining the band stack rule (leading axis) with the
    tensor-parallel suffix rules (trailing axes)."""
    spec = [None] * ndim
    if band_axis and ndim >= 1 and is_band_stacked(path_names):
        spec[0] = band_axis
    if model_axis:
        tp = tuple(tp_leaf_spec(path_names, ndim, model_axis))
        for i, name in enumerate(tp):
            if name == model_axis and spec[i] is None:
                spec[i] = model_axis
    return P(*spec)


def mesh_shardings(tree, mesh: Mesh, band_axis: str | None = None,
                   model_axis: str | None = None):
    """NamedShardings for a pytree (params, TrainState, Adam moments —
    moment paths mirror param paths, so the same rules apply) under any mix
    of band and tensor parallelism; unmatched leaves are replicated.  Data
    parallelism stays an *activation* concern (shard_train_batch)."""

    def one(path, leaf):
        ndim = getattr(leaf, "ndim", 0)
        if ndim == 0:
            return NamedSharding(mesh, P())
        return NamedSharding(
            mesh, band_tp_leaf_spec(_path_names(path), ndim, band_axis,
                                    model_axis))

    return jax.tree_util.tree_map_with_path(one, tree)


def validate_band_divisibility(params, mesh: Mesh, band_axis: str = "band") -> None:
    """Fail fast when the model has no vmapped band stack, or a stack's
    leading dim does not divide the band mesh axis (e.g. 4 bands on 3)."""
    size = mesh.shape[band_axis]
    found = []

    def check(path, leaf):
        names = _path_names(path)
        ndim = getattr(leaf, "ndim", 0)
        if ndim >= 1 and is_band_stacked(names):
            found.append(leaf.shape[0])
            if leaf.shape[0] % size != 0:
                raise ValueError(
                    f"band-parallel axis size {size} does not divide the "
                    f"band stack dim {leaf.shape[0]} of {'/'.join(names)}")

    jax.tree_util.tree_map_with_path(check, params)
    if not found:
        raise ValueError(
            "band parallelism requires a vmapped multi-branch model "
            "(no Vmap* band stack found in the param tree)")
