"""Tensor-parallel partition specs for the model families.

Megatron-style sharding over a ``model`` mesh axis, expressed as
PartitionSpecs and left to XLA/GSPMD to lower into collectives (the
all-reduce after the attention out-projection and after the MLP second
matmul are inserted automatically — no hand-written comms):

- attention q/k/v projections: split the **head** axis — each shard
  computes a head subset end-to-end (scores, softmax, weighted values);
- attention out-projection: split its **input** (head) axis — partial
  products reduce across the axis (XLA inserts the psum);
- MLP first dense: split the **hidden** (output) axis;
- MLP second dense: split its **input** (hidden) axis — again a psum;
- everything else (LayerNorms, patch embed, CLS/pos tokens, heads,
  BatchNorm stats, loss proxies) replicated.

The rules key on path *suffixes*, so they apply uniformly to the raw param
tree, to optimizer moments (Adam mu/nu mirror the param tree), and to any
stacking the model adds in front — the ``nn.vmap`` band axis of the
4-branch flagship and the ``nn.scan`` depth axis both just prepend leading
dimensions, which the negative-axis specs ignore.

This replaces nothing in the reference — its only parallelism was
single-process ``nn.DataParallel`` (run.py:132-134); tensor parallelism is
TPU-native headroom for backbones that outgrow one chip's HBM.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _path_names(path) -> list[str]:
    names = []
    for entry in path:
        if hasattr(entry, "key"):
            names.append(str(entry.key))
        elif hasattr(entry, "name"):
            names.append(str(entry.name))
        elif hasattr(entry, "idx"):
            names.append(str(entry.idx))
        else:
            names.append(str(entry))
    return names


def tp_leaf_spec(path_names, ndim: int, axis: str = "model") -> P:
    """PartitionSpec for one leaf, from its path suffix and rank."""

    def at(neg_idx: int) -> P:
        pos = ndim + neg_idx
        if pos < 0:
            return P()
        spec = [None] * ndim
        spec[pos] = axis
        return P(*spec)

    if len(path_names) < 2:
        return P()
    leaf, parent = path_names[-1], path_names[-2]
    grand = path_names[-3] if len(path_names) >= 3 else ""

    # flax MultiHeadDotProductAttention (and the ViT Block's "attn"):
    # q/k/v kernels (..., D, H, hd), biases (..., H, hd); out kernel
    # (..., H, hd, D) reduces over the sharded head axis.
    if grand.startswith("attn") or grand.startswith("MultiHeadDotProductAttention"):
        if parent in ("query", "key", "value"):
            return at(-2)
        if parent == "out":
            return at(-3) if leaf == "kernel" else P()
        return P()

    # fused-QKV flash path: DenseGeneral(3, H, hd) named attn_qkv
    if parent == "attn_qkv":
        return at(-2)
    if parent == "attn_out":
        return P()  # plain Dense (D, D): keep replicated, psum upstream

    # MLP: Dense_0 (..., D, hidden) column-split; Dense_1 (..., hidden, D)
    # row-split (its bias stays replicated — it adds after the reduce).
    if grand.startswith("Mlp"):
        if parent == "Dense_0":
            return at(-1)
        if parent == "Dense_1":
            return at(-2) if leaf == "kernel" else P()
    return P()


def tp_shardings(tree, mesh: Mesh, axis: str = "model"):
    """NamedShardings for an arbitrary pytree (params, a full TrainState,
    optimizer moments …) under tensor parallelism.

    Leaves whose path suffix matches a rule get the split spec; everything
    else is replicated (data parallelism over the batch is carried by the
    *activation* shardings, not the state)."""

    def one(path, leaf):
        ndim = getattr(leaf, "ndim", 0)
        if ndim == 0:
            return NamedSharding(mesh, P())
        return NamedSharding(mesh, tp_leaf_spec(_path_names(path), ndim, axis))

    return jax.tree_util.tree_map_with_path(one, tree)


def validate_tp_divisibility(params, mesh: Mesh, axis: str = "model") -> None:
    """Fail fast if a sharded dimension does not divide by the model-axis
    size (e.g. 6 heads on a 4-way model axis)."""
    size = mesh.shape[axis]

    def check(path, leaf):
        ndim = getattr(leaf, "ndim", 0)
        if ndim == 0:
            return
        spec = tp_leaf_spec(_path_names(path), ndim, axis)
        for dim, name in zip(leaf.shape, spec):
            if name == axis and dim % size != 0:
                raise ValueError(
                    f"tensor-parallel axis size {size} does not divide dim "
                    f"{dim} of {'/'.join(_path_names(path))} {leaf.shape}"
                )

    jax.tree_util.tree_map_with_path(check, params)
