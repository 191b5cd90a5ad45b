"""ZeRO-style fully-sharded data parallelism (param + optimizer-state
sharding over the ``data`` mesh axis).

The reference had no equivalent (its only parallelism was single-process
``nn.DataParallel``, run.py:132-134).  On TPU this is pure sharding
annotation: each large parameter leaf (and its Adam mu/nu moments, which
mirror the param tree) is sharded over the data axis on its largest evenly
divisible dimension; GSPMD then materialises the standard FSDP schedule —
all-gather the shard group on use in forward/backward, reduce-scatter the
gradients, and run the optimizer update on each chip's shard only.  No
hand-written collectives.

Composition: pass ``base_spec_fn=tp_leaf_spec`` (or the band variant) and
FSDP places the ``data`` axis on a dimension the tensor-parallel spec left
free, so fsdp×tp×band meshes compose from the same rule set.

Why this matters here: unfrozen flagship training is HBM-bound — batch 96
needs full rematerialisation because ~13.5 GB of scan activations plus
replicated AdamW moments crowd the chip (BASELINE.md round 2).  Sharding
params+moments 8-way frees ~7/8 of that state per chip.
"""

from __future__ import annotations

import math

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from irw_tpu.parallel.tp import _path_names


def fsdp_leaf_spec(
    shape,
    axis_size: int,
    axis: str = "data",
    min_size: int = 1 << 13,
    base_spec: P | None = None,
) -> P:
    """PartitionSpec for one leaf: shard the largest dimension that is
    evenly divisible by the data-axis size and not already taken by the
    base (tensor/band) spec.  Small leaves (< ``min_size`` elements —
    LayerNorm scales, biases, counters) stay replicated: their all-gather
    latency would cost more than the memory saved."""
    ndim = len(shape)
    spec = list(base_spec) if base_spec is not None else []
    spec = spec + [None] * (ndim - len(spec))
    if ndim == 0 or math.prod(shape) < min_size:
        return P(*spec)
    for i in sorted(range(ndim), key=lambda i: -shape[i]):
        if spec[i] is None and shape[i] % axis_size == 0 and shape[i] >= axis_size:
            spec[i] = axis
            return P(*spec)
    return P(*spec)


def fsdp_shardings(
    tree,
    mesh: Mesh,
    axis: str = "data",
    min_size: int = 1 << 13,
    base_spec_fn=None,
):
    """NamedShardings for an arbitrary pytree (params, optimizer moments, a
    full TrainState) under FSDP.  ``base_spec_fn(path_names, ndim)`` may
    supply a tensor-parallel base spec to compose with."""
    size = mesh.shape[axis]

    def one(path, leaf):
        ndim = getattr(leaf, "ndim", 0)
        shape = getattr(leaf, "shape", ())
        base = base_spec_fn(_path_names(path), ndim) if base_spec_fn else None
        return NamedSharding(
            mesh, fsdp_leaf_spec(shape, size, axis, min_size, base)
        )

    return jax.tree_util.tree_map_with_path(one, tree)


def bytes_per_device(tree, shardings, mesh: Mesh) -> int:
    """Per-device bytes of a pytree under the given sharding pytree —
    the number the multichip dryrun prints to attest state actually
    shrinks with FSDP on."""
    total = 0
    for leaf, sh in zip(
        jax.tree_util.tree_leaves(tree), jax.tree_util.tree_leaves(shardings)
    ):
        if not hasattr(leaf, "nbytes"):
            continue
        shard_count = 1
        spec = sh.spec if isinstance(sh, NamedSharding) else P()
        for name in spec:
            if name is None:
                continue
            names = name if isinstance(name, tuple) else (name,)
            for n in names:
                shard_count *= mesh.shape[n]
        total += leaf.nbytes // shard_count
    return total
