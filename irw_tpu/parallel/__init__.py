"""Device-mesh parallelism (SURVEY §2.9 / §5.8).

The reference's only multi-device path was single-process
``nn.DataParallel`` (run.py:132-134).  Here parallelism is first-class JAX:
one ``jax.sharding.Mesh`` over all chips, batch-sharded train/eval steps,
``psum``-reduced gradients via sharding constraints (XLA inserts the
collectives), and a gallery-sharded distance matrix for evaluation.
"""

from irw_tpu.parallel.band import (
    band_tp_leaf_spec,
    mesh_shardings,
    validate_band_divisibility,
)
from irw_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    make_mesh_2d,
    make_mesh_3d,
    pad_to_multiple,
    replicated,
    shard_batch,
    shard_train_batch,
)
from irw_tpu.parallel.fsdp import bytes_per_device, fsdp_leaf_spec, fsdp_shardings
from irw_tpu.parallel.pp import gpipe, pp_apply_fn, pp_vit_forward, split_stages
from irw_tpu.parallel.tp import (
    tp_leaf_spec,
    tp_shardings,
    validate_tp_divisibility,
)

__all__ = [
    "make_mesh",
    "make_mesh_2d",
    "make_mesh_3d",
    "batch_sharding",
    "replicated",
    "shard_batch",
    "shard_train_batch",
    "pad_to_multiple",
    "tp_leaf_spec",
    "tp_shardings",
    "validate_tp_divisibility",
    "band_tp_leaf_spec",
    "mesh_shardings",
    "validate_band_divisibility",
    "gpipe",
    "pp_apply_fn",
    "pp_vit_forward",
    "split_stages",
    "fsdp_leaf_spec",
    "fsdp_shardings",
    "bytes_per_device",
]
