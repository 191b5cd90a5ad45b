"""Mesh-sharded retrieval evaluation.

The LLM-framework long-context trick applied to retrieval (SURVEY §5.7):
the query×gallery distance matrix is the "sequence"; the gallery axis is
sharded over the mesh, queries are replicated, and XLA's SPMD partitioner
turns the top-k/metric reductions into ICI collectives.  Replaces the
reference's faiss ``index_cpu_to_all_gpus`` sharding (get_knn.py:41-49).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from irw_tpu.ops.metrics import compute_retrieval_metrics
from irw_tpu.parallel.mesh import make_mesh, pad_to_multiple


def sharded_retrieval_metrics(
    query,
    query_labels,
    gallery,
    gallery_labels,
    mesh=None,
    axis_name: str = "data",
    **metric_kwargs,
):
    """compute_retrieval_metrics with the gallery sharded over the mesh.

    The gallery (and its labels) are padded to a mesh multiple with
    impossible labels so padded rows are never relevant and rank last.
    """
    mesh = mesh or make_mesh(axis_name=axis_name)
    n_dev = mesh.devices.size

    gallery = np.asarray(gallery)
    gallery_labels = np.asarray(gallery_labels)
    g_pad, n_real = pad_to_multiple(gallery, n_dev)
    if gallery_labels.ndim == 1:
        pad_labels = np.full(g_pad.shape[0] - n_real, -999_999, gallery_labels.dtype)
        gl_pad = np.concatenate([gallery_labels, pad_labels])
    else:
        gl_pad, _ = pad_to_multiple(gallery_labels, n_dev)  # zero rows: never relevant

    shard = NamedSharding(mesh, P(axis_name))
    g_sharded = jax.device_put(g_pad, shard)
    gl_sharded = jax.device_put(gl_pad, shard)
    valid = jax.device_put(np.arange(g_pad.shape[0]) < n_real, shard)
    repl = NamedSharding(mesh, P())
    q = jax.device_put(np.asarray(query), repl)
    ql = jax.device_put(np.asarray(query_labels), repl)

    return compute_retrieval_metrics(
        q, ql, g_sharded, gl_sharded, gallery_valid=valid, **metric_kwargs
    )
