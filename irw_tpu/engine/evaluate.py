"""Retrieval evaluation (reference: main/engine/evaluate.py +
accuracy_calculator.py + get_knn.py).

Differences by design: embeddings stay on device (the reference accumulated
on CPU then shipped to faiss-GPU, evaluate.py:25-57 / get_knn.py:27-57);
the distance matrix + top-k run as chunked jit ops; metrics come from
:mod:`irw_tpu.ops.metrics`.  Split plumbing preserved: train/val/test
splits, query-vs-gallery dataset dicts, multi-level labels
(metrics suffixed ``_levelL``), ``same_source`` self-retrieval with
drop-self.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from irw_tpu.data.loader import EpochLoader
from irw_tpu.ops.metrics import compute_retrieval_metrics
from irw_tpu.utils import LOGGER


def compute_embeddings(
    apply_fn: Callable,
    variables,
    dataset,
    host_transform,
    device_transform,
    batch_size: int = 256,
    num_workers: int = 8,
    mesh=None,
):
    """Embed a whole dataset with the eval-mode forward.  Returns
    (embeddings [device], labels [numpy]).

    With >1 device (or an explicit ``mesh``) the batch axis is sharded over
    the mesh — the embedding sweep scales across chips (the reference's eval
    ran the net on one GPU and accumulated on CPU, evaluate.py:25-57)."""
    if mesh is None and jax.device_count() > 1:
        from irw_tpu.parallel import make_mesh

        mesh = make_mesh()
    if mesh is not None and batch_size % mesh.devices.size != 0:
        LOGGER.warning(
            f"eval batch_size {batch_size} not divisible by the "
            f"{mesh.devices.size}-device mesh — falling back to single-device "
            "embedding sweep (pick eval_bs as a mesh multiple to scale it)"
        )
        mesh = None

    order = np.arange(len(dataset))
    batches = [order[i : i + batch_size] for i in range(0, len(order), batch_size)]
    loader = EpochLoader(
        dataset, batches, host_transform, num_workers=num_workers, train=False
    )

    jitted = jax.jit(lambda v, x: apply_fn(v, x))
    data_sharding = repl = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        data_sharding = NamedSharding(mesh, P("data"))
        repl = NamedSharding(mesh, P())
        variables = jax.device_put(variables, repl)

    chunks = []
    for batch in loader:
        images = batch["image"]
        if images.shape[0] < batch_size:  # pad the tail to keep one jit shape
            pad = batch_size - images.shape[0]
            images = np.concatenate([images, np.zeros((pad,) + images.shape[1:], images.dtype)])
        if data_sharding is not None:
            images = jax.device_put(images, data_sharding)
        x = device_transform(images) if device_transform else jnp.asarray(images, jnp.float32) / 255.0
        out = jitted(variables, x)
        emb = out[0] if isinstance(out, tuple) else out
        chunks.append(emb[: batch["image"].shape[0]])
    embeddings = jnp.concatenate(chunks, axis=0)
    return embeddings, dataset.labels


def _looks_multilabel(labels: np.ndarray) -> bool:
    """Heuristic for 2-D label matrices with no explicit ``multi_label``
    flag: float dtype (VOC's 20-dim float targets) OR binary {0,1} values
    of any dtype are multi-label indicator vectors (dot-product relevance,
    accuracy_calculator.py:31-37); anything else is a multi-level class-id
    hierarchy (per-column equality).  Without the binary check, int8/bool
    0/1 matrices would be scored per-level where two images sharing the
    ABSENCE of a class (0 == 0) count as relevant."""
    if labels.dtype.kind == "f":
        return True
    u = np.unique(labels)
    return u.size <= 2 and bool(np.isin(u, (0, 1)).all())


def _metric_suite(query_emb, query_labels, gallery_emb, gallery_labels, cfg):
    """Run the metric suite per label level (GlobalEmbeddingSpaceTester's
    label_hierarchy support, evaluate.py:14-23)."""
    same_source = cfg.get("same_source", False)
    metric = cfg.get("distance_metric", "cosine")
    k = cfg.get("top_k", None)
    with_hash = metric == "hamming"

    ql = np.asarray(query_labels)
    gl = np.asarray(gallery_labels)
    multi_level = ql.ndim == 2 and not cfg.get("multi_label", _looks_multilabel(ql))
    levels = ql.shape[1] if multi_level else 1

    # with >1 device, shard the gallery axis of the ranking over the mesh —
    # the query×gallery distance matrix, top-k and metric reductions become
    # SPMD collectives instead of leaving n-1 chips idle
    use_mesh = jax.device_count() > 1 and not cfg.get("force_single_device")

    out = {}
    for level in range(levels):
        q = ql[:, level] if multi_level else ql
        g = gl[:, level] if multi_level else gl
        if use_mesh:
            from irw_tpu.parallel.eval_sharding import sharded_retrieval_metrics

            res = sharded_retrieval_metrics(
                query_emb,
                jnp.asarray(q),
                gallery_emb,
                jnp.asarray(g),
                metric=metric,
                k=k,
                same_source=same_source,
                with_hashing_stats=with_hash,
            )
        else:
            res = compute_retrieval_metrics(
                query_emb,
                jnp.asarray(q),
                gallery_emb,
                jnp.asarray(g),
                metric=metric,
                k=k,
                same_source=same_source,
                with_hashing_stats=with_hash,
                query_chunk=cfg.get("query_chunk", 512),
            )
        for name, value in res.items():
            if name.endswith("curve"):
                continue
            out[f"{name}_level{level}"] = value
    return out


def evaluate(
    apply_fn,
    variables,
    datasets,
    host_transform=None,
    device_transform=None,
    batch_size: int = 256,
    num_workers: int = 8,
    top_k=None,
    distance_metric: str = "cosine",
    multi_label: bool | None = None,
):
    """Evaluate retrieval quality, with one out-of-memory backoff.

    A mid-training eval runs on whatever HBM the resident train state and
    allocator fragmentation leave over; on a marginal-headroom chip the
    same shapes can pass ten evals and then RESOURCE_EXHAUST the next
    (observed on the VOC protocol: three runs died at an epoch-35 eval as
    sole chip owner).  Rather than kill a 35-epoch run, retry ONCE at half
    the embed batch and half the metric query chunk — smaller transients,
    identical results.
    """
    try:
        return _evaluate_once(
            apply_fn, variables, datasets, host_transform, device_transform,
            batch_size, num_workers, top_k, distance_metric, multi_label,
        )
    except Exception as e:  # jaxlib raises backend-specific RuntimeErrors
        if "RESOURCE_EXHAUSTED" not in repr(e):
            raise
        from irw_tpu.utils import LOGGER

        small_bs = max(batch_size // 2, 32)
        LOGGER.warning(
            f"eval RESOURCE_EXHAUSTED at batch {batch_size}; retrying once "
            f"at batch {small_bs} / query_chunk 256")
        return _evaluate_once(
            apply_fn, variables, datasets, host_transform, device_transform,
            small_bs, num_workers, top_k, distance_metric, multi_label,
            query_chunk=256,
        )


def _evaluate_once(
    apply_fn,
    variables,
    datasets,
    host_transform=None,
    device_transform=None,
    batch_size: int = 256,
    num_workers: int = 8,
    top_k=None,
    distance_metric: str = "cosine",
    multi_label: bool | None = None,
    query_chunk: int = 512,
):
    """One evaluation pass.

    ``datasets``: either a single dataset (self-retrieval with drop-self,
    the train/val splits of evaluate.py:101-135) or a
    ``{"query": ds, "gallery": ds}`` dict (InShop/hashing protocols).

    Returns a flat dict of metrics (suffixed ``_levelL``).
    """
    cfg = {"top_k": top_k, "distance_metric": distance_metric,
           "query_chunk": query_chunk}
    if multi_label is not None:
        cfg["multi_label"] = multi_label

    if isinstance(datasets, dict):
        q_emb, q_labels = compute_embeddings(
            apply_fn, variables, datasets["query"], host_transform, device_transform,
            batch_size, num_workers,
        )
        if datasets["gallery"] is datasets["query"]:
            g_emb, g_labels = q_emb, q_labels
        else:
            g_emb, g_labels = compute_embeddings(
                apply_fn, variables, datasets["gallery"], host_transform,
                device_transform, batch_size, num_workers,
            )
        if "distractor" in datasets:
            # distractor augmentation (evaluate.py:101-135): extra gallery
            # items with labels that never match any query
            d_emb, _ = compute_embeddings(
                apply_fn, variables, datasets["distractor"], host_transform,
                device_transform, batch_size, num_workers,
            )
            g_emb = jnp.concatenate([g_emb, d_emb], axis=0)
            gl = np.asarray(g_labels)
            if gl.ndim == 1:
                d_labels = np.full(d_emb.shape[0], -424242, gl.dtype)
            elif cfg.get("multi_label", _looks_multilabel(gl)):
                # all-zero indicator rows: dot-product relevance is 0 vs
                # every query
                d_labels = np.zeros((d_emb.shape[0], gl.shape[1]), gl.dtype)
            else:
                # multi-LEVEL class ids: zero would equal class 0 at every
                # level — use an impossible id per level instead
                d_labels = np.full((d_emb.shape[0], gl.shape[1]), -424242,
                                   gl.dtype)
            g_labels = np.concatenate([gl, d_labels], axis=0)
        # revisited Oxford/Paris: the query dataset carries per-query gnd →
        # medium/hard junk-corrected mAP (landmark_evaluation.py protocol)
        gnd = getattr(datasets["query"], "gnd", None)
        if gnd is not None:
            from irw_tpu.engine.landmark import landmark_evaluation

            return landmark_evaluation(np.asarray(q_emb), np.asarray(g_emb), gnd)
        # the distractor protocol without a query/gallery split wraps ONE
        # dataset as both (getter.py): the reference's ('test', ['test',
        # 'distractor']) split then runs same-source with drop-self —
        # without this, every query retrieves itself at rank 1
        cfg["same_source"] = datasets["query"] is datasets["gallery"]
        return _metric_suite(q_emb, q_labels, g_emb, g_labels, cfg)

    emb, labels = compute_embeddings(
        apply_fn, variables, datasets, host_transform, device_transform,
        batch_size, num_workers,
    )
    cfg["same_source"] = True
    return _metric_suite(emb, labels, emb, labels, cfg)
