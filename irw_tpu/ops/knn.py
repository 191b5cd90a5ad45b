"""Exact k-NN on device (reference: main/engine/get_knn.py).

The reference shells out to faiss (GPU-sharded flat index) or torch
matmul+topk.  Here the distance matrix is computed block-tiled on device and
ranked with ``jax.lax.top_k``; for large galleries the query axis is scanned
in chunks so the full Q×G matrix never materialises in HBM at once.

Semantics preserved from ``get_knn.py:9-24``:
- when queries *are* the gallery (``embeds_come_from_same_source``), one
  extra neighbour is retrieved and self-matches are dropped.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from irw_tpu.ops.distances import is_similarity, pairwise_distance


@partial(jax.jit, static_argnames=("k", "metric", "same_source", "query_chunk"))
def knn(
    queries,
    gallery,
    k: int,
    metric: str = "cosine",
    same_source: bool = False,
    query_chunk: int = 1024,
    gallery_valid=None,
):
    """Return (indices, scores) of the k nearest gallery items per query.

    scores are similarities (larger = closer) regardless of metric: distances
    are negated so downstream ranking code has one convention.
    ``gallery_valid``: optional (G,) bool mask — invalid rows (sharding
    padding) rank dead last.
    """
    n_queries, n_gallery = queries.shape[0], gallery.shape[0]
    sim_metric = is_similarity(metric)

    def rank_chunk(q_chunk, q_index_offset):
        mat = pairwise_distance(q_chunk, gallery, metric)
        if not sim_metric:
            mat = -mat
        if gallery_valid is not None:
            mat = jnp.where(gallery_valid[None, :], mat, -jnp.inf)
        if same_source:
            # mask self-matches by index identity, not distance==0 (dup-safe)
            rows = q_index_offset + jnp.arange(q_chunk.shape[0])[:, None]
            cols = jnp.arange(n_gallery)[None, :]
            mat = jnp.where(rows == cols, -jnp.inf, mat)
        scores, idx = jax.lax.top_k(mat, min(k, n_gallery))
        return scores, idx

    if n_queries <= query_chunk:
        scores, idx = rank_chunk(queries, 0)
        return idx, scores

    # pad queries to a multiple of the chunk, scan, then slice
    pad = (-n_queries) % query_chunk
    q = jnp.concatenate([queries, jnp.zeros((pad, queries.shape[1]), queries.dtype)], 0)
    q = q.reshape(-1, query_chunk, queries.shape[1])
    offsets = jnp.arange(q.shape[0]) * query_chunk

    def body(carry, inp):
        q_chunk, off = inp
        scores, idx = rank_chunk(q_chunk, off)
        return carry, (scores, idx)

    _, (scores, idx) = jax.lax.scan(body, None, (q, offsets))
    scores = scores.reshape(-1, scores.shape[-1])[:n_queries]
    idx = idx.reshape(-1, idx.shape[-1])[:n_queries]
    return idx, scores
