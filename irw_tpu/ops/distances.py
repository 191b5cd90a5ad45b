"""On-device pairwise distance / similarity matrices.

TPU-native replacement for faiss flat indices + torch cdist
(reference ``main/engine/get_knn.py:27-71`` and the Hamming-distance math in
``main/engine/accuracy_calculator.py:183-186``).  Everything is a batched
matmul shaped for the MXU; the gallery axis can be sharded over the device
mesh (see :mod:`irw_tpu.parallel`).

Metrics:
- ``l2``      squared-free Euclidean distance (like torch.cdist / IndexFlatL2)
- ``sql2``    squared Euclidean
- ``ip``      inner-product similarity (IndexFlatIP)
- ``cosine``  cosine similarity (embeddings get L2-normalised here)
- ``hamming`` Hamming distance between ±1 codes: 0.5·(nbits − q·gᵀ), the
  reference's formula ``0.5 * (q - query @ ref.T)`` (accuracy_calculator.py:186)
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

SIMILARITY_METRICS = ("ip", "cosine")
DISTANCE_METRICS = ("l2", "sql2", "hamming")


def l2_normalize(x, axis: int = -1, eps: float = 1e-12):
    return x * jax.lax.rsqrt(jnp.sum(x * x, axis=axis, keepdims=True) + eps)


@partial(jax.jit, static_argnames=("metric",))
def pairwise_distance(queries, gallery, metric: str = "cosine"):
    """(Q, D) × (G, D) → (Q, G) distance or similarity matrix.

    Computed in f32 on the MXU regardless of input dtype (bf16 embeddings are
    fine; accumulation is f32 via preferred_element_type).
    """
    q = queries.astype(jnp.float32)
    g = gallery.astype(jnp.float32)
    if metric == "cosine":
        q = l2_normalize(q)
        g = l2_normalize(g)
        return jnp.dot(q, g.T, preferred_element_type=jnp.float32)
    if metric == "ip":
        return jnp.dot(q, g.T, preferred_element_type=jnp.float32)
    if metric in ("l2", "sql2"):
        qq = jnp.sum(q * q, axis=-1, keepdims=True)
        gg = jnp.sum(g * g, axis=-1, keepdims=True)
        sq = qq + gg.T - 2.0 * jnp.dot(q, g.T, preferred_element_type=jnp.float32)
        sq = jnp.maximum(sq, 0.0)
        return sq if metric == "sql2" else jnp.sqrt(sq)
    if metric == "hamming":
        nbits = q.shape[-1]
        return 0.5 * (nbits - jnp.dot(q, g.T, preferred_element_type=jnp.float32))
    raise ValueError(f"unknown metric {metric!r}")


def is_similarity(metric: str) -> bool:
    """True if larger values mean more relevant (ip/cosine); False for
    distances (l2/sql2/hamming)."""
    if metric in SIMILARITY_METRICS:
        return True
    if metric in DISTANCE_METRICS:
        return False
    raise ValueError(f"unknown metric {metric!r}")
