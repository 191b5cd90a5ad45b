"""Pairwise relevance-matrix construction (reference:
main/utils/create_label_matrix.py:2-22).

Two label regimes, same as the reference:

- integer class ids, shape ``(B,)``: relevance is equality;
- multi-label float vectors, shape ``(B, C)`` (e.g. VOC 20-dim, MIRFlickr
  38-dim): relevance is "shares at least one positive label", computed as
  ``(labels @ other.T) > 0`` — the matmul form the reference uses.

Pure jnp; safe under jit and grad (output is a float matrix of 0/1).
"""

import jax.numpy as jnp


def create_label_matrix(labels, other_labels=None, dtype=jnp.float32):
    """Return the (B, B') 0/1 relevance matrix between two label sets.

    Args:
      labels: (B,) int class ids or (B, C) multi-label float/bool vectors.
      other_labels: optional second set (defaults to ``labels``): the
        reference calls this with XBM memory labels as the gallery side.
    """
    if other_labels is None:
        other_labels = labels
    if labels.ndim == 1:
        matrix = labels[:, None] == other_labels[None, :]
    else:
        matrix = (labels.astype(jnp.float32) @ other_labels.astype(jnp.float32).T) > 0
    return matrix.astype(dtype)
