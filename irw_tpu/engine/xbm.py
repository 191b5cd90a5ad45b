"""Cross-batch memory as a fixed-size on-device buffer.

Reference: main/engine/memory.py — a python dict keyed by sample path
(unique=True) or a bounded deque.  Neither is jit-able; here:

- ``unique=True``: a direct-mapped table with one slot per dataset index
  (size == dataset size reproduces the reference exactly, e.g. the CUB
  config's size 5824 == |CUB train|);
- ``unique=False``: a ring buffer with a rolling write pointer.

The buffers live inside the train state and are updated functionally inside
the jitted step.  ``weight`` scales the memory-loss term like the
reference's XBM weight (base_update.py:106-113).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import flax.struct


@flax.struct.dataclass
class XBMState:
    embeddings: jnp.ndarray  # (size, D)
    labels: jnp.ndarray  # (size,) or (size, C)
    valid: jnp.ndarray  # (size,) bool
    ptr: jnp.ndarray  # scalar int (ring mode)


@dataclass(frozen=True)
class XBM:
    size: int
    embedding_dim: int
    label_shape: tuple = ()
    unique: bool = True
    weight: float = 1.0
    activate_after: int = 0  # epochs before the memory term kicks in

    def init(self, dtype=jnp.float32) -> XBMState:
        return XBMState(
            embeddings=jnp.zeros((self.size, self.embedding_dim), dtype),
            labels=jnp.zeros((self.size,) + tuple(self.label_shape), dtype
                             if self.label_shape else jnp.int32),
            valid=jnp.zeros((self.size,), bool),
            ptr=jnp.int32(0),
        )

    def update(self, state: XBMState, embeddings, labels, indices) -> XBMState:
        """Insert a batch. ``indices`` are dataset positions (the path-key
        replacement, memory.py:37-40)."""
        b = embeddings.shape[0]
        if self.unique:
            slots = indices % self.size
        else:
            slots = (state.ptr + jnp.arange(b)) % self.size
        new_emb = state.embeddings.at[slots].set(embeddings.astype(state.embeddings.dtype))
        new_lbl = state.labels.at[slots].set(labels.astype(state.labels.dtype))
        new_valid = state.valid.at[slots].set(True)
        new_ptr = (state.ptr + b) % self.size
        return XBMState(new_emb, new_lbl, new_valid, new_ptr)

    def contents(self, state: XBMState):
        """(embeddings, labels, valid_mask) — fixed shapes; invalid slots
        must be masked out by the consumer (losses get ref sets with the
        mask already applied via zero labels + far embeddings)."""
        return state.embeddings, state.labels, state.valid
