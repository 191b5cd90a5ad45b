"""Loss protocol (see package docstring)."""

from __future__ import annotations

import enum
from dataclasses import dataclass, field
from typing import Any, Optional

import jax.numpy as jnp


class LossKind(enum.Enum):
    SCORES = "scores"  # f(similarity matrix, label matrix)
    EMBEDDINGS = "embeddings"  # f(embeddings, labels [, ref_embeddings, ref_labels])
    LOGITS = "logits"  # f(classifier logits, int labels)
    BRANCHES = "branches"  # f(list of per-branch outputs, labels)


@dataclass
class LossContext:
    """Everything a loss might consume, prepared once per step by the engine
    (mirrors the kwargs plumbing of base_update.py:82-137)."""

    embeddings: Any = None  # (B, D) or list for BRANCHES
    labels: Any = None  # (B,) int or (B, C) multi-label
    scores: Any = None  # (B, B') similarity matrix
    label_matrix: Any = None  # (B, B') relevance 0/1
    ref_embeddings: Any = None  # XBM memory embeddings
    ref_labels: Any = None
    branches: Any = None  # list of per-branch outputs (BRANCHES losses)
    train: bool = True


class LossBase:
    kind: LossKind = LossKind.EMBEDDINGS
    # XBM-aware: the loss reads ctx.ref_embeddings/ref_labels (the
    # reference's 4-positional-arg forward, pair_loss.py:46-50).  The
    # engine only builds an EMBEDDINGS-kind memory term for these — for
    # every other loss a "memory" call would just recompute the batch term
    # (the reference would TypeError on the extra args instead).
    accepts_refs: bool = False

    def init_params(self, rng) -> dict:
        """Trainable leaves (optimised by the loss optimizer)."""
        return {}

    def init_state(self) -> dict:
        """Non-trainable schedule state."""
        return {}

    def __call__(self, ctx: LossContext, params: dict, state: dict):
        raise NotImplementedError

    def epoch_update(self, state: dict) -> dict:
        """Per-epoch schedule hook (reference epoch_step())."""
        return state

    def step_update(self, state: dict) -> dict:
        """Per-batch schedule hook (reference HashNetAdapter.step())."""
        return state
