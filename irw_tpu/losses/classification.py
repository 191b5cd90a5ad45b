"""Classification-style losses: CE, per-branch CE, ArcFace.

Reference: cross_entropy_loss.py, multi_ce_loss.py, arcface_loss.py.
ArcFace's internal AdamW over its class-weight matrix becomes trainable
``init_params`` leaves the engine optimises with the loss optimizer.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from irw_tpu.losses.base import LossBase, LossContext, LossKind


def _softmax_ce(logits, labels, label_smoothing: float = 0.0):
    num = logits.shape[-1]
    if labels.ndim == 1:
        onehot = jax.nn.one_hot(labels, num, dtype=logits.dtype)
    else:
        onehot = labels / jnp.maximum(labels.sum(-1, keepdims=True), 1e-12)
    if label_smoothing:
        onehot = onehot * (1 - label_smoothing) + label_smoothing / num
    logp = jax.nn.log_softmax(logits)
    return -(onehot * logp).sum(-1).mean()


class CrossEntropy(LossBase):
    kind = LossKind.LOGITS

    def __init__(self, label_smoothing: float = 0.0, **kw):
        self.label_smoothing = label_smoothing

    def __call__(self, ctx: LossContext, params=None, state=None):
        return _softmax_ce(ctx.embeddings, ctx.labels, self.label_smoothing), state


class MultiCrossEntropyLoss(LossBase):
    """Per-branch CE, weighted mean (multi_ce_loss.py:6-30)."""

    kind = LossKind.BRANCHES

    def __init__(self, branch_weights=None, label_smoothing: float = 0.0, **kw):
        self.branch_weights = branch_weights
        self.label_smoothing = label_smoothing

    def __call__(self, ctx: LossContext, params=None, state=None):
        branches = ctx.branches
        weights = self.branch_weights or [1.0] * len(branches)
        total = sum(
            w * _softmax_ce(b, ctx.labels, self.label_smoothing)
            for w, b in zip(weights, branches)
        )
        return total / sum(weights), state


class ArcFaceLoss(LossBase):
    """Additive-angular-margin softmax (arcface_loss.py:19-45).  The class
    weight matrix is a trainable param leaf updated by the loss optimizer
    (the reference's internal AdamW whose state rode inside state_dict)."""

    kind = LossKind.EMBEDDINGS

    def __init__(self, num_classes: int, embedding_size: int, margin: float = 28.6,
                 scale: float = 64.0, **kw):
        self.num_classes = num_classes
        self.embedding_size = embedding_size
        # reference (PML) takes margin in degrees
        self.margin = jnp.deg2rad(margin) if margin > 1.0 else margin
        self.scale = scale

    def init_params(self, rng):
        w = jax.random.normal(rng, (self.num_classes, self.embedding_size)) * 0.01
        return {"weights": w}

    def __call__(self, ctx: LossContext, params=None, state=None):
        emb = ctx.embeddings
        emb = emb / jnp.maximum(jnp.linalg.norm(emb, axis=1, keepdims=True), 1e-12)
        w = params["weights"]
        w = w / jnp.maximum(jnp.linalg.norm(w, axis=1, keepdims=True), 1e-12)
        cos = jnp.clip(emb @ w.T, -1 + 1e-7, 1 - 1e-7)
        theta = jnp.arccos(cos)
        onehot = jax.nn.one_hot(ctx.labels, self.num_classes, dtype=cos.dtype)
        logits = self.scale * jnp.cos(theta + self.margin * onehot)
        return _softmax_ce(logits, ctx.labels), state
