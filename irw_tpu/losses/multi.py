"""Multi-branch loss wrappers + distillation.

Reference: multi_loss.py (nested per-branch loss lists built from config),
multi_embedding_loss.py (one loss applied per branch), distillation_loss.py
(cosine teacher→student across branches).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from irw_tpu.losses.base import LossBase, LossContext, LossKind
from irw_tpu.utils.label_matrix import create_label_matrix


def _branch_ctx(ctx: LossContext, branch):
    """Build a per-branch context; score losses get the branch's normalised
    similarity matrix (base_update.py's score path, :82-87)."""
    emb = branch
    norm = emb / jnp.maximum(jnp.linalg.norm(emb, axis=1, keepdims=True), 1e-12)
    return dataclasses.replace(
        ctx,
        embeddings=emb,
        scores=norm @ norm.T,
        label_matrix=create_label_matrix(ctx.labels),
        branches=None,
    )


class MultiEmbeddingLoss(LossBase):
    """Apply one inner loss to every branch output, weighted mean
    (multi_embedding_loss.py:15-60)."""

    kind = LossKind.BRANCHES

    def __init__(self, loss=None, branch_weights=None, **kw):
        from irw_tpu.losses import get_loss

        if isinstance(loss, dict):
            self.inner = get_loss(loss["name"], **(loss.get("kwargs") or {}))
        else:
            self.inner = loss
        self.branch_weights = branch_weights

    def init_params(self, rng):
        return {"inner": self.inner.init_params(rng)}

    def init_state(self):
        return {"inner": self.inner.init_state()}

    def __call__(self, ctx: LossContext, params=None, state=None):
        weights = self.branch_weights or [1.0] * len(ctx.branches)
        total = 0.0
        inner_state = (state or {}).get("inner")
        for w, branch in zip(weights, ctx.branches):
            val, inner_state = self.inner(
                _branch_ctx(ctx, branch), (params or {}).get("inner"), inner_state
            )
            total = total + w * val
        return total / sum(weights), {"inner": inner_state}

    def epoch_update(self, state):
        return {"inner": self.inner.epoch_update(state["inner"])}

    def step_update(self, state):
        return {"inner": self.inner.step_update(state["inner"])}


class MultiLoss(LossBase):
    """Nested per-branch loss lists built from config (multi_loss.py:22-90):
    ``losses`` is a list (one entry per branch) of lists of {name, weight,
    kwargs}."""

    kind = LossKind.BRANCHES

    def __init__(self, losses=None, **kw):
        from irw_tpu.losses import build_losses

        self.branch_losses = [build_losses(entry) for entry in (losses or [])]

    def init_params(self, rng):
        params = {}
        for b_idx, entries in enumerate(self.branch_losses):
            for l_idx, (loss, _) in enumerate(entries):
                rng, sub = jax.random.split(rng)
                params[f"b{b_idx}_l{l_idx}"] = loss.init_params(sub)
        return params

    def init_state(self):
        return {
            f"b{b_idx}_l{l_idx}": loss.init_state()
            for b_idx, entries in enumerate(self.branch_losses)
            for l_idx, (loss, _) in enumerate(entries)
        }

    def __call__(self, ctx: LossContext, params=None, state=None):
        total = 0.0
        new_state = {}
        for b_idx, (branch, entries) in enumerate(zip(ctx.branches, self.branch_losses)):
            bctx = _branch_ctx(ctx, branch)
            for l_idx, (loss, weight) in enumerate(entries):
                key = f"b{b_idx}_l{l_idx}"
                val, st = loss(bctx, (params or {}).get(key), (state or {}).get(key))
                total = total + weight * val
                new_state[key] = st
        return total, new_state

    def epoch_update(self, state):
        return {
            f"b{b_idx}_l{l_idx}": loss.epoch_update(state[f"b{b_idx}_l{l_idx}"])
            for b_idx, entries in enumerate(self.branch_losses)
            for l_idx, (loss, _) in enumerate(entries)
        }


class FeatureDistillationLoss(LossBase):
    """Cosine distillation from a (detached) teacher branch to the others
    (distillation_loss.py:5-30): mean over students of 1 − cos(sg(t), s)."""

    kind = LossKind.BRANCHES

    def __init__(self, teacher_index: int = 0, **kw):
        self.teacher_index = teacher_index

    def __call__(self, ctx: LossContext, params=None, state=None):
        branches = ctx.branches
        teacher = jax.lax.stop_gradient(branches[self.teacher_index])
        t = teacher / jnp.maximum(jnp.linalg.norm(teacher, axis=1, keepdims=True), 1e-12)
        total, count = 0.0, 0
        for i, student in enumerate(branches):
            if i == self.teacher_index:
                continue
            s = student / jnp.maximum(jnp.linalg.norm(student, axis=1, keepdims=True), 1e-12)
            total = total + jnp.mean(1.0 - jnp.sum(t * s, axis=1))
            count += 1
        return total / max(count, 1), state
