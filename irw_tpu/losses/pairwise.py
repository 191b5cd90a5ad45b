"""Pairwise contrastive losses (reference: calibration_loss.py, pair_loss.py).

Both support XBM reference embeddings (the cross-batch memory path,
base_update.py:88-97): when refs are given, pairs are formed between the
batch and the memory.
"""

from __future__ import annotations

import jax.numpy as jnp

from irw_tpu.losses.base import LossBase, LossContext, LossKind
from irw_tpu.utils.label_matrix import create_label_matrix


def _pair_setup(ctx: LossContext):
    """similarities + relevance between batch and (memory or batch)."""
    emb = ctx.embeddings
    if ctx.ref_embeddings is not None:
        ref, ref_labels = ctx.ref_embeddings, ctx.ref_labels
        self_pairs = False
    else:
        ref, ref_labels = emb, ctx.labels
        self_pairs = True
    sims = emb @ ref.T
    rel = create_label_matrix(ctx.labels, ref_labels)
    if self_pairs:
        eye = jnp.eye(sims.shape[0], dtype=rel.dtype)
        rel_pos = rel * (1.0 - eye)
        diag = eye
    else:
        rel_pos = rel
        diag = jnp.zeros_like(rel)
    neg = (1.0 - rel) * (1.0 - diag)
    return sims, rel_pos, neg


class CalibrationLoss(LossBase):
    """ROADMAP's calibration loss = contrastive on dot-product sims with
    absolute margins (calibration_loss.py:7-106; PML ContrastiveLoss with
    DotProductSimilarity and AvgNonZero reduction)."""

    accepts_refs = True  # XBM memory combination, calibration_loss.py:57-80

    kind = LossKind.EMBEDDINGS

    def __init__(self, pos_margin: float = 0.9, neg_margin: float = 0.6, **kw):
        self.pos_margin = pos_margin
        self.neg_margin = neg_margin

    def __call__(self, ctx: LossContext, params=None, state=None):
        sims, pos, neg = _pair_setup(ctx)
        pos_loss = jnp.maximum(self.pos_margin - sims, 0.0) * pos
        neg_loss = jnp.maximum(sims - self.neg_margin, 0.0) * neg
        # PML AvgNonZeroReducer: mean over pairs with non-zero loss, per side
        def avg_nonzero(x):
            nz = (x > 0).astype(x.dtype)
            return jnp.sum(x) / jnp.maximum(jnp.sum(nz), 1.0)

        return avg_nonzero(pos_loss) + avg_nonzero(neg_loss), state


class PairLoss(LossBase):
    """XBM-paper contrastive (pair_loss.py:12-53): per-anchor sum of
    (1 − s) over positives with s < 1−ε plus s over negatives with
    s > margin, averaged over anchors."""

    accepts_refs = True  # ref-embedding aware, pair_loss.py:46-50

    kind = LossKind.EMBEDDINGS

    def __init__(self, margin: float = 0.5):
        self.margin = margin

    def __call__(self, ctx: LossContext, params=None, state=None):
        sims, pos, neg = _pair_setup(ctx)
        eps = 1e-5
        pos_active = pos * (sims < 1.0 - eps)
        neg_active = neg * (sims > self.margin)
        per_anchor = jnp.sum((1.0 - sims) * pos_active, axis=1) + jnp.sum(
            sims * neg_active, axis=1
        )
        return per_anchor.mean(), state
