"""Deep-hashing losses.

Reference: hash_loss.py (proxy BCE + L1 quantization, internal AdamW),
hashnet_loss.py (weighted pairwise likelihood with tanh continuation),
csq_loss.py (Hadamard hash centers), hhf_loss.py (hinge proxy +
quantization), dsch.py (SCH pairwise Hamming-bound hinge),
quantization_loss.py (schedulable (|x|−t)² penalty).

Continuation schedules (HashNet's scale, quantization weight ramps) are
functional state threaded through ``step_update``/``epoch_update`` instead
of mutable module attributes.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from irw_tpu.losses.base import LossBase, LossContext, LossKind
from irw_tpu.utils.label_matrix import create_label_matrix


class HashLoss(LossBase):
    """GSPH/CSQ-style proxy hashing loss (hash_loss.py:17-47): tanh →
    L2-normalise → cosine-to-proxies × scale → BCE with the multi-label
    targets, + L1 quantization penalty.  Proxies are loss params optimised
    by the loss optimizer (the VOC-study loss)."""

    kind = LossKind.EMBEDDINGS

    def __init__(self, num_classes: int = 20, embedding_size: int = 64,
                 quant_weight: float = 0.1, scale: float = 15.0, **kw):
        self.num_classes = num_classes
        self.embedding_size = embedding_size
        self.quant_weight = quant_weight
        self.scale = scale

    def init_params(self, rng):
        # xavier_uniform over (C, D) (hash_loss.py:26-27)
        limit = float(np.sqrt(6.0 / (self.num_classes + self.embedding_size)))
        proxies = jax.random.uniform(
            rng, (self.num_classes, self.embedding_size), minval=-limit, maxval=limit
        )
        return {"proxies": proxies}

    def __call__(self, ctx: LossContext, params=None, state=None):
        emb = jnp.tanh(ctx.embeddings)
        norm_emb = emb / jnp.maximum(jnp.linalg.norm(emb, axis=1, keepdims=True), 1e-12)
        prox = params["proxies"]
        prox = prox / jnp.maximum(jnp.linalg.norm(prox, axis=1, keepdims=True), 1e-12)
        logits = (norm_emb @ prox.T) * self.scale
        labels = ctx.labels
        if labels.ndim == 1:
            labels = jax.nn.one_hot(labels, self.num_classes, dtype=logits.dtype)
        bce = jnp.mean(
            jnp.maximum(logits, 0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))
        )
        quant = jnp.mean(jnp.abs(jnp.abs(emb) - 1.0))
        return bce + self.quant_weight * quant, state


class HashNetLoss(LossBase):
    """HashNet weighted pairwise likelihood with tanh(scale·u) continuation
    (hashnet_loss.py:9-91).  ``state['scale']`` steps every
    ``step_continuation`` epochs like the adapter's batch counter."""

    kind = LossKind.EMBEDDINGS

    def __init__(self, embedding_size: int = 64, alpha: float = 0.1,
                 step_continuation: int = 20, batches_per_epoch: int = 49, **kw):
        self.alpha = alpha
        self.step_continuation = step_continuation
        self.batches_per_epoch = batches_per_epoch

    def init_state(self):
        return {"global_batch_step": jnp.int32(0), "scale": jnp.float32(1.0)}

    def step_update(self, state):
        step = state["global_batch_step"] + 1
        epoch = step // self.batches_per_epoch
        scale = (epoch // self.step_continuation + 1).astype(jnp.float32)
        return {"global_batch_step": step, "scale": scale}

    def __call__(self, ctx: LossContext, params=None, state=None):
        u = jnp.tanh(state["scale"] * ctx.embeddings)
        s = create_label_matrix(ctx.labels).astype(u.dtype)
        dot = self.alpha * (u @ u.T)
        # log(1 + exp(dot)) − S·dot, numerically stable (hashnet_loss.py:59)
        neg_log = jnp.maximum(dot, 0) + jnp.log1p(jnp.exp(-jnp.abs(dot))) - s * dot
        s1 = jnp.sum(s)
        s0 = jnp.sum(1.0 - s)
        total = s0 + s1
        # class-balance weights (HashNet paper): positives × total/S1, negatives × total/S0
        w = jnp.where(s > 0, total / jnp.maximum(s1, 1.0), total / jnp.maximum(s0, 1.0))
        return jnp.mean(w * neg_log), state


def hadamard_hash_targets(n_class: int, nbits: int, seed: int = 0) -> np.ndarray:
    """Hadamard-matrix hash centers (csq_loss.py:44-72); rows beyond 2·nbits
    are random ±1 with balanced bits."""
    h = np.array([[1.0]])
    while h.shape[0] < nbits:
        h = np.block([[h, h], [h, -h]])
    h = h[:nbits, :nbits]
    h2k = np.concatenate([h, -h], axis=0)
    if n_class <= h2k.shape[0]:
        return h2k[:n_class]
    rng = np.random.RandomState(seed)
    extra = []
    for _ in range(n_class - h2k.shape[0]):
        ones = np.ones(nbits)
        ones[rng.choice(nbits, nbits // 2, replace=False)] = -1
        extra.append(ones)
    return np.concatenate([h2k, np.stack(extra)], axis=0)


class CSQLoss(LossBase):
    """Central Similarity Quantization (csq_loss.py:13-41): BCE of
    0.5(tanh(u)+1) against the class hash center + λ quantization."""

    kind = LossKind.EMBEDDINGS

    def __init__(self, embedding_size: int = 64, num_classes: int = 20,
                 lambda_param: float = 1e-4, is_multi_label: bool = True, seed: int = 0, **kw):
        self.nbits = embedding_size
        self.num_classes = num_classes
        self.lam = lambda_param
        self.is_multi_label = is_multi_label
        self.hash_targets = jnp.asarray(
            hadamard_hash_targets(num_classes, embedding_size, seed), dtype=jnp.float32
        )
        rng = np.random.RandomState(seed + 1)
        self.random_center = jnp.asarray(
            2.0 * rng.randint(0, 2, size=embedding_size) - 1.0, dtype=jnp.float32
        )

    def _label2center(self, y):
        if not self.is_multi_label or y.ndim == 1:
            idx = y if y.ndim == 1 else jnp.argmax(y, axis=1)
            return self.hash_targets[idx]
        center_sum = y.astype(jnp.float32) @ self.hash_targets
        center_sum = jnp.where(center_sum == 0, self.random_center[None, :], center_sum)
        return 2.0 * (center_sum > 0).astype(jnp.float32) - 1.0

    def __call__(self, ctx: LossContext, params=None, state=None):
        u = jnp.tanh(ctx.embeddings)
        center = self._label2center(ctx.labels)
        p = jnp.clip(0.5 * (u + 1.0), 1e-6, 1 - 1e-6)
        t = 0.5 * (center + 1.0)
        bce = -jnp.mean(t * jnp.log(p) + (1 - t) * jnp.log(1 - p))
        q = jnp.mean((jnp.abs(u) - 1.0) ** 2)
        return bce + self.lam * q, state


class HHFLoss(LossBase):
    """Hashing-with-Hinge-Function proxy loss (hhf_loss.py:20-90): hinge on
    the angle to class proxies with an inflection point, + quantization.
    Proxies are loss params (internal AdamW in the reference)."""

    kind = LossKind.EMBEDDINGS

    def __init__(self, embedding_size: int = 64, num_classes: int = 20,
                 quant_weight: float = 0.1, margin: float = 0.25, **kw):
        self.nbits = embedding_size
        self.num_classes = num_classes
        self.quant_weight = quant_weight
        self.margin = margin

    def init_params(self, rng):
        limit = float(np.sqrt(6.0 / (self.num_classes + self.nbits)))
        return {
            "proxies": jax.random.uniform(
                rng, (self.num_classes, self.nbits), minval=-limit, maxval=limit
            )
        }

    def __call__(self, ctx: LossContext, params=None, state=None):
        emb = jnp.tanh(ctx.embeddings)
        norm_emb = emb / jnp.maximum(jnp.linalg.norm(emb, axis=1, keepdims=True), 1e-12)
        prox = params["proxies"]
        prox = prox / jnp.maximum(jnp.linalg.norm(prox, axis=1, keepdims=True), 1e-12)
        cos = norm_emb @ prox.T
        labels = ctx.labels
        if labels.ndim == 1:
            pos = jax.nn.one_hot(labels, self.num_classes, dtype=cos.dtype)
        else:
            pos = (labels > 0).astype(cos.dtype)
        # hinge: positives should exceed 1−margin, negatives stay below margin
        pos_loss = jnp.maximum((1.0 - self.margin) - cos, 0.0) * pos
        neg_loss = jnp.maximum(cos - self.margin, 0.0) * (1.0 - pos)
        hinge = pos_loss.sum() / jnp.maximum(pos.sum(), 1.0) + neg_loss.sum() / jnp.maximum(
            (1.0 - pos).sum(), 1.0
        )
        quant = jnp.mean(jnp.abs(jnp.abs(emb) - 1.0))
        return hinge + self.quant_weight * quant, state


class SCHLoss(LossBase):
    """DSCH pairwise Hamming-bound hinge (dsch.py:6-43, DSCH/loss.py:8):
    similar pairs pulled under a distance bound, dissimilar pushed past it."""

    kind = LossKind.EMBEDDINGS

    def __init__(self, nbits: int = 64, gamma: float = 2.0, **kw):
        self.nbits = nbits
        self.gamma = gamma

    def __call__(self, ctx: LossContext, params=None, state=None):
        u = ctx.embeddings  # tanh-activated codes from the model
        s = create_label_matrix(ctx.labels).astype(u.dtype)
        # Hamming-equivalent distance for ±1 relaxed codes
        dist = 0.5 * (self.nbits - u @ u.T)
        bound = self.nbits / self.gamma
        pos_loss = s * jnp.maximum(dist - 0.0, 0.0)
        neg_loss = (1.0 - s) * jnp.maximum(bound - dist, 0.0)
        n = u.shape[0]
        off_diag = 1.0 - jnp.eye(n, dtype=u.dtype)
        return jnp.sum((pos_loss + neg_loss) * off_diag) / jnp.maximum(off_diag.sum(), 1.0), state


class QuantizationLoss(LossBase):
    """Schedulable quantization penalty (quantization_loss.py:5-70):
    weight·mean((|x| − target)²) with a linear ramp or multiplicative
    multi-step schedule advanced by ``epoch_update``."""

    kind = LossKind.EMBEDDINGS

    def __init__(self, target_value: float = 1.0, step_type: str = "linear",
                 steps=None, alpha: float = 1.0, starting_weight: float = 1e-4,
                 warmup_step=False, **kw):
        self.target_value = target_value
        self.step_type = step_type
        self.steps = steps
        self.alpha = alpha
        self.starting_weight = starting_weight
        self.warmup_step = warmup_step

    def init_state(self):
        if self.step_type == "linear":
            weight = 0.0
        else:
            weight = 0.0 if self.warmup_step else self.starting_weight
        return {"epoch": jnp.int32(0), "weight": jnp.float32(weight)}

    def epoch_update(self, state):
        epoch = state["epoch"] + 1
        if self.step_type == "linear":
            warm = int(self.warmup_step) if not isinstance(self.warmup_step, bool) else 0
            weight = jnp.clip((epoch - warm) / float(self.steps), 0.0, 1.0)
            return {"epoch": epoch, "weight": weight.astype(jnp.float32)}
        # multi-step: multiply by alpha at each milestone (first activation
        # sets starting_weight)
        weight = state["weight"]
        for milestone in list(self.steps or []):
            hit = epoch == milestone
            weight = jnp.where(
                hit,
                jnp.where(weight == 0.0, self.starting_weight, weight * self.alpha),
                weight,
            )
        return {"epoch": epoch, "weight": weight}

    def __call__(self, ctx: LossContext, params=None, state=None):
        q = jnp.mean((jnp.abs(ctx.embeddings) - self.target_value) ** 2)
        return state["weight"] * q, state
