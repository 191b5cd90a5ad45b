"""Differentiable ranking-AP losses.

Reference: main/losses/smooth_rank_ap.py (Heaviside/SmoothAP/SupAP with the
ROADMAP ``step_rank``), softbin_ap.py (NAVER quantized-histogram AP),
blackbox_ap.py (black-box ranking autograd), fast_ap.py.

The torch code mutates score tensors under boolean masks; here the same
piecewise functions are ``jnp.where`` compositions (identical math, jit- and
grad-safe).  ``quick_forward``'s (B, B, B) difference tensor is kept — it is
exactly the kind of big batched elementwise block XLA fuses well on TPU.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from irw_tpu.losses.base import LossBase, LossContext, LossKind
from irw_tpu.utils.label_matrix import create_label_matrix


def heaviside(x):
    """step with zero gradient (smooth_rank_ap.py:13-19: torch.heaviside
    with value 1 at 0, custom Function with None grad)."""
    return jax.lax.stop_gradient((x >= 0).astype(x.dtype))


def tau_sigmoid(x, tau):
    """temperature sigmoid with clamped exponent (smooth_rank_ap.py:25-33)."""
    exponent = jnp.clip(-x / tau, -50.0, 50.0)
    return 1.0 / (1.0 + jnp.exp(exponent))


def _parse_tau(tau):
    if isinstance(tau, str):
        tau_n, tau_p = tau.split("_")
        return float(tau_n), float(tau_p)
    return float(tau), float(tau)


def step_rank(diff, pos3, tau, rho, offset, delta, start):
    """ROADMAP's piecewise rank surrogate (smooth_rank_ap.py:36-64).

    diff: (B, B, B) score differences; pos3: bool, True where the pair is a
    positive-positive comparison (heaviside branch).
    """
    tau_n, tau_p = _parse_tau(tau)
    neg_branch = tau_sigmoid(diff, tau_n)
    if delta is None:
        pos_side = rho * diff + offset
    else:
        if offset is None:
            offset_v = tau_sigmoid(jnp.asarray(delta, diff.dtype), tau_p) + start
        else:
            offset_v = offset
        pos_side = jnp.where(
            diff > delta,
            rho * (diff - delta) + offset_v,
            start + tau_sigmoid(diff, tau_p),
        )
    out = jnp.where(diff > 0, pos_side, neg_branch)
    return jnp.where(pos3, heaviside(diff), out)


class SmoothRankAP(LossBase):
    """Base: differentiable AP via a pluggable rank approximation
    (smooth_rank_ap.py:67-160, quick path)."""

    kind = LossKind.SCORES

    def __init__(self, return_type: str = "1-mAP"):
        assert return_type in ("1-mAP", "1-AP", "AP", "mAP")
        self.return_type = return_type

    def rank_approx(self, diff, target_matrix, general: bool = False):
        raise NotImplementedError

    def ap_per_query(self, scores, target):
        b = scores.shape[0]
        eye = jnp.eye(b, dtype=scores.dtype)
        mask = 1.0 - eye
        # diff[q, i, j] = s[q, j] − s[q, i]
        diff = scores[:, None, :] - scores[:, :, None]
        approx = self.rank_approx(diff, target)
        rk = 1.0 + jnp.sum(approx * mask[None, :, :], axis=-1)
        pos_mask = target - eye
        pos_rk = (jnp.sum(approx * pos_mask[None, :, :], axis=-1) + target) * target
        ap = jnp.sum(pos_rk / rk, axis=1) / jnp.maximum(target.sum(axis=1), 1.0)
        return ap

    def ap_per_query_general(self, scores, target):
        """Non-square (B, M) scores — the XBM/memory path (the reference's
        general_forward, smooth_rank_ap.py:78-110), vectorised per query via
        lax.scan so memory stays at M²."""
        m = scores.shape[1]
        eye = jnp.eye(m, dtype=scores.dtype)
        mask = 1.0 - eye

        def one_query(_, inp):
            s, pos = inp  # (M,), (M,)
            diff = s[None, :] - s[:, None]  # diff[i, j] = s[j] − s[i]
            approx = self.rank_approx(diff, pos, general=True) * mask
            rk = 1.0 + jnp.sum(approx, axis=-1)
            pos_rk = 1.0 + jnp.sum(approx * pos[None, :], axis=-1)
            ap = jnp.sum(pos * pos_rk / rk) / jnp.maximum(pos.sum(), 1.0)
            return None, ap

        _, ap = jax.lax.scan(one_query, None, (scores, target))
        return ap

    def __call__(self, ctx: LossContext, params=None, state=None):
        scores = ctx.scores
        target = ctx.label_matrix.astype(scores.dtype)
        if scores.shape[0] == scores.shape[1]:
            ap = self.ap_per_query(scores, target)
        else:
            ap = self.ap_per_query_general(scores, target)
        if self.return_type == "AP":
            out = ap
        elif self.return_type == "mAP":
            out = ap.mean()
        elif self.return_type == "1-AP":
            out = 1.0 - ap
        else:
            out = 1.0 - ap.mean()
        return out, state


class HeavisideAP(SmoothRankAP):
    """exact (zero-gradient) AP, for testing (smooth_rank_ap.py:163-173)."""

    def rank_approx(self, diff, target, general: bool = False):
        return heaviside(diff)


class SmoothAP(SmoothRankAP):
    def __init__(self, tau: float = 0.01, **kw):
        super().__init__(**kw)
        self.tau = tau

    def rank_approx(self, diff, target, general: bool = False):
        return tau_sigmoid(diff, self.tau)


class SupAP(SmoothRankAP):
    """ROADMAP's SupAP (smooth_rank_ap.py:188-201)."""

    def __init__(self, tau=0.01, rho=100.0, offset=None, delta=0.05, start=0.5, **kw):
        super().__init__(**kw)
        self.tau, self.rho, self.offset, self.delta, self.start = tau, rho, offset, delta, start

    def rank_approx(self, diff, target, general: bool = False):
        if general:
            # per-query path: target is the (M,) positive mask, broadcast
            # over rows (step_rank's general branch, smooth_rank_ap.py:39-40)
            pos3 = jnp.broadcast_to(target[None, :] > 0, diff.shape)
        else:
            # pos-pos comparisons take the heaviside branch: T3[q,i,j] =
            # rel(i,j) & target[q,j]  (step_rank's mask algebra,
            # smooth_rank_ap.py:41-45: create_label_matrix(target) broadcast
            # against target.unsqueeze(1); rel(i,j) = label-matrix of the
            # label matrix, which for single-label batches equals the label
            # matrix — but the two differ for multilabel VOC/COCO batches)
            rel_ij = create_label_matrix(target) > 0
            pos3 = rel_ij[None, :, :] & (target[:, None, :] > 0)
        return step_rank(diff, pos3, self.tau, self.rho, self.offset, self.delta, self.start)


class AffineAP(SmoothRankAP):
    """Piecewise-affine rank surrogate.

    The reference ships only the preset (config/loss/affineap.yaml: theta,
    mu_n, mu_p) — no implementation exists anywhere in its tree, so this is
    the natural reading from the ROADMAP lineage: replace the sigmoid with a
    clipped affine ramp ``clip(theta + x / (2·mu), 0, 1)`` (slope width
    2·mu_n below zero, 2·mu_p above), with the SupAP pos-pos heaviside
    branch.
    """

    def __init__(self, theta=0.5, mu_n=0.025, mu_p=0.025, **kw):
        super().__init__(**kw)
        self.theta, self.mu_n, self.mu_p = theta, mu_n, mu_p

    def rank_approx(self, diff, target, general: bool = False):
        if general:
            pos3 = jnp.broadcast_to(target[None, :] > 0, diff.shape)
        else:
            rel_ij = create_label_matrix(target) > 0
            pos3 = rel_ij[None, :, :] & (target[:, None, :] > 0)
        ramp = jnp.clip(
            self.theta + diff / jnp.where(diff > 0, 2.0 * self.mu_p, 2.0 * self.mu_n),
            0.0, 1.0,
        )
        return jnp.where(pos3, heaviside(diff), ramp)


class SoftBinAP(LossBase):
    """NAVER deep-AP: quantized-histogram AP (softbin_ap.py:35-100).

    Similarities in [-1, 1] are soft-assigned to ``nq`` triangular bins and
    AP is computed from cumulative histogram precision.
    """

    kind = LossKind.SCORES

    def __init__(self, nq: int = 25, min_sim: float = -1.0, max_sim: float = 1.0,
                 return_type: str = "1-mAP", **aliases):
        self.nq = nq
        # the reference preset (config/loss/softbinap.yaml) keys these min/max
        self.min_sim = aliases.pop("min", min_sim)
        self.max_sim = aliases.pop("max", max_sim)
        assert not aliases, f"unknown SoftBinAP kwargs {sorted(aliases)}"
        self.return_type = return_type

    def __call__(self, ctx: LossContext, params=None, state=None):
        scores, target = ctx.scores, ctx.label_matrix.astype(ctx.scores.dtype)
        centers = jnp.linspace(self.max_sim, self.min_sim, self.nq)
        width = (self.max_sim - self.min_sim) / (self.nq - 1)
        # triangular soft assignment: (Q, nq, G)
        w = jnp.maximum(0.0, 1.0 - jnp.abs(scores[:, None, :] - centers[None, :, None]) / width)
        nbs = w.sum(axis=-1)  # (Q, nq) count per bin
        rec = (w * target[:, None, :]).sum(axis=-1)  # positives per bin
        cum_nbs = jnp.cumsum(nbs, axis=-1)
        cum_rec = jnp.cumsum(rec, axis=-1)
        prec = cum_rec / jnp.maximum(cum_nbs, 1e-16)
        total_pos = jnp.maximum(target.sum(axis=-1), 1e-16)
        ap = jnp.sum(prec * rec, axis=-1) / total_pos
        if self.return_type == "AP":
            return ap, state
        if self.return_type == "mAP":
            return ap.mean(), state
        if self.return_type == "1-AP":
            return 1.0 - ap, state
        return 1.0 - ap.mean(), state


def _rank_of(scores):
    """1-based rank of each element under descending sort."""
    order = jnp.argsort(-scores, axis=-1)
    ranks = jnp.argsort(order, axis=-1) + 1
    return ranks.astype(scores.dtype)


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def true_ranker(scores, lambda_val):
    return _rank_of(scores)


def _ranker_fwd(scores, lambda_val):
    ranks = _rank_of(scores)
    return ranks, (scores, ranks)


def _ranker_bwd(lambda_val, res, grad_output):
    """Black-box differentiation (blackbox_ap.py:33-51): perturb the scores
    with λ·grad, re-rank, finite-difference."""
    scores, ranks = res
    perturbed = scores + lambda_val * grad_output
    ranks_new = _rank_of(perturbed)
    grad = -(ranks - ranks_new) / (lambda_val + 1e-8)
    return (grad,)


true_ranker.defvjp(_ranker_fwd, _ranker_bwd)


class BlackBoxAP(LossBase):
    """Black-box ranking AP (blackbox_ap.py:53-109): AP computed from
    black-box-differentiated ranks."""

    kind = LossKind.SCORES

    def __init__(self, lambda_val: float = 4.0, margin: float = 0.02,
                 return_type: str = "1-mAP"):
        self.lambda_val = lambda_val
        self.margin = margin
        self.return_type = return_type

    def __call__(self, ctx: LossContext, params=None, state=None):
        scores, target = ctx.scores, ctx.label_matrix.astype(ctx.scores.dtype)
        # margin: push positives up before ranking (standard blackbox-AP trick)
        adj = scores - self.margin * target
        ranks = true_ranker(adj, self.lambda_val)
        # exact AP on (differentiable) ranks: for each positive, the number
        # of positives ranked at or above it / its rank
        b = scores.shape[0]
        pos = target
        # pos_rank_matrix[q,i,j] = 1 if j positive and rank_j <= rank_i
        leq = (ranks[:, None, :] <= ranks[:, :, None]).astype(scores.dtype)
        pos_above = jnp.sum(leq * pos[:, None, :], axis=-1)
        ap = jnp.sum(jnp.where(pos > 0, pos_above / ranks, 0.0), axis=-1) / jnp.maximum(
            pos.sum(-1), 1.0
        )
        if self.return_type in ("AP", "mAP"):
            out = ap if self.return_type == "AP" else ap.mean()
        else:
            out = (1.0 - ap) if self.return_type == "1-AP" else (1.0 - ap.mean())
        return out, state


class FastAP(LossBase):
    """Histogram-binned AP on L2 distances of normalised embeddings
    (fast_ap.py wraps PML's FastAPLoss; math re-derived here)."""

    kind = LossKind.EMBEDDINGS

    def __init__(self, num_bins: int = 10):
        self.num_bins = num_bins

    def __call__(self, ctx: LossContext, params=None, state=None):
        emb = ctx.embeddings
        emb = emb / jnp.maximum(jnp.linalg.norm(emb, axis=1, keepdims=True), 1e-12)
        target = create_label_matrix(ctx.labels).astype(emb.dtype)
        b = emb.shape[0]
        eye = jnp.eye(b, dtype=emb.dtype)
        target = target * (1.0 - eye)
        # squared L2 distances in [0, 4]
        d = jnp.maximum(2.0 - 2.0 * emb @ emb.T, 0.0)
        delta = 4.0 / self.num_bins
        centers = jnp.arange(self.num_bins + 1, dtype=emb.dtype) * delta
        w = jnp.maximum(0.0, 1.0 - jnp.abs(d[:, None, :] - centers[None, :, None]) / delta)
        w = w * (1.0 - eye)[:, None, :]
        h_pos = (w * target[:, None, :]).sum(-1)
        h_all = w.sum(-1)
        cum_pos = jnp.cumsum(h_pos, axis=-1)
        cum_all = jnp.cumsum(h_all, axis=-1)
        n_pos = target.sum(-1)
        ap = jnp.sum(h_pos * cum_pos / jnp.maximum(cum_all, 1e-16), axis=-1) / jnp.maximum(
            n_pos, 1e-16
        )
        valid = n_pos > 0
        loss = 1.0 - jnp.sum(jnp.where(valid, ap, 0.0)) / jnp.maximum(valid.sum(), 1.0)
        return loss, state
