"""Retrieval metrics, computed on device with fixed shapes.

Replaces the reference's CPU metric stack (pytorch-metric-learning
``AccuracyCalculator`` + torchmetrics.retrieval + faiss,
``main/engine/accuracy_calculator.py``) with masked, jit-safe jnp math.

Semantics preserved:

- multi-label relevance = label-vector dot product > 0
  (accuracy_calculator.py:31-37); integer labels = equality;
- lone queries (no relevant gallery item) are excluded from the means of
  the torchmetrics/PML-backed metrics — map, map_at_r, r_precision,
  precision_at_1, mean_reciprocal_rank — (PML's ``not_lone_query_mask``
  plumbing, accuracy_calculator.py:131-167, 331-337) but NOT from
  ``recall_at_k`` (plain ``.mean()`` over all queries,
  accuracy_calculator.py:50-52) or ``maphashing`` (divides by num_query,
  accuracy_calculator.py:245);
- when query set == gallery, self-matches are dropped (get_knn.py:10-24).
  Deliberate divergence: the reference's ``calculate_maphashing`` and
  ``calculate_pr_rc_hashing`` re-rank the raw gallery WITHOUT the drop-self
  (they bypass the knn plumbing), so on same-source splits the reference
  self-match inflates those two; here drop-self is applied uniformly;
- ``map`` follows torchmetrics.RetrievalMAP: AP denominator = number of
  positives *within the retrieved list* (accuracy_calculator.py:156-167);
- ``map_at_r`` follows PML: denominator R = total relevant, positions > R
  don't count;
- ``r_precision`` follows torchmetrics.RetrievalRPrecision as the reference
  feeds it (accuracy_calculator.py:131-142): R = relevant *within the
  retrieved top-k list*, metric = hits among the top-R ranks / R;
- ``maphashing`` is per-query mAP@topk over Hamming ranking — with the
  accumulator bug at accuracy_calculator.py:237 (``topkmap += per_query``
  commented out, so the reference always returns 0.0) deliberately FIXED;
- ``bit_balance``/``worst_bit_balance`` over gallery sign codes
  (accuracy_calculator.py:188-200);
- ``precision_recall_curve`` = the cumulative P/R curves of
  ``calculate_pr_rc_hashing`` (accuracy_calculator.py:249-287) over the
  FULL gallery ranking (the reference ignores topk there), returned as
  arrays instead of a CSV side effect.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from irw_tpu.ops.knn import knn
from irw_tpu.utils.label_matrix import create_label_matrix

DEFAULT_RECALL_KS = (1, 2, 4, 8, 10, 16, 20, 30, 32, 100)


def relevance_counts(query_labels, gallery_labels, same_source: bool = False):
    """Per-query number of relevant gallery items (drop self if same
    source).  Returns (counts, not_lone_mask)."""
    rel = create_label_matrix(query_labels, gallery_labels)
    counts = rel.sum(axis=1)
    if same_source:
        counts = counts - 1.0
    return counts, counts > 0


# --- metric kernels on the ranked relevance matrix ---------------------------
# rel: (Q, K) float 0/1 relevance of the ranked top-K, valid: (Q,) bool


def _masked_mean(values, valid):
    valid = valid.astype(values.dtype)
    return jnp.sum(values * valid) / jnp.maximum(jnp.sum(valid), 1.0)


def average_precision(rel, k: int | None = None):
    """Per-query AP over the (optionally truncated) ranked list; denominator
    = positives in the list (torchmetrics.RetrievalMAP semantics — also the
    maphashing formula once its accumulator bug is fixed)."""
    if k is not None:
        rel = rel[:, :k]
    ranks = jnp.arange(1, rel.shape[1] + 1, dtype=rel.dtype)
    cum = jnp.cumsum(rel, axis=1)
    precision_at_hit = (cum / ranks) * rel
    positives = rel.sum(axis=1)
    return precision_at_hit.sum(axis=1) / jnp.maximum(positives, 1.0)


def average_precision_at_r(rel, num_relevant):
    """PML-style mAP@R: only ranks ≤ R count, denominator is R (the total
    number of relevant items, capped at the list length)."""
    q, k = rel.shape
    ranks = jnp.arange(1, k + 1, dtype=rel.dtype)
    r = jnp.minimum(num_relevant.astype(rel.dtype), float(k))[:, None]
    in_r = (ranks[None, :] <= r).astype(rel.dtype)
    cum = jnp.cumsum(rel, axis=1)
    precision_at_hit = (cum / ranks) * rel * in_r
    return precision_at_hit.sum(axis=1) / jnp.maximum(r[:, 0], 1.0)


def r_precision(rel):
    """torchmetrics ``RetrievalRPrecision`` on the retrieved list (the
    reference's ``calculate_rpr``, accuracy_calculator.py:131-142): R = the
    number of relevant items *within the list*, metric = fraction of the
    top-R ranks that are relevant.  (NOT R = total relevant in the gallery —
    torchmetrics only ever sees the top-k list the reference feeds it.)"""
    q, k = rel.shape
    ranks = jnp.arange(1, k + 1, dtype=rel.dtype)
    r = rel.sum(axis=1)[:, None]
    hits_in_r = (rel * (ranks[None, :] <= r)).sum(axis=1)
    return hits_in_r / jnp.maximum(r[:, 0], 1.0)


def recall_at_k(rel, k: int):
    """1 if any relevant item in the top-k (reference recall_at_k,
    accuracy_calculator.py:50-52).  NB the reference averages this over ALL
    queries (plain ``.mean()``, no lone-query mask) — the caller must use
    the all-queries denominator, unlike the lone-masked metrics."""
    return (rel[:, :k].sum(axis=1) > 0).astype(jnp.float32)


def precision_at_k(rel, k: int):
    return rel[:, :k].sum(axis=1) / float(k)


def mean_reciprocal_rank(rel):
    k = rel.shape[1]
    ranks = jnp.arange(1, k + 1, dtype=rel.dtype)
    first_hit = jnp.where(rel > 0, ranks[None, :], jnp.inf).min(axis=1)
    return jnp.where(jnp.isfinite(first_hit), 1.0 / first_hit, 0.0)


def bit_balance(codes, valid=None):
    """Per-bit balance over gallery sign codes: 1 = 50/50 split, 0 = dead
    bit (accuracy_calculator.py:188-194).  ``valid`` masks padded rows
    (mesh-sharded galleries are padded to a device multiple)."""
    positive = (codes > 0).astype(jnp.float32)
    if valid is None:
        frac_positive = positive.mean(axis=0)
    else:
        v = valid.astype(jnp.float32)
        frac_positive = (positive * v[:, None]).sum(axis=0) / jnp.maximum(v.sum(), 1.0)
    return 1.0 - 2.0 * jnp.abs(frac_positive - 0.5)


def precision_recall_curve(rel, num_relevant, valid):
    """Cumulative precision/recall over the full ranked gallery, averaged
    over valid queries (calculate_pr_rc_hashing, accuracy_calculator.py:249-287).

    Returns (precision, recall), each (K,).
    """
    k = rel.shape[1]
    ranks = jnp.arange(1, k + 1, dtype=rel.dtype)
    cum = jnp.cumsum(rel, axis=1)
    prec = cum / ranks[None, :]
    recall = cum / jnp.maximum(num_relevant.astype(rel.dtype), 1.0)[:, None]
    # the reference additionally requires recall to reach 1.0 (all relevant
    # items inside the ranked list)
    ok = valid & (recall[:, -1] >= 1.0 - 1e-6)
    w = ok.astype(rel.dtype)[:, None]
    denom = jnp.maximum(w.sum(), 1.0)
    return (prec * w).sum(axis=0) / denom, (recall * w).sum(axis=0) / denom


# --- the full suite ----------------------------------------------------------


def determine_k(query_labels, gallery_labels, k, same_source: bool):
    """Resolve the retrieval depth.  ``"max_bin_count"`` = the largest
    per-query relevant count (PML determine_k semantics, used by the
    training-time batch-mAP proxy, batch_map.py:9-21); ``None`` = the full
    gallery (PML ``AccuracyCalculator(k=None)`` ranks every reference item,
    minus self under same-source — NOT max_bin_count)."""
    n_gallery = int(gallery_labels.shape[0])
    if k is None:
        return max(n_gallery - int(same_source), 1)
    if k == "max_bin_count":
        # PML/reference resolution: the largest GALLERY class (label-match
        # counts of reference vs reference, accuracy_calculator.py:207-210)
        # minus self when the query is part of the gallery — not the
        # largest per-QUERY relevant count
        counts, _ = relevance_counts(gallery_labels, gallery_labels,
                                     same_source)
        return max(int(counts.max()), 1)
    return min(int(k), n_gallery - int(same_source))


@partial(
    jax.jit,
    static_argnames=("k", "metric", "same_source", "recall_ks", "with_curve", "query_chunk"),
)
def _ranked_relevance(
    query,
    query_labels,
    gallery,
    gallery_labels,
    k: int,
    metric: str,
    same_source: bool,
    recall_ks,
    with_curve: bool,
    gallery_valid=None,
    query_chunk: int = 512,
):
    """Streaming metric suite: queries are scanned in fixed chunks so HBM
    holds one (chunk, K) relevance block at a time — the reference instead
    materialised the full ranking in faiss/CPU (SURVEY §3.2 ★HOT; §7 step 2
    'block-tiled, mesh-sharded, streaming top-k')."""
    n_queries = query.shape[0]
    chunk = min(query_chunk, n_queries)
    pad = (-n_queries) % chunk
    q = jnp.concatenate([query, jnp.zeros((pad,) + query.shape[1:], query.dtype)], 0)
    ql = jnp.concatenate(
        [query_labels, jnp.zeros((pad,) + query_labels.shape[1:], query_labels.dtype)], 0
    )
    qvalid = jnp.arange(n_queries + pad) < n_queries
    n_chunks = (n_queries + pad) // chunk

    qs = q.reshape((n_chunks, chunk) + q.shape[1:])
    qls = ql.reshape((n_chunks, chunk) + ql.shape[1:])
    qvs = qvalid.reshape(n_chunks, chunk)
    offsets = jnp.arange(n_chunks) * chunk

    n_gallery = gallery.shape[0]
    sums_init = {
        "map": 0.0,
        "map_at_r": 0.0,
        "r_precision": 0.0,
        "precision_at_1": 0.0,
        "mean_reciprocal_rank": 0.0,
        "maphashing": 0.0,
        "n_valid": 0.0,
        "n_queries": 0.0,
    }
    for rk in recall_ks:
        if rk <= k:
            sums_init[f"recall_at_{rk}"] = 0.0
    if with_curve:
        # the reference's curve ranks the FULL gallery (calculate_pr_rc_
        # hashing ignores topk, accuracy_calculator.py:252-268) — a top-k
        # curve with its recall==1 filter would silently average over only
        # the easy queries whose every relevant item sits inside the top-k
        sums_init["pr_curve"] = jnp.zeros((n_gallery,))
        sums_init["rc_curve"] = jnp.zeros((n_gallery,))
        sums_init["n_curve"] = 0.0
    sums_init = {key: jnp.asarray(v, jnp.float32) for key, v in sums_init.items()}

    def _labels_of(idx):
        if gallery_labels.ndim == 1:
            return gallery_labels[idx]
        return gallery_labels[idx.reshape(-1)].reshape(
            idx.shape + (gallery_labels.shape[-1],)
        )

    def body(sums, inp):
        q_c, ql_c, qv_c, off = inp
        idx, _ = knn(
            q_c, gallery, k=k, metric=metric, same_source=False,
            gallery_valid=gallery_valid,
            query_chunk=chunk,
        ) if not same_source else _self_knn(q_c, off, k)
        rel = _rel_of(ql_c, _labels_of(idx))
        counts = create_label_matrix(ql_c, gallery_labels).sum(axis=1)
        if same_source:
            counts = counts - 1.0
        valid = (counts > 0) & qv_c
        w = valid.astype(jnp.float32)
        w_all = qv_c.astype(jnp.float32)  # every real query, lone included

        new = dict(sums)
        ap = average_precision(rel)
        new["map"] = sums["map"] + jnp.sum(ap * w)
        new["map_at_r"] = sums["map_at_r"] + jnp.sum(average_precision_at_r(rel, counts) * w)
        new["r_precision"] = sums["r_precision"] + jnp.sum(r_precision(rel) * w)
        new["precision_at_1"] = sums["precision_at_1"] + jnp.sum(rel[:, 0] * w)
        new["mean_reciprocal_rank"] = sums["mean_reciprocal_rank"] + jnp.sum(
            mean_reciprocal_rank(rel) * w
        )
        # maphashing divides by num_query — ALL queries, lone ones
        # contributing 0 (accuracy_calculator.py:213-245 `result = topkmap /
        # num_query`), unlike the PML-style lone-masked `map`
        new["maphashing"] = sums["maphashing"] + jnp.sum(ap * w_all)
        new["n_valid"] = sums["n_valid"] + jnp.sum(w)
        new["n_queries"] = sums["n_queries"] + jnp.sum(w_all)
        for rk in recall_ks:
            if rk <= k:
                # reference recall is a plain mean over ALL queries
                # (accuracy_calculator.py:50-52 — no lone mask)
                new[f"recall_at_{rk}"] = sums[f"recall_at_{rk}"] + jnp.sum(
                    recall_at_k(rel, rk) * w_all
                )
        if with_curve:
            # full-gallery ranking for the curve (reference semantics);
            # masked slots (self / padded gallery rows) rank last with
            # -inf — zero their relevance so they can't pollute the tail
            scores_f, idx_f = _full_ranking(q_c, off)
            rel_f = _rel_of(ql_c, _labels_of(idx_f))
            rel_f = rel_f * jnp.isfinite(scores_f).astype(rel_f.dtype)
            ranks = jnp.arange(1, n_gallery + 1, dtype=rel_f.dtype)
            cum = jnp.cumsum(rel_f, axis=1)
            prec = cum / ranks[None, :]
            recall = cum / jnp.maximum(counts, 1.0)[:, None]
            ok = (valid & (recall[:, -1] >= 1.0 - 1e-6)).astype(jnp.float32)[:, None]
            new["pr_curve"] = sums["pr_curve"] + (prec * ok).sum(axis=0)
            new["rc_curve"] = sums["rc_curve"] + (recall * ok).sum(axis=0)
            new["n_curve"] = sums["n_curve"] + ok.sum()
        return new, None

    def _masked_scores(q_c, off):
        """(chunk, N) similarity with invalid gallery rows (and self under
        same-source) pushed to -inf."""
        from irw_tpu.ops.distances import is_similarity, pairwise_distance

        mat = pairwise_distance(q_c, gallery, metric)
        if not is_similarity(metric):
            mat = -mat
        if gallery_valid is not None:
            mat = jnp.where(gallery_valid[None, :], mat, -jnp.inf)
        if same_source:
            rows = off + jnp.arange(q_c.shape[0])[:, None]
            cols = jnp.arange(gallery.shape[0])[None, :]
            mat = jnp.where(rows == cols, -jnp.inf, mat)
        return mat

    def _self_knn(q_c, off, depth):
        """same-source: mask self-match by global index."""
        scores, idx = jax.lax.top_k(_masked_scores(q_c, off), depth)
        return idx, scores

    def _full_ranking(q_c, off):
        scores, idx = jax.lax.top_k(_masked_scores(q_c, off), n_gallery)
        return scores, idx

    sums, _ = jax.lax.scan(body, sums_init, (qs, qls, qvs, offsets))
    denom = jnp.maximum(sums["n_valid"], 1.0)
    denom_all = jnp.maximum(sums["n_queries"], 1.0)
    all_query_keys = {"maphashing"} | {f"recall_at_{rk}" for rk in recall_ks}
    out = {
        key: sums[key] / (denom_all if key in all_query_keys else denom)
        for key in sums
        if key not in ("n_valid", "n_queries", "pr_curve", "rc_curve", "n_curve")
    }
    if with_curve:
        curve_denom = jnp.maximum(sums["n_curve"], 1.0)
        out["pr_curve"] = sums["pr_curve"] / curve_denom
        out["rc_curve"] = sums["rc_curve"] / curve_denom
    return out


def _rel_of(query_labels, knn_labels):
    """Relevance of each ranked item: equality for int labels, shared-
    positive for multi-label vectors (accuracy_calculator.py:31-37)."""
    if query_labels.ndim == 1:
        return (query_labels[:, None] == knn_labels).astype(jnp.float32)
    prod = (query_labels[:, None, :].astype(jnp.float32) * knn_labels.astype(jnp.float32)).sum(-1)
    return (prod > 0).astype(jnp.float32)


def compute_retrieval_metrics(
    query,
    query_labels,
    gallery,
    gallery_labels,
    metric: str = "cosine",
    k: int | str | None = None,
    same_source: bool = False,
    recall_ks: Sequence[int] = DEFAULT_RECALL_KS,
    with_curve: bool = False,
    with_hashing_stats: bool = False,
    gallery_valid=None,
    query_chunk: int = 512,
):
    """One call = the reference's CustomCalculator.get_accuracy
    (accuracy_calculator.py:293-363) on device.

    Returns a dict of python floats (plus arrays for the PR curve).
    ``metric='hamming'`` on ±1 codes gives the hashing protocol, including
    the fixed ``maphashing`` (== ``map`` under Hamming ranking at depth k).
    """
    k_resolved = determine_k(query_labels, gallery_labels, k, same_source)
    if gallery_valid is not None:
        # cap to the REAL rows minus the self slot: at k == n_valid under
        # same-source only n_valid-1 finite entries exist per row, and
        # top_k would fill the last slot with the lowest-index -inf entry —
        # the query itself, whose label always matches
        k_resolved = min(
            k_resolved,
            int(np.sum(np.asarray(gallery_valid))) - int(same_source),
        )
    out = _ranked_relevance(
        query,
        query_labels,
        gallery,
        gallery_labels,
        k=k_resolved,
        metric=metric,
        same_source=same_source,
        recall_ks=tuple(recall_ks),
        with_curve=with_curve,
        gallery_valid=gallery_valid,
        query_chunk=query_chunk,
    )
    out = {key: (val if key.endswith("curve") else float(val)) for key, val in out.items()}
    if with_hashing_stats:
        bal = bit_balance(gallery, valid=gallery_valid)
        out["bit_balance"] = float(bal.mean())
        out["worst_bit_balance"] = float(bal.min())
    else:
        # maphashing (all-queries denominator, accuracy_calculator.py:245)
        # is a hashing-protocol metric — only reported there
        out.pop("maphashing", None)
    out["num_k"] = k_resolved
    return out
