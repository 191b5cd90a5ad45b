"""Revisited Oxford/Paris landmark evaluation.

Reference: main/engine/landmark_evaluation.py — trapezoid AP with
junk-rank correction (:15-123), medium/hard protocols (:126-152), per-city
embedding + full gallery·queryᵀ ranking (:155-189).

Protocols (standard revisitop):
- medium: positives = easy ∪ hard, junk = junk;
- hard:   positives = hard,        junk = junk ∪ easy.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def compute_ap(ranks: np.ndarray, nres: int) -> float:
    """Average precision from the sorted ranks (0-based) of the positive
    images among the ranked gallery, junk already removed — the revisitop
    trapezoidal formula (landmark_evaluation.py:15-60)."""
    if nres == 0:
        return 0.0
    ap = 0.0
    recall_step = 1.0 / nres
    for j, rank in enumerate(ranks):
        # revisitop convention: precision before the first retrieved item
        # is 1.0 at rank 0
        precision_0 = 1.0 if rank == 0 else j / rank
        precision_1 = (j + 1) / (rank + 1)
        ap += (precision_0 + precision_1) * recall_step / 2.0
    return ap


def _ap_for_query(order: np.ndarray, positives: set, junk: set):
    """Rank positions of positives after dropping junk (the junk-rank
    correction, landmark_evaluation.py:62-123)."""
    ranks = []
    pos_seen = 0
    junk_seen = 0
    for rank, idx in enumerate(order):
        if idx in junk:
            junk_seen += 1
            continue
        if idx in positives:
            ranks.append(rank - junk_seen)
            pos_seen += 1
    return compute_ap(np.asarray(ranks), len(positives))


def _masks_from_gnd(gnd, num_gallery: int, protocol: str):
    """(Q, G) positive/junk boolean masks for a revisitop protocol."""
    nq = len(gnd)
    pos = np.zeros((nq, num_gallery), bool)
    junk = np.zeros((nq, num_gallery), bool)
    for qi, entry in enumerate(gnd):
        easy = np.atleast_1d(np.asarray(entry.get("easy", []), dtype=np.int64))
        hard = np.atleast_1d(np.asarray(entry.get("hard", []), dtype=np.int64))
        jnk = np.atleast_1d(np.asarray(entry.get("junk", []), dtype=np.int64))
        if protocol == "medium":
            pos[qi, easy] = True
            pos[qi, hard] = True
            junk[qi, jnk] = True
        else:  # hard
            pos[qi, hard] = True
            junk[qi, jnk] = True
            junk[qi, easy] = True
    return pos, junk


@jax.jit
def _batched_junk_corrected_map(query, gallery, pos_mask, junk_mask):
    """Junk-corrected trapezoidal mAP over all queries at once — L2-norm,
    ranking, junk correction and trapezoid AP as one jitted batched program
    (replaces the reference's per-query python loop,
    landmark_evaluation.py:62-123; eager dispatch would pay a per-op round
    trip on remote-attached TPUs).

    For each query: rank the gallery, drop junk by subtracting the running
    junk count from the rank, then accumulate the trapezoid precision terms
    at the (corrected) ranks of the positives.
    """
    q = query / jnp.maximum(jnp.linalg.norm(query, axis=1, keepdims=True), 1e-12)
    gal = gallery / jnp.maximum(jnp.linalg.norm(gallery, axis=1, keepdims=True), 1e-12)
    sims = q @ gal.T
    g = sims.shape[1]

    orders = jnp.argsort(-sims, axis=1)  # (Q, G)
    junk_r = jnp.take_along_axis(junk_mask, orders, axis=1)
    pos_r = jnp.take_along_axis(pos_mask, orders, axis=1) & ~junk_r
    # corrected rank: position minus the number of junk items ranked above
    junk_before = jnp.cumsum(junk_r, axis=1) - junk_r
    rank = jnp.arange(g)[None, :] - junk_before  # (Q, G)
    j = jnp.cumsum(pos_r, axis=1) - 1  # 0-based index among the positives
    prec0 = jnp.where(rank == 0, 1.0, j / jnp.maximum(rank, 1))
    prec1 = (j + 1) / (rank + 1)
    terms = jnp.where(pos_r, (prec0 + prec1) / 2.0, 0.0)
    npos = pos_mask.sum(axis=1)
    ap = terms.sum(axis=1) / jnp.maximum(npos, 1)
    valid = npos > 0
    return jnp.sum(jnp.where(valid, ap, 0.0)) / jnp.maximum(valid.sum(), 1)


def landmark_evaluation(query_emb, gallery_emb, gnd, protocols=("medium", "hard")):
    """mAP per protocol for one city.

    gnd: list per query of {'easy': [...], 'hard': [...], 'junk': [...]}
    (RevisitedDataset.gnd).  Embeddings are L2-normalised descriptors;
    ranking is gallery·queryᵀ (landmark_evaluation.py:155-189).  The whole
    protocol — ranking, junk correction, trapezoid AP — runs as one jitted
    batched program on device; the scalar helpers above are kept as the
    test oracle.
    """
    q = jnp.asarray(query_emb, jnp.float32)
    g = jnp.asarray(gallery_emb, jnp.float32)

    out = {}
    for protocol in protocols:
        pos_mask, junk_mask = _masks_from_gnd(gnd, int(g.shape[0]), protocol)
        out[f"map_{protocol}"] = float(
            _batched_junk_corrected_map(q, g, pos_mask, junk_mask))
    return out


def evaluate_cities(apply_fn, variables, data_dir, cities=("roxford5k", "rparis6k"),
                    host_transform=None, device_transform=None, batch_size=128,
                    num_workers=8):
    """Loop the revisited protocol over cities (the reference's
    landmark_evaluation driver, landmark_evaluation.py:192-211): embeds each
    city's queries + gallery and reports per-city medium/hard mAP."""
    from irw_tpu.data.landmarks import RevisitedDataset
    from irw_tpu.engine.evaluate import compute_embeddings

    results = {}
    for city in cities:
        query_ds = RevisitedDataset(data_dir, city=city, mode="query")
        gallery_ds = RevisitedDataset(data_dir, city=city, mode="gallery")
        q_emb, _ = compute_embeddings(apply_fn, variables, query_ds,
                                      host_transform, device_transform,
                                      batch_size, num_workers)
        g_emb, _ = compute_embeddings(apply_fn, variables, gallery_ds,
                                      host_transform, device_transform,
                                      batch_size, num_workers)
        city_metrics = landmark_evaluation(np.asarray(q_emb), np.asarray(g_emb),
                                           query_ds.gnd)
        for key, value in city_metrics.items():
            results[f"{city}_{key}"] = value
    return results
