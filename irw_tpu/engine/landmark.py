"""Revisited Oxford/Paris landmark evaluation.

Reference: main/engine/landmark_evaluation.py — trapezoid AP with
junk-rank correction (:15-123), medium/hard protocols (:126-152), per-city
embedding + full gallery·queryᵀ ranking (:155-189).

Protocols (standard revisitop):
- medium: positives = easy ∪ hard, junk = junk;
- hard:   positives = hard,        junk = junk ∪ easy.
"""

from __future__ import annotations

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


def landmark_evaluation(query_emb, gallery_emb, gnd, protocols=("medium", "hard")):
    """mAP per protocol for one city.

    gnd: list per query of {'easy': [...], 'hard': [...], 'junk': [...]}
    (RevisitedDataset.gnd).  Embeddings are L2-normalised descriptors;
    ranking is gallery·queryᵀ argsort (landmark_evaluation.py:155-189).
    """
    q = np.asarray(query_emb)
    g = np.asarray(gallery_emb)
    q = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
    g = g / np.maximum(np.linalg.norm(g, axis=1, keepdims=True), 1e-12)
    sims = q @ g.T
    orders = np.argsort(-sims, axis=1)

    out = {}
    for protocol in protocols:
        aps = []
        for qi, entry in enumerate(gnd):
            easy = set(np.atleast_1d(entry.get("easy", [])).tolist())
            hard = set(np.atleast_1d(entry.get("hard", [])).tolist())
            junk = set(np.atleast_1d(entry.get("junk", [])).tolist())
            if protocol == "medium":
                positives, junk_set = easy | hard, junk
            else:
                positives, junk_set = hard, junk | easy
            if not positives:
                continue
            aps.append(_ap_for_query(orders[qi], positives, junk_set))
        out[f"map_{protocol}"] = float(np.mean(aps)) if aps else 0.0
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
