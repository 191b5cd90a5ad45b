"""Retrieval-metric tests against brute-force numpy oracles (the reference
had no such tests; its metric stack was trusted to PML/torchmetrics)."""

import numpy as np
import pytest

from irw_tpu.ops.distances import pairwise_distance
from irw_tpu.ops.knn import knn
from irw_tpu.ops.metrics import compute_retrieval_metrics, determine_k


def brute_force_ap(ranked_rel):
    """torchmetrics.RetrievalMAP semantics: denominator = positives in list."""
    hits = 0
    total = 0.0
    for i, r in enumerate(ranked_rel, start=1):
        if r:
            hits += 1
            total += hits / i
    return total / hits if hits else 0.0


def rank_gallery(q, gallery, metric):
    if metric == "cosine":
        qn = q / np.linalg.norm(q)
        gn = gallery / np.linalg.norm(gallery, axis=1, keepdims=True)
        return np.argsort(-gn @ qn, kind="stable")
    if metric == "l2":
        return np.argsort(np.linalg.norm(gallery - q, axis=1), kind="stable")
    if metric == "hamming":
        return np.argsort(0.5 * (q.shape[0] - gallery @ q), kind="stable")
    raise ValueError(metric)


# --- distances ---------------------------------------------------------------


def test_pairwise_l2_matches_numpy(rng):
    q = rng.randn(7, 16).astype(np.float32)
    g = rng.randn(11, 16).astype(np.float32)
    got = np.asarray(pairwise_distance(q, g, "l2"))
    expect = np.sqrt(((q[:, None] - g[None]) ** 2).sum(-1))
    np.testing.assert_allclose(got, expect, atol=1e-4)


def test_pairwise_hamming_matches_popcount(rng):
    codes_q = np.sign(rng.randn(5, 64)).astype(np.float32)
    codes_g = np.sign(rng.randn(9, 64)).astype(np.float32)
    got = np.asarray(pairwise_distance(codes_q, codes_g, "hamming"))
    expect = (codes_q[:, None] != codes_g[None]).sum(-1) / 1.0
    np.testing.assert_allclose(got, expect, atol=1e-5)


def test_pairwise_cosine_range(rng):
    q = rng.randn(4, 8).astype(np.float32)
    sim = np.asarray(pairwise_distance(q, q, "cosine"))
    np.testing.assert_allclose(np.diag(sim), 1.0, atol=1e-5)
    assert np.abs(sim).max() <= 1.0 + 1e-5


# --- knn ---------------------------------------------------------------------


@pytest.mark.parametrize("metric", ["cosine", "l2", "hamming"])
def test_knn_matches_numpy(metric, rng):
    if metric == "hamming":
        q = np.sign(rng.randn(6, 32)).astype(np.float32)
        g = np.sign(rng.randn(20, 32)).astype(np.float32)
    else:
        q = rng.randn(6, 16).astype(np.float32)
        g = rng.randn(20, 16).astype(np.float32)
    idx, scores = knn(q, g, k=5, metric=metric)
    idx = np.asarray(idx)
    for i in range(q.shape[0]):
        expect = rank_gallery(q[i], g, metric)[:5]
        # hamming has many ties: compare score profiles instead of indices
        if metric == "hamming":
            d = 0.5 * (q.shape[1] - g @ q[i])
            np.testing.assert_allclose(sorted(d[idx[i]]), sorted(d[expect]), atol=1e-4)
        else:
            np.testing.assert_array_equal(idx[i], expect)


def test_knn_drops_self(rng):
    g = rng.randn(10, 8).astype(np.float32)
    idx, _ = knn(g, g, k=3, metric="l2", same_source=True)
    idx = np.asarray(idx)
    for i in range(10):
        assert i not in idx[i]


def test_knn_query_chunking(rng):
    q = rng.randn(30, 8).astype(np.float32)
    g = rng.randn(50, 8).astype(np.float32)
    idx_full, _ = knn(q, g, k=4, metric="cosine")
    idx_chunked, _ = knn(q, g, k=4, metric="cosine", query_chunk=7)
    np.testing.assert_array_equal(np.asarray(idx_full), np.asarray(idx_chunked))


# --- metric suite ------------------------------------------------------------


def test_map_matches_brute_force_int_labels(rng):
    q = rng.randn(12, 8).astype(np.float32)
    g = rng.randn(40, 8).astype(np.float32)
    ql = rng.randint(0, 4, size=12)
    gl = rng.randint(0, 4, size=40)
    out = compute_retrieval_metrics(q, ql, g, gl, metric="cosine", k=40)
    aps = []
    for i in range(12):
        order = rank_gallery(q[i], g, "cosine")
        rel = (gl[order] == ql[i]).astype(float)
        if rel.sum() > 0:
            aps.append(brute_force_ap(rel))
    assert abs(out["map"] - np.mean(aps)) < 1e-5


def test_map_multilabel_matches_brute_force(rng):
    q = rng.randn(10, 8).astype(np.float32)
    g = rng.randn(30, 8).astype(np.float32)
    ql = (rng.rand(10, 5) > 0.6).astype(np.float32)
    gl = (rng.rand(30, 5) > 0.6).astype(np.float32)
    out = compute_retrieval_metrics(q, ql, g, gl, metric="cosine", k=30)
    aps = []
    for i in range(10):
        if (gl @ ql[i] > 0).sum() == 0:
            continue
        order = rank_gallery(q[i], g, "cosine")
        rel = (gl[order] @ ql[i] > 0).astype(float)
        aps.append(brute_force_ap(rel))
    assert abs(out["map"] - np.mean(aps)) < 1e-5


def test_recall_and_p1(rng):
    # identical embeddings per class → perfect retrieval
    emb = np.repeat(np.eye(4, dtype=np.float32), 5, axis=0) + 0.01 * rng.randn(20, 4).astype(np.float32)
    labels = np.repeat(np.arange(4), 5)
    out = compute_retrieval_metrics(emb, labels, emb, labels, metric="cosine", k=4, same_source=True)
    assert out["precision_at_1"] > 0.99
    assert out["recall_at_1"] > 0.99
    assert out["map"] > 0.99


def test_lone_queries_excluded(rng):
    q = rng.randn(5, 8).astype(np.float32)
    g = rng.randn(10, 8).astype(np.float32)
    ql = np.array([0, 0, 1, 1, 99])  # label 99 absent from gallery
    gl = np.array([0, 0, 0, 1, 1, 1, 2, 2, 2, 2])
    out_with = compute_retrieval_metrics(q, ql, g, gl, metric="l2", k=10)
    out_without = compute_retrieval_metrics(q[:4], ql[:4], g, gl, metric="l2", k=10)
    assert abs(out_with["map"] - out_without["map"]) < 1e-5


def test_hashing_protocol_and_bit_balance(rng):
    codes_q = np.sign(rng.randn(8, 16)).astype(np.float32)
    codes_g = np.sign(rng.randn(30, 16)).astype(np.float32)
    ql = rng.randint(0, 3, size=8)
    gl = rng.randint(0, 3, size=30)
    out = compute_retrieval_metrics(
        codes_q, ql, codes_g, gl, metric="hamming", k=30, with_hashing_stats=True
    )
    assert 0.0 <= out["bit_balance"] <= 1.0
    assert out["worst_bit_balance"] <= out["bit_balance"]
    # maphashing must be live (reference bug returns 0.0 unconditionally)
    assert out["maphashing"] == out["map"]
    assert out["maphashing"] > 0.0


def test_determine_k_max_bin_count(rng):
    gl = np.array([0, 0, 0, 1, 1, 2])
    ql = np.array([0, 1])
    assert determine_k(ql, gl, "max_bin_count", same_source=False) == 3
    assert determine_k(ql, gl, 100, same_source=False) == 6


def test_pr_curve_monotone_recall(rng):
    q = rng.randn(6, 8).astype(np.float32)
    g = rng.randn(20, 8).astype(np.float32)
    ql = rng.randint(0, 2, size=6)
    gl = rng.randint(0, 2, size=20)
    out = compute_retrieval_metrics(q, ql, g, gl, metric="l2", k=20, with_curve=True)
    rc = np.asarray(out["rc_curve"])
    assert np.all(np.diff(rc) >= -1e-6)
    assert abs(rc[-1] - 1.0) < 1e-5


def test_map_at_r_le_map(rng):
    q = rng.randn(10, 8).astype(np.float32)
    g = rng.randn(50, 8).astype(np.float32)
    ql = rng.randint(0, 5, size=10)
    gl = rng.randint(0, 5, size=50)
    out = compute_retrieval_metrics(q, ql, g, gl, metric="cosine", k=50)
    assert out["map_at_r"] <= out["map"] + 1e-6
    assert 0.0 <= out["r_precision"] <= 1.0


# --- reference-semantics pins (round-4 metric audit) -------------------------


def test_recall_denominator_is_all_queries(rng):
    """Reference recall_at_k is a plain .mean() over ALL queries
    (accuracy_calculator.py:50-52) — no lone-query mask, unlike map."""
    gallery = rng.randn(6, 8).astype(np.float32)
    g_labels = np.array([0, 0, 1, 1, 2, 3])
    # two queries of class 0 (relevant exists), one of class 9 (lone)
    query = np.stack([gallery[0], gallery[2], rng.randn(8).astype(np.float32)])
    q_labels = np.array([0, 1, 9])
    res = compute_retrieval_metrics(query, q_labels, gallery, g_labels,
                                    metric="l2", k=6)
    # both non-lone queries hit at rank 1 (identical vectors) -> 2 hits / 3
    assert abs(res["recall_at_1"] - 2.0 / 3.0) < 1e-6
    # the lone-masked metrics divide by 2
    assert abs(res["precision_at_1"] - 1.0) < 1e-6


def test_maphashing_denominator_is_all_queries(rng):
    """calculate_maphashing divides by num_query — lone queries contribute
    0 (accuracy_calculator.py:245); `map` divides by non-lone count."""
    codes_g = np.sign(rng.randn(8, 16)).astype(np.float32)
    g_labels = np.array([0, 0, 1, 1, 2, 2, 3, 3])
    codes_q = np.stack([codes_g[0], codes_g[2],
                        np.sign(rng.randn(16)).astype(np.float32)])
    q_labels = np.array([0, 1, 7])  # third query lone
    res = compute_retrieval_metrics(codes_q, q_labels, codes_g, g_labels,
                                    metric="hamming", k=8,
                                    with_hashing_stats=True)
    assert abs(res["maphashing"] - res["map"] * 2.0 / 3.0) < 1e-6


def test_r_precision_torchmetrics_semantics(rng):
    """R = relevant WITHIN the retrieved list (torchmetrics
    RetrievalRPrecision as fed by calculate_rpr), not total relevant in the
    gallery: hits at ranks {1,2} with k=3 and 5 total relevant -> 2/2,
    not 2/5."""
    # gallery: 5 relevant (class 0) + 5 irrelevant; craft distances so only
    # 2 relevant make the top-3
    q = np.zeros((1, 4), np.float32)
    q[0, 0] = 1.0
    gallery = np.zeros((10, 4), np.float32)
    # relevant items: two near the query, three far
    gallery[0, 0] = 0.99
    gallery[1, 0] = 0.98
    gallery[2:5, 1] = 1.0        # far relevant
    gallery[5, 0] = 0.985        # irrelevant but close -> rank 2 or 3
    gallery[6:, 2] = 1.0
    g_labels = np.array([0, 0, 0, 0, 0, 1, 1, 1, 1, 1])
    res = compute_retrieval_metrics(q, np.array([0]), gallery, g_labels,
                                    metric="cosine", k=3)
    # top-3 = {g0, g5, g1}: rel = [1, 0, 1] -> R=2, hits in top-2 = 1 -> 0.5
    assert abs(res["r_precision"] - 0.5) < 1e-6


def test_k_none_means_full_gallery(rng):
    """PML AccuracyCalculator(k=None) ranks the whole gallery; None must
    NOT silently mean max_bin_count."""
    g_labels = np.array([0, 0, 1, 1, 1, 2, 2, 2, 2, 2])
    q_labels = np.array([0, 1])
    assert determine_k(q_labels, g_labels, None, same_source=False) == 10
    assert determine_k(q_labels, g_labels, None, same_source=True) == 9
    assert determine_k(q_labels, g_labels, "max_bin_count",
                       same_source=False) == 5


def test_same_source_padded_gallery_no_self_at_full_depth(rng):
    """Sharded same-source eval: with k == n_valid only n_valid-1 finite
    entries exist per row (self is -inf); the k cap must subtract the self
    slot or top_k resurrects the query itself at the tail rank."""
    from irw_tpu.parallel.eval_sharding import sharded_retrieval_metrics

    emb = rng.randn(10, 8).astype(np.float32)
    labels = np.array([0, 0, 1, 1, 2, 2, 3, 3, 4, 4])
    ref = compute_retrieval_metrics(emb, labels, emb, labels,
                                    metric="cosine", k=None,
                                    same_source=True)
    shard = sharded_retrieval_metrics(emb, labels, emb, labels,
                                      metric="cosine", k=None,
                                      same_source=True)
    for key in ("map", "r_precision", "precision_at_1", "recall_at_1"):
        assert abs(ref[key] - shard[key]) < 1e-5, key


def test_pr_curve_full_depth_includes_hard_queries(rng):
    """The reference's pr_rc curve ranks the FULL gallery, so a query whose
    last relevant item sits outside the top-k still contributes; recall
    must reach 1.0 for every non-lone query."""
    emb = rng.randn(24, 8).astype(np.float32)
    labels = np.array([0, 0, 0, 1, 1, 1] * 4)
    res = compute_retrieval_metrics(emb[:6], labels[:6], emb, labels,
                                    metric="l2", k=3, with_curve=True)
    assert res["pr_curve"].shape == (24,)
    # every query's relevant set (count 12 or 11) is inside the full ranking
    assert abs(float(res["rc_curve"][-1]) - 1.0) < 1e-5
