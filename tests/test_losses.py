"""Loss tests: AP-surrogate parity with a numpy oracle, gradient flow,
continuation schedules, wrapper composition (the reference's test_loss.py
only checked that gradients flow for one config)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from irw_tpu.losses import LOSS_REGISTRY, build_losses, get_loss
from irw_tpu.losses.base import LossContext
from irw_tpu.utils.label_matrix import create_label_matrix


def make_ctx(rng, b=8, d=16, num_classes=3, multilabel=False, seed_labels=None):
    emb = rng.randn(b, d).astype(np.float32)
    if multilabel:
        labels = (rng.rand(b, num_classes) > 0.5).astype(np.float32)
        labels[labels.sum(1) == 0, 0] = 1.0
    else:
        labels = rng.randint(0, num_classes, size=b)
    emb_j = jnp.asarray(emb)
    norm = emb_j / jnp.linalg.norm(emb_j, axis=1, keepdims=True)
    labels_j = jnp.asarray(labels)
    return LossContext(
        embeddings=emb_j,
        labels=labels_j,
        scores=norm @ norm.T,
        label_matrix=create_label_matrix(labels_j),
    )


def exact_map_from_scores(scores, label_matrix):
    """Brute-force the reference quick_forward at the heaviside limit: for
    each query, AP over the batch (self included, as the reference does)."""
    scores = np.asarray(scores)
    rel = np.asarray(label_matrix)
    b = scores.shape[0]
    aps = []
    for q in range(b):
        order = np.argsort(-scores[q], kind="stable")
        r = rel[q][order]
        mask = order != q  # the engine's eye-mask removes self from ranking
        # reference semantics: rank includes all items except self; pos_rk
        # counts positives (incl. self at rank fixed by +target)
        hits, total, ap = 0, 0, 0.0
        # replicate: rk_i = 1 + #{j≠i: s_j >= s_i}, pos_rk_i = 1 + #{j≠i pos: s_j >= s_i}
        for i in range(b):
            if rel[q, i] == 0:
                continue
            rk = 1 + sum(
                1 for j in range(b) if j != i and scores[q, j] >= scores[q, i]
            )
            pos_rk = 1 + sum(
                1
                for j in range(b)
                if j != i and rel[q, j] > 0 and scores[q, j] >= scores[q, i]
            )
            ap += pos_rk / rk
        aps.append(ap / rel[q].sum())
    return float(np.mean(aps))


def test_heaviside_ap_matches_exact(rng):
    ctx = make_ctx(rng)
    loss = get_loss("HeavisideAP", return_type="mAP")
    val, _ = loss(ctx, None, None)
    expect = exact_map_from_scores(ctx.scores, ctx.label_matrix)
    assert abs(float(val) - expect) < 1e-5


def test_supap_limits(rng):
    ctx = make_ctx(rng)
    heavy = get_loss("HeavisideAP", return_type="mAP")
    v_h, _ = heavy(ctx, None, None)
    # limit case rho=0, offset=1, delta=None, tau→0 = exact heaviside
    sup0 = get_loss("SupAP", tau=1e-5, rho=0.0, offset=1.0, delta=None, return_type="mAP")
    v0, _ = sup0(ctx, None, None)
    assert abs(float(v0) - float(v_h)) < 1e-3
    # the real SupAP over-penalises positive violations → mAP surrogate ≤ exact
    sup = get_loss("SupAP", tau=1e-4, rho=100.0, return_type="mAP")
    v_sup, _ = sup(ctx, None, None)
    assert float(v_sup) <= float(v_h) + 1e-5


@pytest.mark.parametrize("name,kwargs", [
    ("SmoothAP", {}),
    ("SupAP", {}),
    ("SoftBinAP", {}),
    # blackbox grads are rank finite-differences: λ must be large enough to
    # flip at least one rank for a nonzero gradient
    ("BlackBoxAP", {"lambda_val": 500.0}),
])
def test_score_losses_grad_flow(name, kwargs, rng):
    ctx = make_ctx(rng)
    loss = get_loss(name, **kwargs)

    def f(scores):
        c = dataclasses.replace(ctx, scores=scores)
        val, _ = loss(c, None, None)
        return val

    g = jax.grad(f)(ctx.scores)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


@pytest.mark.parametrize("name,kwargs", [
    ("FastAP", {}),
    ("PairLoss", {}),
    ("CalibrationLoss", {}),
    ("SCHLoss", {"nbits": 16}),
    ("HashNetLoss", {"embedding_size": 16}),
    ("CSQLoss", {"embedding_size": 16, "num_classes": 3, "is_multi_label": False}),
])
def test_embedding_losses_grad_flow(name, kwargs, rng):
    ctx = make_ctx(rng)
    loss = get_loss(name, **kwargs)
    state = loss.init_state()

    def f(emb):
        c = dataclasses.replace(ctx, embeddings=emb)
        val, _ = loss(c, {}, state)
        return val

    g = jax.grad(f)(ctx.embeddings)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_hash_loss_proxies_trainable(rng):
    ctx = make_ctx(rng, multilabel=True, num_classes=5, d=16)
    loss = get_loss("HashLoss", num_classes=5, embedding_size=16)
    params = loss.init_params(jax.random.PRNGKey(0))
    assert params["proxies"].shape == (5, 16)

    def f(p):
        val, _ = loss(ctx, p, None)
        return val

    g = jax.grad(f)(params)
    assert float(jnp.abs(g["proxies"]).sum()) > 0


def test_arcface_margin_increases_loss(rng):
    ctx = make_ctx(rng, num_classes=4)
    base = get_loss("ArcFaceLoss", num_classes=4, embedding_size=16, margin=0.0)
    marg = get_loss("ArcFaceLoss", num_classes=4, embedding_size=16, margin=28.6)
    params = base.init_params(jax.random.PRNGKey(0))
    v0, _ = base(ctx, params, None)
    v1, _ = marg(ctx, params, None)
    assert float(v1) > float(v0)


def test_quantization_linear_schedule(rng):
    loss = get_loss("QuantizationLoss", step_type="linear", steps=4, warmup_step=0)
    state = loss.init_state()
    assert float(state["weight"]) == 0.0
    weights = []
    for _ in range(6):
        state = loss.epoch_update(state)
        weights.append(float(state["weight"]))
    np.testing.assert_allclose(weights, [0.25, 0.5, 0.75, 1.0, 1.0, 1.0], atol=1e-6)


def test_quantization_multi_schedule(rng):
    loss = get_loss(
        "QuantizationLoss", step_type="multi", steps=[2, 4], alpha=10.0,
        starting_weight=0.01, warmup_step=True,
    )
    state = loss.init_state()
    weights = []
    for _ in range(5):
        state = loss.epoch_update(state)
        weights.append(round(float(state["weight"]), 6))
    assert weights == [0.0, 0.01, 0.01, 0.1, 0.1]


def test_hashnet_continuation_scale(rng):
    loss = get_loss("HashNetLoss", step_continuation=2, batches_per_epoch=3)
    state = loss.init_state()
    for _ in range(3 * 2):  # 2 epochs worth of batches
        state = loss.step_update(state)
    assert float(state["scale"]) == 2.0


def test_csq_hadamard_centers_orthogonal():
    from irw_tpu.losses.hashing import hadamard_hash_targets

    t = hadamard_hash_targets(10, 16)
    assert t.shape == (10, 16)
    assert set(np.unique(t)) == {-1.0, 1.0}
    # hamming distance between any two hadamard rows is nbits/2
    d = 0.5 * (16 - t[:8] @ t[:8].T)
    off = d[~np.eye(8, dtype=bool)]
    assert (off >= 8).all()


def test_multi_embedding_loss_wrapper(rng):
    ctx = make_ctx(rng)
    branches = [jnp.asarray(rng.randn(8, 16), jnp.float32) for _ in range(3)]
    ctx = dataclasses.replace(ctx, branches=branches)
    loss = get_loss("MultiEmbeddingLoss", loss={"name": "SmoothAP", "kwargs": {}})
    params = loss.init_params(jax.random.PRNGKey(0))
    state = loss.init_state()
    val, _ = loss(ctx, params, state)
    assert np.isfinite(float(val))


def test_multi_loss_nested_config(rng):
    ctx = make_ctx(rng)
    branches = [jnp.asarray(rng.randn(8, 16), jnp.float32) for _ in range(2)]
    ctx = dataclasses.replace(ctx, branches=branches)
    loss = get_loss(
        "MultiLoss",
        losses=[
            [{"name": "SmoothAP", "weight": 1.0}, {"name": "CalibrationLoss", "weight": 0.5}],
            [{"name": "SmoothAP", "weight": 1.0}],
        ],
    )
    state = loss.init_state()
    val, new_state = loss(ctx, loss.init_params(jax.random.PRNGKey(0)), state)
    assert np.isfinite(float(val))
    assert set(new_state) == {"b0_l0", "b0_l1", "b1_l0"}


def test_distillation_teacher_detached(rng):
    branches = [jnp.asarray(rng.randn(4, 8), jnp.float32) for _ in range(3)]
    ctx = LossContext(branches=branches, labels=jnp.arange(4))
    loss = get_loss("FeatureDistillationLoss", teacher_index=0)

    def f(teacher):
        c = dataclasses.replace(ctx, branches=[teacher] + branches[1:])
        return loss(c, None, None)[0]

    g = jax.grad(f)(branches[0])
    assert float(jnp.abs(g).sum()) == 0.0  # teacher is stop-gradiented


def test_loss_config_list(rng):
    """build_losses mirrors config/loss/roadmap_quantization.yaml shape."""
    cfg = [
        {"name": "CalibrationLoss", "weight": 1.0, "kwargs": {"pos_margin": 0.9}},
        {"name": "SupAP", "weight": 1.0, "kwargs": {"tau": 0.01}},
        {"name": "QuantizationLoss", "weight": 1.0,
         "kwargs": {"step_type": "linear", "steps": 10, "warmup_step": 0}},
    ]
    losses = build_losses(cfg)
    assert len(losses) == 3
    ctx = make_ctx(rng)
    for loss, weight in losses:
        val, _ = loss(ctx, loss.init_params(jax.random.PRNGKey(0)), loss.init_state())
        assert np.isfinite(float(val))


def test_xbm_ref_embeddings_path(rng):
    ctx = make_ctx(rng)
    ref = jnp.asarray(rng.randn(20, 16), jnp.float32)
    ref_labels = jnp.asarray(rng.randint(0, 3, size=20))
    ctx = dataclasses.replace(ctx, ref_embeddings=ref, ref_labels=ref_labels)
    for name in ("CalibrationLoss", "PairLoss"):
        val, _ = get_loss(name)(ctx, None, None)
        assert np.isfinite(float(val))


def test_rank_ap_general_path_matches_quick_on_square(rng):
    """Non-square (memory) path must agree with the quick path when the
    gallery happens to equal the batch."""
    ctx = make_ctx(rng)
    for name in ("HeavisideAP", "SmoothAP", "SupAP"):
        loss = get_loss(name, return_type="AP")
        quick = loss.ap_per_query(ctx.scores, ctx.label_matrix.astype(ctx.scores.dtype))
        general = loss.ap_per_query_general(
            ctx.scores, ctx.label_matrix.astype(ctx.scores.dtype)
        )
        # quick path self-ranks include the diagonal (+target), general path
        # ranks a memory that also contains self — identical semantics
        np.testing.assert_allclose(np.asarray(quick), np.asarray(general), atol=1e-5)


def test_rank_ap_with_xbm_memory_scores(rng):
    """(B, M) score matrices (XBM path) run and have gradients."""
    emb = jnp.asarray(rng.randn(8, 16), jnp.float32)
    mem = jnp.asarray(rng.randn(40, 16), jnp.float32)
    labels = jnp.asarray(rng.randint(0, 3, 8))
    mem_labels = jnp.asarray(rng.randint(0, 3, 40))
    e = emb / jnp.linalg.norm(emb, axis=1, keepdims=True)
    m = mem / jnp.linalg.norm(mem, axis=1, keepdims=True)
    ctx = LossContext(scores=e @ m.T, label_matrix=create_label_matrix(labels, mem_labels))
    loss = get_loss("SupAP")

    def f(scores):
        val, _ = loss(dataclasses.replace(ctx, scores=scores), None, None)
        return val

    val = f(ctx.scores)
    assert np.isfinite(float(val))
    g = jax.grad(f)(ctx.scores)
    assert float(jnp.abs(g).sum()) > 0
