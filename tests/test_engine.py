"""Engine tests: optimizers/schedulers, XBM, jitted train step, epoch loop
end-to-end on the synthetic dataset, checkpoint round-trip, eval suite."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from irw_tpu.data import SyntheticDataset
from irw_tpu.engine.optimizers import ReduceOnPlateau, build_optimizers, make_schedule
from irw_tpu.engine.train_step import batch_proxy_map, build_train_step
from irw_tpu.engine.xbm import XBM
from irw_tpu.getter import Getter, init_train_state
from irw_tpu.losses import build_losses
from irw_tpu.models import get_model
from irw_tpu.samplers import RandomSampler
from irw_tpu.transforms import build_transforms
import optax


# --- optimizers --------------------------------------------------------------


def test_schedule_semantics():
    cos = make_schedule({"name": "CosineAnnealingLR", "kwargs": {"T_max": 10, "eta_min": 0.0}}, 1.0)
    assert abs(cos(0) - 1.0) < 1e-9
    assert abs(cos(10)) < 1e-9
    ms = make_schedule({"name": "MultiStepLR", "kwargs": {"milestones": [3, 6], "gamma": 0.1}})
    assert ms(2) == 1.0 and abs(ms(3) - 0.1) < 1e-12 and abs(ms(6) - 0.01) < 1e-12
    wc = make_schedule({"name": "warmcos", "kwargs": {"total_steps": 100, "warmup_steps": 10}})
    import math as _m

    assert wc(0) == 0.1  # linear warmup
    # reference takes min(warmup, cosine) — cosine already governs at t=9
    assert abs(wc(9) - (1 + _m.cos(_m.pi * 9 / 100)) / 2) < 1e-9
    assert wc(99) < 0.01

    seq = make_schedule(
        {"name": "SequentialLR", "kwargs": {
            "schedulers": [
                {"name": "ConstantLR"},
                {"name": "MultiStepLR", "kwargs": {"milestones": [1], "gamma": 0.5}},
            ],
            "milestones": [5],
        }}
    )
    assert seq(4) == 1.0 and seq(5) == 1.0 and seq(6) == 0.5


def test_plateau_scheduler():
    p = ReduceOnPlateau(mode="max", factor=0.1, patience=1)
    assert p.update(0.5) == 1.0
    assert p.update(0.4) == 1.0  # 1 bad epoch tolerated
    assert abs(p.update(0.4) - 0.1) < 1e-12  # patience exceeded


def test_build_optimizers_groups():
    params = {
        "backbone": {"kernel": jnp.ones((4, 4)), "bias": jnp.zeros(4)},
        "conv1": {"kernel": jnp.ones((2, 2))},
    }
    cfg = [{
        "name": "AdamW",
        "params": None,
        "kwargs": {"lr": 1e-3, "weight_decay": 1e-4},
        "bias_kwargs": {"lr": 2e-3},
        "modules": [{"name": "conv1", "kwargs": {"lr": 5e-3}}],
        "scheduler_on_epoch": {"name": "CosineAnnealingLR", "kwargs": {"T_max": 10, "eta_min": 0.0}},
    }]
    entries = build_optimizers(cfg, params)
    entry = entries[0]
    assert entry.group_base_lr == {"weight": 1e-3, "bias": 2e-3, "conv1": 5e-3}
    state = entry.tx.init(params)
    lrs = entry.group_lrs(epoch=5, step=0)
    assert lrs["weight"] < 1e-3  # cosine decayed
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    from irw_tpu.engine.optimizers import set_group_lrs

    state = set_group_lrs(state, lrs)
    updates, _ = entry.tx.update(grads, state, params)
    leaves = jax.tree_util.tree_leaves(updates)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)


# --- XBM ---------------------------------------------------------------------


def test_xbm_unique_slots():
    xbm = XBM(size=10, embedding_dim=4, unique=True)
    state = xbm.init()
    emb = jnp.ones((3, 4))
    state = xbm.update(state, emb, jnp.asarray([1, 2, 3]), jnp.asarray([0, 5, 9]))
    e, l, v = xbm.contents(state)
    assert bool(v[0]) and bool(v[5]) and bool(v[9]) and not bool(v[1])
    # re-insert same index overwrites the slot
    state = xbm.update(state, 2 * emb, jnp.asarray([1, 2, 3]), jnp.asarray([0, 5, 9]))
    e, _, v = xbm.contents(state)
    assert float(e[0, 0]) == 2.0 and int(v.sum()) == 3


def test_xbm_ring_mode():
    xbm = XBM(size=4, embedding_dim=2, unique=False)
    state = xbm.init()
    for i in range(3):
        state = xbm.update(
            state, jnp.full((2, 2), i, jnp.float32), jnp.asarray([i, i]), jnp.asarray([0, 1])
        )
    e, _, v = xbm.contents(state)
    assert int(v.sum()) == 4  # wrapped around
    assert float(e[0, 0]) == 2.0  # oldest overwritten


# --- proxy map ---------------------------------------------------------------


def test_batch_proxy_map_perfect():
    emb = jnp.asarray(np.repeat(np.eye(3, dtype=np.float32), 2, axis=0))
    labels = jnp.asarray([0, 0, 1, 1, 2, 2])
    assert float(batch_proxy_map(emb, labels)) > 0.99


# --- end-to-end train step + loop --------------------------------------------


@pytest.fixture(scope="module")
def tiny_setup():
    dataset = SyntheticDataset(num_samples=64, num_classes=4, image_size=32, seed=0)
    (host_t, device_t), _ = Getter().get_transform(
        {"train": {"Resize": {"size": 32}, "CustomTransform": {"decompose_levels": 1}},
         "test": {"Resize": {"size": 32}, "CustomTransform": {"decompose_levels": 1}}}
    )
    model = get_model(
        "multidino_attention_hashing_ortho",
        backbone="vit_tiny",
        nbits=16,
        frozen_backbone=False,
        fusion_config={"type": "cross_attention_advanced", "output_dim": 64,
                       "num_queries": 2, "num_heads": 2, "ortho_weight": 0.01},
    )
    losses = build_losses([
        {"name": "HashLoss", "weight": 1.0,
         "kwargs": {"num_classes": 4, "embedding_size": 16}},
    ])
    return dataset, host_t, device_t, model, losses


def _make_batch(dataset, host_t, indices, seed=0):
    rng = np.random.RandomState(seed)
    images = np.stack([host_t(dataset.load_image(i), rng, True) for i in indices])
    return {
        "image": images,
        "label": dataset.labels[np.asarray(indices)],
        "index": np.asarray(indices),
    }


@pytest.mark.slow
def test_train_step_runs_and_learns(tiny_setup):
    dataset, host_t, device_t, model, losses = tiny_setup
    cfg = [{"name": "AdamW", "params": None, "kwargs": {"lr": 3e-3, "weight_decay": 0.0}}]
    batch = _make_batch(dataset, host_t, np.arange(16))

    import optax as _optax

    loss_tx = _optax.adamw(1e-3)
    from irw_tpu.getter import init_train_state

    # init needs the device-transformed sample
    entries = None
    state0_vars = None
    # build params first to get optimizer targets
    x = device_t(batch["image"])
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
         "band_drop": jax.random.PRNGKey(2)}, x, train=True,
    )
    entries = build_optimizers(cfg, variables["params"])
    state = init_train_state(
        model, losses, entries, loss_tx, batch, device_transform=device_t, seed=0
    )

    step = jax.jit(build_train_step(
        model, losses, entries, loss_tx, device_transform=device_t, clip_grad=5.0,
    ))
    from irw_tpu.engine.train import _build_hyper

    losses_seen = []
    for i in range(8):
        hyper = _build_hyper(entries, epoch=1, step=i, warm_up=0, warm_up_key=None)
        state, metrics = step(state, batch, hyper)
        losses_seen.append(float(metrics["total_loss"]))
    assert np.isfinite(losses_seen).all()
    assert losses_seen[-1] < losses_seen[0]  # it learns on a fixed batch
    assert float(metrics["grad_norm"]) > 0


@pytest.mark.slow
def test_train_step_warmup_gating(tiny_setup):
    dataset, host_t, device_t, model, losses = tiny_setup
    cfg = [{"name": "AdamW", "params": None, "kwargs": {"lr": 1e-2}}]
    batch = _make_batch(dataset, host_t, np.arange(8))
    x = device_t(batch["image"])
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
         "band_drop": jax.random.PRNGKey(2)}, x, train=True,
    )
    entries = build_optimizers(cfg, variables["params"])
    loss_tx = optax.adamw(1e-3)
    state = init_train_state(model, losses, entries, loss_tx, batch, device_transform=device_t)
    step = jax.jit(build_train_step(model, losses, entries, loss_tx, device_transform=device_t))
    from irw_tpu.engine.train import _build_hyper

    # warm_up=5, key None → optimizer inactive → params unchanged
    hyper = _build_hyper(entries, epoch=1, step=0, warm_up=5, warm_up_key=None)
    before = jax.tree_util.tree_leaves(state.params)[0].copy()
    state2, _ = step(state, batch, hyper)
    after = jax.tree_util.tree_leaves(state2.params)[0]
    np.testing.assert_allclose(np.asarray(before), np.asarray(after))


@pytest.mark.slow
def test_xbm_in_step(tiny_setup):
    """XBM-active step computes BOTH the batch-vs-batch and batch-vs-memory
    loss terms, the memory one scaled by memory.weight
    (base_update.py:81-113)."""
    dataset, host_t, device_t, model, _ = tiny_setup
    losses = build_losses([
        {"name": "CalibrationLoss", "weight": 1.0, "kwargs": {}},
        {"name": "SmoothAP", "weight": 2.0, "kwargs": {"tau": 0.01}},
    ])
    cfg = [{"name": "AdamW", "params": None, "kwargs": {"lr": 1e-3}}]
    xbm = XBM(size=len(dataset), embedding_dim=16, unique=True,
              activate_after=0, weight=0.5)
    batch = _make_batch(dataset, host_t, np.arange(8))
    x = device_t(batch["image"])
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
         "band_drop": jax.random.PRNGKey(2)}, x, train=True,
    )
    entries = build_optimizers(cfg, variables["params"])
    loss_tx = optax.adamw(1e-3)
    state = init_train_state(
        model, losses, entries, loss_tx, batch, device_transform=device_t, xbm=xbm
    )
    step = jax.jit(build_train_step(
        model, losses, entries, loss_tx, xbm=xbm, device_transform=device_t, xbm_active=True,
    ))
    from irw_tpu.engine.train import _build_hyper

    hyper = _build_hyper(entries, 1, 0, 0, None)
    state, metrics = step(state, batch, hyper)
    assert int(jax.device_get(state.xbm.valid.sum())) == 8
    m = {k: float(v) for k, v in jax.device_get(metrics).items()}
    assert np.isfinite(m["total_loss"])
    # both terms logged for both loss kinds
    assert "loss_0_CalibrationLoss" in m and "loss_0_memory_CalibrationLoss" in m
    assert "loss_1_SmoothAP" in m and "loss_1_memory_SmoothAP" in m
    expected = (
        1.0 * m["loss_0_CalibrationLoss"] + 1.0 * 0.5 * m["loss_0_memory_CalibrationLoss"]
        + 2.0 * m["loss_1_SmoothAP"] + 2.0 * 0.5 * m["loss_1_memory_SmoothAP"]
        + m["ortho_loss"]
    )
    assert abs(m["total_loss"] - expected) < 1e-5


def test_xbm_invalid_slots_inert_in_scores():
    """A SCORES loss on a partially-filled memory equals the same loss on
    only the valid slots: invalid slots (score −4, relevance 0) must not act
    as mid-ranked negatives."""
    import jax.numpy as jnp

    from irw_tpu.losses import get_loss
    from irw_tpu.losses.base import LossContext

    rng = np.random.RandomState(3)
    e = rng.randn(4, 8).astype(np.float32)
    e /= np.linalg.norm(e, axis=1, keepdims=True)
    mem = rng.randn(10, 8).astype(np.float32)
    mem /= np.linalg.norm(mem, axis=1, keepdims=True)
    labels = np.array([0, 1, 0, 1])
    mem_labels = rng.randint(0, 2, 10)
    valid = np.array([True] * 6 + [False] * 4)

    scores_full = e @ mem.T
    scores_full = np.where(valid[None, :], scores_full, -4.0)
    rel_full = (labels[:, None] == mem_labels[None, :]) & valid[None, :]

    loss = get_loss("SmoothAP", tau=0.01, return_type="mAP")
    full = float(loss(LossContext(
        scores=jnp.asarray(scores_full),
        label_matrix=jnp.asarray(rel_full, np.float32)), None, None)[0])
    only_valid = float(loss(LossContext(
        scores=jnp.asarray((e @ mem[valid].T)),
        label_matrix=jnp.asarray(
            (labels[:, None] == mem_labels[None, valid]), np.float32)), None, None)[0])
    assert abs(full - only_valid) < 1e-5


@pytest.mark.slow
def test_full_train_loop_and_eval(tiny_setup, tmp_path):
    dataset, host_t, device_t, model, losses = tiny_setup
    from irw_tpu.engine.train import train

    cfg_opt = [{"name": "AdamW", "params": None, "kwargs": {"lr": 3e-3},
                "scheduler_on_epoch": {"name": "CosineAnnealingLR",
                                       "kwargs": {"T_max": 4, "eta_min": 1e-5}}}]
    sampler = RandomSampler(dataset, batch_size=16, seed=0)
    batch = _make_batch(dataset, host_t, np.arange(16))
    x = device_t(batch["image"])
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
         "band_drop": jax.random.PRNGKey(2)}, x, train=True,
    )
    entries = build_optimizers(cfg_opt, variables["params"])
    loss_tx = optax.adamw(1e-3)
    state = init_train_state(model, losses, entries, loss_tx, batch, device_transform=device_t)

    eval_ds = SyntheticDataset(num_samples=32, num_classes=4, image_size=32, seed=7)
    config = {"experience": {
        "max_iter": 2, "train_eval_freq": 2, "eval_bs": 32, "num_workers": 2,
        "principal_metric": "map_level0", "eval_split": "test",
        "distance_metric": "hamming", "seed": 0,
        "profile_epoch": 1,  # jax.profiler trace for epoch 1 (SURVEY §5.1)
    }}
    state, metrics = train(
        model, state, losses, entries, loss_tx, dataset, sampler,
        {"test": eval_ds}, host_t, device_t, config, str(tmp_path),
    )
    assert "test" in metrics
    assert "map_level0" in metrics["test"]
    assert 0.0 <= metrics["test"]["map_level0"] <= 1.0
    # rolling checkpoint written
    assert os.path.exists(os.path.join(str(tmp_path), "weights", "rolling"))
    # metrics logged
    assert os.path.exists(os.path.join(str(tmp_path), "metrics.jsonl"))
    # profiler trace emitted for the requested epoch
    assert os.path.isdir(os.path.join(str(tmp_path), "profile"))


@pytest.mark.slow
def test_checkpoint_roundtrip(tiny_setup, tmp_path):
    dataset, host_t, device_t, model, losses = tiny_setup
    from irw_tpu.engine.checkpoint import load_checkpoint, save_checkpoint

    cfg = [{"name": "AdamW", "params": None, "kwargs": {"lr": 1e-3}}]
    batch = _make_batch(dataset, host_t, np.arange(8))
    x = device_t(batch["image"])
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
         "band_drop": jax.random.PRNGKey(2)}, x, train=True,
    )
    entries = build_optimizers(cfg, variables["params"])
    state = init_train_state(model, losses, entries, optax.adamw(1e-3), batch,
                             device_transform=device_t)
    save_checkpoint(str(tmp_path), state, {"a": 1}, epoch=3, score=0.5)
    restored, meta = load_checkpoint(str(tmp_path))
    assert meta["epoch"] == 3 and meta["config"] == {"a": 1}
    orig = jax.tree_util.tree_leaves(jax.device_get(state.params))
    back = jax.tree_util.tree_leaves(restored["params"])
    for a, b in zip(orig, back):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # async save: immediate load barriers on the in-flight write and sees
    # the new epoch, never a half-written checkpoint
    save_checkpoint(str(tmp_path), state, {"a": 2}, epoch=4, score=0.6,
                    async_save=True)
    restored2, meta2 = load_checkpoint(str(tmp_path))
    assert meta2["epoch"] == 4 and meta2["config"] == {"a": 2}
    for a, b in zip(orig, jax.tree_util.tree_leaves(restored2["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_splits():
    from irw_tpu.engine.splits import get_splits

    labels = np.repeat(np.arange(8), 10)
    supers = np.repeat(np.arange(4), 20)
    for kind in ("class_disjoint", "hierarchical", "closed_set"):
        folds = get_splits(labels, supers, kind=kind, n_splits=4, seed=0)
        assert len(folds) == 4
        for tr, va in folds:
            assert len(set(tr) & set(va)) == 0
            if kind != "closed_set":
                assert len(set(labels[tr]) & set(labels[va])) == 0


def test_landmark_eval_protocol():
    from irw_tpu.engine.landmark import landmark_evaluation

    rng = np.random.RandomState(0)
    g = rng.randn(20, 8).astype(np.float32)
    q = g[[0, 5]] + 0.01 * rng.randn(2, 8).astype(np.float32)
    gnd = [
        {"easy": [0, 1], "hard": [2], "junk": [3]},
        {"easy": [5], "hard": [6], "junk": []},
    ]
    out = landmark_evaluation(q, g, gnd)
    assert set(out) == {"map_medium", "map_hard"}
    assert 0.0 <= out["map_medium"] <= 1.0


@pytest.mark.slow
def test_evaluate_query_gallery_dict(tiny_setup):
    """InShop/hashing-style eval: separate query and gallery datasets
    (getter.py:169-233 / evaluate.py:101-135)."""
    dataset, host_t, device_t, model, losses = tiny_setup
    from irw_tpu.data import SyntheticDataset
    from irw_tpu.engine.evaluate import evaluate

    query = SyntheticDataset(num_samples=16, num_classes=4, image_size=32, seed=11)
    gallery = SyntheticDataset(num_samples=48, num_classes=4, image_size=32, seed=12)
    batch = _make_batch(dataset, host_t, np.arange(8))
    x = device_t(batch["image"])
    variables = m_vars = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
         "band_drop": jax.random.PRNGKey(2)}, x, train=True,
    )

    def apply_eval(v, inp):
        return model.apply(v, inp, train=False)

    out = evaluate(
        apply_eval, variables, {"query": query, "gallery": gallery},
        host_t, device_t, batch_size=16, num_workers=0,
        top_k=48, distance_metric="hamming",
    )
    assert "map_level0" in out
    assert 0.0 <= out["map_level0"] <= 1.0


@pytest.mark.slow
def test_landmark_dataset_routing(tmp_path, rng):
    """Datasets carrying gnd route to the revisited protocol."""
    from irw_tpu.engine.evaluate import evaluate
    from irw_tpu.data import SyntheticDataset

    query = SyntheticDataset(num_samples=4, num_classes=2, image_size=32, seed=1)
    gallery = SyntheticDataset(num_samples=12, num_classes=2, image_size=32, seed=2)
    query.gnd = [
        {"easy": [0, 1], "hard": [2], "junk": [3]} for _ in range(4)
    ]
    from irw_tpu.models import get_model

    model = get_model("dino_hash_baseline", backbone="vit_tiny", nbits=8)
    x = jnp.zeros((2, 32, 32, 3))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
         "band_drop": jax.random.PRNGKey(2)}, x, train=False,
    )

    def apply_eval(v, inp):
        return model.apply(v, inp, train=False)

    from irw_tpu.transforms import build_transforms

    host_t, device_t = build_transforms({"Resize": {"size": 32}})
    out = evaluate(apply_eval, variables, {"query": query, "gallery": gallery},
                   host_t, device_t, batch_size=8, num_workers=0)
    assert set(out) == {"map_medium", "map_hard"}


@pytest.mark.slow
def test_training_improves_retrieval(tiny_setup, tmp_path):
    """Learning guard: a few epochs on separable synthetic classes must lift
    Hamming mAP clearly above the untrained model's."""
    dataset, host_t, device_t, model, losses = tiny_setup
    from irw_tpu.engine.evaluate import evaluate
    from irw_tpu.engine.train import train

    eval_ds = SyntheticDataset(num_samples=48, num_classes=4, image_size=32, seed=9)

    def apply_eval(v, inp):
        return model.apply(v, inp, train=False)

    cfg_opt = [{"name": "AdamW", "params": None, "kwargs": {"lr": 3e-3}}]
    batch = _make_batch(dataset, host_t, np.arange(16))
    x = device_t(batch["image"])
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
         "band_drop": jax.random.PRNGKey(2)}, x, train=True,
    )
    before = evaluate(apply_eval, variables, eval_ds, host_t, device_t,
                      batch_size=48, num_workers=0, distance_metric="hamming")

    entries = build_optimizers(cfg_opt, variables["params"])
    loss_tx = optax.adamw(1e-3)
    state = init_train_state(model, losses, entries, loss_tx, batch,
                             device_transform=device_t, seed=0)
    sampler = RandomSampler(dataset, batch_size=16, seed=0)
    config = {"experience": {"max_iter": 3, "train_eval_freq": 3, "eval_bs": 48,
                             "num_workers": 0, "distance_metric": "hamming",
                             "use_mesh": False, "seed": 0}}
    state, metrics = train(model, state, losses, entries, loss_tx, dataset,
                           sampler, {"test": eval_ds}, host_t, device_t,
                           config, str(tmp_path))
    after = metrics["test"]["map_level0"]
    assert after > before["map_level0"] + 0.05, (before["map_level0"], after)


def test_landmark_ap_hand_computed():
    """Junk-corrected AP on a hand-worked example (revisitop trapezoid)."""
    from irw_tpu.engine.landmark import _ap_for_query, compute_ap

    # ranked order: [junk, pos, neg, pos]; junk removed -> positives at
    # corrected ranks 0 and 2 among [pos, neg, pos]
    order = np.array([10, 0, 11, 1])
    positives, junk = {0, 1}, {10}
    ap = _ap_for_query(order, positives, junk)
    # revisitop trapezoid: rank 0 -> (precision_0 = 1.0 by convention,
    # precision_1 = 1/1); rank 2 -> precision_0 = 1/2, precision_1 = 2/3
    expected = ((1.0 + 1.0) / 2 + (0.5 + 2.0 / 3.0) / 2) / 2
    assert abs(ap - expected) < 1e-9
    # perfect retrieval: AP = 1
    assert compute_ap(np.array([0, 1, 2]), 3) == pytest.approx(1.0)


@pytest.mark.slow
def test_xbm_with_score_loss(tiny_setup):
    """SCORES losses against the (B, M) memory matrix — the path that was
    broken before the rank-AP general path existed."""
    dataset, host_t, device_t, model, _ = tiny_setup
    losses = build_losses([
        {"name": "CalibrationLoss", "weight": 1.0, "kwargs": {}},
        {"name": "SupAP", "weight": 1.0, "kwargs": {}},
    ])
    cfg = [{"name": "AdamW", "params": None, "kwargs": {"lr": 1e-3}}]
    xbm = XBM(size=64, embedding_dim=16, unique=True, activate_after=0)
    batch = _make_batch(dataset, host_t, np.arange(8))
    x = device_t(batch["image"])
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
         "band_drop": jax.random.PRNGKey(2)}, x, train=True,
    )
    entries = build_optimizers(cfg, variables["params"])
    loss_tx = optax.adamw(1e-3)
    state = init_train_state(model, losses, entries, loss_tx, batch,
                             device_transform=device_t, xbm=xbm)
    step = jax.jit(build_train_step(
        model, losses, entries, loss_tx, xbm=xbm, device_transform=device_t,
        xbm_active=True,
    ))
    from irw_tpu.engine.train import _build_hyper

    state, metrics = step(state, batch, _build_hyper(entries, 1, 0, 0, None))
    assert np.isfinite(float(metrics["total_loss"]))


@pytest.mark.slow
def test_evaluate_with_distractors(tiny_setup):
    """Distractor gallery augmentation: extra never-relevant items can only
    lower the metrics (evaluate.py:101-135)."""
    dataset, host_t, device_t, model, _ = tiny_setup
    from irw_tpu.engine.evaluate import evaluate

    query = SyntheticDataset(num_samples=8, num_classes=4, image_size=32, seed=21)
    gallery = SyntheticDataset(num_samples=24, num_classes=4, image_size=32, seed=22)
    distractor = SyntheticDataset(num_samples=16, num_classes=4, image_size=32, seed=23)
    batch = _make_batch(dataset, host_t, np.arange(8))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
         "band_drop": jax.random.PRNGKey(2)}, device_t(batch["image"]), train=True,
    )

    def apply_eval(v, inp):
        return model.apply(v, inp, train=False)

    plain = evaluate(apply_eval, variables, {"query": query, "gallery": gallery},
                     host_t, device_t, batch_size=8, num_workers=0,
                     distance_metric="cosine")
    with_d = evaluate(apply_eval, variables,
                      {"query": query, "gallery": gallery, "distractor": distractor},
                      host_t, device_t, batch_size=8, num_workers=0,
                      distance_metric="cosine")
    assert with_d["map_level0"] <= plain["map_level0"] + 1e-6


def test_per_loss_optimizer_hyperparams():
    """Each loss's nested optimizer config gets its own transform
    (hash_loss.yaml's per-loss optimizer, hash_loss.py:29-31)."""
    import optax

    from irw_tpu.getter import Getter

    cfg = [
        {"name": "HashLoss", "weight": 1.0,
         "kwargs": {"num_classes": 4, "embedding_size": 8,
                    "optimizer": {"name": "AdamW", "kwargs": {"lr": 1.0}}}},
        {"name": "ArcFaceLoss", "weight": 1.0,
         "kwargs": {"num_classes": 4, "embedding_size": 8,
                    "optimizer": {"name": "AdamW", "kwargs": {"lr": 1e-6}}}},
    ]
    from irw_tpu.losses import build_losses

    losses = build_losses(cfg)
    tx = Getter().get_loss_optimizer(cfg)
    params = {
        str(i): loss.init_params(jax.random.PRNGKey(i)) for i, (loss, _) in enumerate(losses)
    }
    state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    big = float(jnp.abs(updates["0"]["proxies"]).mean())
    small = float(jnp.abs(updates["1"]["weights"]).mean())
    assert big > 1e-2 and small < 1e-4  # lr 1.0 vs 1e-6


def test_freeze_helpers_build_optimizer_masks():
    from irw_tpu.engine.optimizers import build_optimizers
    from irw_tpu.utils import combine, freeze_pos_embedding

    params = {"pos_embed": jnp.ones((1, 5, 8)), "cls_token": jnp.ones((1, 1, 8)),
              "head": {"kernel": jnp.ones((8, 4))}}
    frozen = combine(freeze_pos_embedding())
    entries = build_optimizers(
        [{"name": "AdamW", "params": None, "kwargs": {"lr": 1e-2}}],
        params, frozen_collections=frozen,
    )
    tx = entries[0].tx
    state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    from irw_tpu.engine.optimizers import set_group_lrs

    state = set_group_lrs(state, entries[0].group_lrs(1, 0))
    updates, _ = tx.update(grads, state, params)
    assert float(jnp.abs(updates["pos_embed"]).sum()) == 0.0  # frozen
    assert float(jnp.abs(updates["head"]["kernel"]).sum()) > 0.0


def test_landmark_vectorized_matches_scalar_oracle():
    """The batched junk-corrected mAP equals the per-query scalar loop
    (kept as oracle) on random gnd structures at roxford-like density."""
    from irw_tpu.engine.landmark import (
        _ap_for_query,
        landmark_evaluation,
    )

    rng = np.random.RandomState(7)
    nq, ng, d = 12, 120, 16
    q = rng.randn(nq, d).astype(np.float32)
    g = rng.randn(ng, d).astype(np.float32)
    gnd = []
    for _ in range(nq):
        perm = rng.permutation(ng)
        n_easy, n_hard, n_junk = rng.randint(0, 10, 3)
        gnd.append({
            "easy": perm[:n_easy],
            "hard": perm[n_easy:n_easy + n_hard],
            "junk": perm[n_easy + n_hard:n_easy + n_hard + n_junk],
        })

    out = landmark_evaluation(q, g, gnd)

    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    gn = g / np.linalg.norm(g, axis=1, keepdims=True)
    orders = np.argsort(-(qn @ gn.T), axis=1)
    for protocol in ("medium", "hard"):
        aps = []
        for qi, entry in enumerate(gnd):
            easy, hard = set(entry["easy"].tolist()), set(entry["hard"].tolist())
            junk = set(entry["junk"].tolist())
            if protocol == "medium":
                pos, jnk = easy | hard, junk
            else:
                pos, jnk = hard, junk | easy
            if not pos:
                continue
            aps.append(_ap_for_query(orders[qi], pos, jnk))
        expected = float(np.mean(aps)) if aps else 0.0
        assert abs(out[f"map_{protocol}"] - expected) < 1e-5, protocol


@pytest.mark.slow
def test_async_checkpoint_crash_window(tmp_path):
    """Kill the process while an async rolling save is in flight: the
    on-disk checkpoint must be either the previous complete save or the
    new complete save — never torn (orbax commits via tmp-dir + rename).
    VERDICT r2 #9: the crash-window case the roundtrip test didn't cover."""
    import subprocess
    import sys
    import textwrap

    script = textwrap.dedent(f"""
        import jax; jax.config.update("jax_platforms", "cpu")
        import os, numpy as np, optax
        from irw_tpu.data import SyntheticDataset
        from irw_tpu.engine.optimizers import build_optimizers
        from irw_tpu.engine.checkpoint import save_checkpoint
        from irw_tpu.getter import init_train_state
        from irw_tpu.losses import build_losses
        from irw_tpu.models import get_model

        model = get_model("dino_hash_baseline", backbone="vit_tiny", nbits=8)
        losses = build_losses([{{"name": "SupAP", "weight": 1.0}}])
        rng = np.random.RandomState(0)
        batch = {{"image": rng.rand(4, 32, 32, 3).astype(np.float32),
                 "label": np.arange(4), "index": np.arange(4)}}
        entries = build_optimizers(
            [{{"name": "AdamW", "params": None, "kwargs": {{"lr": 1e-3}}}}],
            model.init({{"params": jax.random.PRNGKey(0),
                       "dropout": jax.random.PRNGKey(1),
                       "band_drop": jax.random.PRNGKey(2)}},
                      batch["image"], train=True)["params"])
        state = init_train_state(model, losses, entries, optax.adamw(1e-3), batch)
        # epoch 1: committed synchronously (the known-good rolling save)
        save_checkpoint({str(tmp_path)!r}, state, {{"e": 1}}, epoch=1)
        # epoch 2: async save, then die immediately — mid-flight window
        save_checkpoint({str(tmp_path)!r}, state, {{"e": 2}}, epoch=2,
                        async_save=True)
        os._exit(1)   # no atexit, no orbax wait: simulates a crash
    """)
    proc = subprocess.run([sys.executable, "-c", script],
                          cwd="/root/repo", capture_output=True, text=True)
    assert proc.returncode == 1, proc.stderr[-2000:]

    from irw_tpu.engine.checkpoint import load_checkpoint

    out = load_checkpoint(str(tmp_path))
    assert out is not None, "crash destroyed the previous rolling checkpoint"
    restored, meta = out
    # either the old complete save or the new complete save — never torn
    assert meta["epoch"] in (1, 2)
    leaves = jax.tree_util.tree_leaves(restored["params"])
    assert leaves and all(np.all(np.isfinite(np.asarray(l))) for l in leaves)


@pytest.mark.slow
def test_runtime_ortho_scale_scales_penalty():
    """experience.ortho_scale feeds λ through ``hyper`` as an array so λ
    sweeps share one compiled step: parts['ortho_loss'] must scale exactly
    and the scaled term must enter total_loss (train_step.py ortho block)."""
    import optax

    from irw_tpu.engine.optimizers import build_optimizers
    from irw_tpu.engine.train import _build_hyper
    from irw_tpu.engine.train_step import build_train_step
    from irw_tpu.getter import init_train_state
    from irw_tpu.losses import build_losses
    from irw_tpu.models import get_model

    rng = np.random.RandomState(0)
    model = get_model(
        "multidino_attention_hashing_ortho", backbone="vit_tiny", nbits=8,
        fusion_config={"type": "cross_attention_advanced", "output_dim": 32,
                       "num_queries": 2, "num_heads": 2,
                       "ortho_weight": 1.0})
    losses = build_losses([{"name": "HashLoss", "weight": 1.0,
                            "kwargs": {"num_classes": 4,
                                       "embedding_size": 8}}])
    batch = {
        "image": rng.randint(0, 255, (8, 4, 16, 16, 3), dtype=np.uint8),
        "label": rng.randint(0, 4, 8),
        "index": np.arange(8),
    }
    bands = jnp.asarray(batch["image"], jnp.float32) / 255.0
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
         "band_drop": jax.random.PRNGKey(2)}, bands, train=True)
    entries = build_optimizers(
        [{"name": "AdamW", "params": None, "kwargs": {"lr": 1e-3}}],
        variables["params"])
    state = init_train_state(model, losses, entries, optax.adamw(1e-3),
                             batch, seed=0)
    step = jax.jit(build_train_step(model, losses, entries,
                                    optax.adamw(1e-3)))

    out = {}
    for scale in (0.0, 1.0, 10.0):
        hyper = _build_hyper(entries, 1, 0, 0, None, ortho_scale=scale)
        _, metrics = step(state, batch, hyper)
        out[scale] = {k: float(v) for k, v in jax.device_get(metrics).items()}

    assert out[0.0]["ortho_loss"] == 0.0
    assert out[1.0]["ortho_loss"] > 0.0
    np.testing.assert_allclose(out[10.0]["ortho_loss"],
                               10.0 * out[1.0]["ortho_loss"], rtol=1e-5)
    np.testing.assert_allclose(
        out[10.0]["total_loss"] - out[0.0]["total_loss"],
        out[10.0]["ortho_loss"], rtol=1e-4, atol=1e-6)


def test_evaluate_self_gallery_distractor_drops_self(tiny_setup):
    """The distractor protocol without a query/gallery split (getter wraps
    ONE dataset as both): the reference's ('test', ['test','distractor'])
    split runs same-source with drop-self — precision@1 must NOT be the
    trivial 1.0 of every query retrieving itself."""
    dataset, host_t, device_t, model, _ = tiny_setup
    from irw_tpu.engine.evaluate import evaluate

    test = SyntheticDataset(num_samples=16, num_classes=4, image_size=32,
                            seed=31)
    distractor = SyntheticDataset(num_samples=8, num_classes=4,
                                  image_size=32, seed=32)
    batch = _make_batch(dataset, host_t, np.arange(8))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
         "band_drop": jax.random.PRNGKey(2)}, device_t(batch["image"]),
        train=True,
    )

    def apply_eval(v, inp):
        return model.apply(v, inp, train=False)

    same = evaluate(apply_eval, variables,
                    {"query": test, "gallery": test, "distractor": distractor},
                    host_t, device_t, batch_size=8, num_workers=0,
                    distance_metric="cosine")
    baseline = evaluate(apply_eval, variables, test, host_t, device_t,
                        batch_size=8, num_workers=0,
                        distance_metric="cosine")
    # identical up to the distractor's (metric-lowering) extra gallery rows;
    # in particular NOT self-inflated above the plain same-source eval
    assert same["precision_at_1_level0"] <= baseline["precision_at_1_level0"] + 1e-6
    assert same["map_level0"] <= baseline["map_level0"] + 1e-6


def test_binary_int_labels_are_multilabel():
    """2-D int/bool 0/1 label matrices use dot-product relevance, not
    per-level equality (where sharing the ABSENCE of a class counts)."""
    from irw_tpu.engine.evaluate import _looks_multilabel, _metric_suite

    rng_l = np.random.RandomState(0)
    labels = (rng_l.rand(12, 5) > 0.6).astype(np.int8)
    labels[0] = 0  # ensure one all-zero row stays harmless
    assert _looks_multilabel(labels)
    assert _looks_multilabel(labels.astype(bool))
    assert _looks_multilabel(labels.astype(np.float32))
    assert not _looks_multilabel(np.array([[0, 1], [2, 1]]))  # class ids

    emb = jnp.asarray(rng_l.randn(12, 8).astype(np.float32))
    out = _metric_suite(emb, labels, emb, labels,
                        {"same_source": True, "distance_metric": "cosine",
                         "top_k": 6})
    # one metric set (multi-label), not 5 per-level sets
    assert "map_level0" in out and "map_level1" not in out


def test_fast_eval_subset_skips_singletons():
    """Reference build_fast_eval_subset only admits classes with >=2
    members (a singleton is a lone self-retrieval query that every metric
    mean silently drops)."""
    from irw_tpu.engine.batch_map import build_fast_eval_subset

    ds = SyntheticDataset(num_samples=33, num_classes=4, image_size=16,
                          seed=5)
    # force a singleton class by rewriting labels: class 3 has one sample
    ds.labels = np.array([i % 3 for i in range(32)] + [3])
    ds.__dict__.pop("instance_dict", None)  # rebuild cached dict if any
    sub = build_fast_eval_subset(ds, per_class=4)
    assert 3 not in set(np.asarray(sub.labels).tolist())
    # shuffled cap: with max_classes=2 at different seeds the chosen
    # classes differ (sorted()[:2] would always pick {0, 1})
    picks = {tuple(sorted(set(np.asarray(build_fast_eval_subset(
        ds, per_class=2, max_classes=2, seed=s).labels).tolist())))
        for s in range(6)}
    assert len(picks) > 1


def test_xbm_memory_term_skipped_for_non_ref_aware_losses(tiny_setup):
    """An EMBEDDINGS loss that never reads ctx.ref_embeddings (HashLoss)
    must NOT get a memory term — it would exactly duplicate the batch term
    and silently rescale the loss by (1 + weight·xbm.weight).  The
    reference would TypeError on the extra positional args instead
    (base_update.py:89 crit(di, labels, memory_embeddings, ...))."""
    dataset, host_t, device_t, model, losses = tiny_setup  # HashLoss
    cfg = [{"name": "AdamW", "params": None, "kwargs": {"lr": 1e-3}}]
    xbm = XBM(size=len(dataset), embedding_dim=16, unique=True,
              activate_after=0, weight=0.5)
    batch = _make_batch(dataset, host_t, np.arange(8))
    x = device_t(batch["image"])
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
         "band_drop": jax.random.PRNGKey(2)}, x, train=True,
    )
    entries = build_optimizers(cfg, variables["params"])
    loss_tx = optax.adamw(1e-3)
    state = init_train_state(
        model, losses, entries, loss_tx, batch, device_transform=device_t,
        xbm=xbm,
    )
    step = jax.jit(build_train_step(
        model, losses, entries, loss_tx, xbm=xbm, device_transform=device_t,
        xbm_active=True,
    ))
    from irw_tpu.engine.train import _build_hyper

    state, metrics = step(state, batch, _build_hyper(entries, 1, 0, 0, None))
    m = {k: float(v) for k, v in jax.device_get(metrics).items()}
    assert "loss_0_HashLoss" in m
    assert not any("memory" in k for k in m), sorted(m)
    assert abs(m["total_loss"] - (m["loss_0_HashLoss"] + m["ortho_loss"])) < 1e-5


def test_scores_losses_get_raw_dot_products():
    """SCORES losses see torch.mm(di, di.t()) semantics (base_update.py:93)
    — raw dot products, NOT silently L2-normalized cosine."""
    import flax.linen as nn

    from irw_tpu.losses.base import LossBase, LossKind

    class SpyScores(LossBase):
        kind = LossKind.SCORES

        def init_params(self, rng):
            return {}

        def init_state(self):
            return {}

        def __call__(self, ctx, params, state):
            # the loss VALUE is the max score — readable from the metrics
            return jnp.max(ctx.scores), state

    class Scale2(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            # output with norm 2: raw self-dot = 4 on the diagonal
            w = self.param("w", nn.initializers.ones, (1,))
            e = x.reshape(x.shape[0], -1)[:, :8]
            e = e / jnp.linalg.norm(e, axis=1, keepdims=True) * 2.0
            return e * w, {"ortho_loss": jnp.float32(0.0)}

    model = Scale2()
    losses = [(SpyScores(), 1.0)]
    batch = {"image": np.random.RandomState(0).rand(4, 4, 4, 3).astype(np.float32),
             "label": np.array([0, 0, 1, 1]), "index": np.arange(4)}
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(batch["image"]))
    entries = build_optimizers(
        [{"name": "SGD", "params": None, "kwargs": {"lr": 0.0}}],
        variables["params"])
    state = init_train_state(model, losses, entries, optax.sgd(0.0), batch)
    step = build_train_step(model, losses, entries, optax.sgd(0.0))
    from irw_tpu.engine.train import _build_hyper

    _, metrics = step(state, batch, _build_hyper(entries, 1, 0, 0, None))
    # norm-2 embeddings: raw diagonal dot = 4; cosine would cap at 1
    assert float(jax.device_get(metrics["loss_0_SpyScores"])) > 3.5


def test_epoch_schedules_match_torch_step_after_epoch(tiny_setup, tmp_path):
    """Reference timing: on_epoch scheduler.step(), crit.epoch_step() and
    net.epoch_step(e) all fire AFTER epoch e — so epoch 1 trains at the
    base LR, with QuantizationLoss weight 0 and tanh α=1."""
    dataset, host_t, device_t, model, _ = tiny_setup
    from irw_tpu.engine.train import train

    losses = build_losses([
        {"name": "HashLoss", "weight": 1.0,
         "kwargs": {"num_classes": 4, "embedding_size": 16}},
        {"name": "QuantizationLoss", "weight": 1.0,
         "kwargs": {"step_type": "linear", "steps": 4}},
    ])
    cfg_opt = [{"name": "AdamW", "params": None, "kwargs": {"lr": 1e-3},
                "scheduler_on_epoch": {"name": "CosineAnnealingLR",
                                       "kwargs": {"T_max": 4, "eta_min": 0.0}}}]
    sampler = RandomSampler(dataset, batch_size=16, seed=0)
    batch = _make_batch(dataset, host_t, np.arange(16))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
         "band_drop": jax.random.PRNGKey(2)}, device_t(batch["image"]),
        train=True,
    )
    entries = build_optimizers(cfg_opt, variables["params"])
    loss_tx = optax.adamw(1e-3)
    state = init_train_state(model, losses, entries, loss_tx, batch,
                             device_transform=device_t)
    config = {"experience": {"max_iter": 1, "train_eval_freq": -1,
                             "eval_bs": 32, "num_workers": 0, "seed": 0,
                             "distance_metric": "hamming"}}
    state, metrics = train(
        model, state, losses, entries, loss_tx, dataset, sampler,
        {"test": dataset}, host_t, device_t, config, str(tmp_path),
    )
    # train_eval_freq=-1 disables eval entirely (even at max_iter)
    assert metrics == {}
    # epoch 1 ran at the base LR (cos factor f(0) = 1)
    lrs = entries[0].group_lrs(1, 0)
    assert abs(next(iter(lrs.values())) - 1e-3) < 1e-9
    # α = f(epoch-1) = f(0) = 1.0 during epoch 1
    assert float(jax.device_get(state.model_alpha)) == 1.0
    # QuantizationLoss trained epoch 1 at weight 0 (linear warm start)
    import json as _json

    with open(os.path.join(str(tmp_path), "metrics.jsonl")) as f:
        logged = [_json.loads(line) for line in f]
    qkeys = [k for k in logged[0] if "QuantizationLoss" in k]
    assert qkeys and all(rec[qkeys[0]] == 0.0 for rec in logged)


def test_per_split_eval_freqs(tiny_setup, tmp_path):
    """train/val/test eval cadences are independent; -1 disables a split
    (reference train.py:94-101)."""
    dataset, host_t, device_t, model, losses = tiny_setup
    from irw_tpu.engine.train import train

    cfg_opt = [{"name": "AdamW", "params": None, "kwargs": {"lr": 1e-3}}]
    sampler = RandomSampler(dataset, batch_size=16, seed=0)
    batch = _make_batch(dataset, host_t, np.arange(16))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
         "band_drop": jax.random.PRNGKey(2)}, device_t(batch["image"]),
        train=True,
    )
    entries = build_optimizers(cfg_opt, variables["params"])
    loss_tx = optax.adamw(1e-3)
    state = init_train_state(model, losses, entries, loss_tx, batch,
                             device_transform=device_t)
    eval_ds = SyntheticDataset(num_samples=32, num_classes=4, image_size=32,
                               seed=7)
    config = {"experience": {
        "max_iter": 2, "train_eval_freq": -1, "test_eval_freq": 1,
        "eval_bs": 32, "num_workers": 0, "seed": 0,
        "distance_metric": "hamming", "eval_split": "test",
    }}
    state, metrics = train(
        model, state, losses, entries, loss_tx, dataset, sampler,
        {"train": dataset, "test": eval_ds}, host_t, device_t, config,
        str(tmp_path),
    )
    assert "test" in metrics and "train" not in metrics


def test_evaluate_oom_backoff(monkeypatch):
    """evaluate() retries ONCE at half batch / query_chunk 256 when the
    first pass dies with RESOURCE_EXHAUSTED (the marginal-HBM mid-training
    eval failure observed on the VOC protocol), and re-raises anything
    else untouched."""
    import importlib

    ev = importlib.import_module("irw_tpu.engine.evaluate")

    calls = []

    def fake_once(apply_fn, variables, datasets, host_transform=None,
                  device_transform=None, batch_size=256, num_workers=8,
                  top_k=None, distance_metric="cosine", multi_label=None,
                  query_chunk=512):
        calls.append((batch_size, query_chunk))
        if len(calls) == 1:
            raise RuntimeError("RESOURCE_EXHAUSTED: TPU backend error")
        return {"map_level0": 0.5}

    monkeypatch.setattr(ev, "_evaluate_once", fake_once)
    out = ev.evaluate(None, None, None, batch_size=1000)
    assert out == {"map_level0": 0.5}
    assert calls == [(1000, 512), (500, 256)]

    def fake_other(*a, **k):
        raise ValueError("unrelated")

    monkeypatch.setattr(ev, "_evaluate_once", fake_other)
    import pytest

    with pytest.raises(ValueError):
        ev.evaluate(None, None, None)
