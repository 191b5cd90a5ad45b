"""GradCache-equivalent micro-batching (``experience.sub_batch``).

The reference implements gradient caching in two passes with RNG replay
(main/engine/base_update.py:151-293); here the same math is expressed as
``jax.checkpoint`` + ``lax.scan`` over micro-batches.  These tests pin the
semantics the reference guarantees:

- micro-batched parameter gradients == full-batch gradients (the whole point
  of GradCache), including for a pairwise score loss that needs the full
  batch's pair matrix;
- ragged tails are handled (base_update.py:34-49: tail chunk kept, a size-1
  tail merged into the previous chunk);
- the fusion ortho loss is NOT dropped (base_update.py:272-283) — exact for
  the parameter-only ``cross_attention_advanced`` Gram loss;
- ``sub_batch >= batch`` degrades to the plain single-pass step (the shipped
  configs/experience/landmarks.yaml sets sub_batch 128 with eval_bs 96).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from irw_tpu.engine.optimizers import build_optimizers
from irw_tpu.engine.train import _build_hyper
from irw_tpu.engine.train_step import build_train_step
from irw_tpu.getter import init_train_state
from irw_tpu.losses import build_losses
from irw_tpu.models import get_model

# grad-equality over remat+scan micro-batching — slow tier
pytestmark = pytest.mark.slow


def _deterministic_flagship():
    """Flagship-shaped model with every stochastic/batch-stat piece disabled
    so micro-batched == full-batch is exact (BN and dropout are the
    reference's own documented caveats, base_update.py:176-184)."""
    return get_model(
        "multidino_attention_hashing_ortho",
        backbone="vit_tiny",
        nbits=16,
        use_bn=False,
        frozen_backbone=False,
        fusion_config={
            "type": "cross_attention_advanced",
            "output_dim": 64,
            "num_queries": 4,
            "num_heads": 2,
            "dropout": 0.0,
            "sub_band_dropout_p": 0.0,
            "ortho_weight": 0.1,
        },
    )


def _setup(batch_size, sub_batch, seed=0):
    model = _deterministic_flagship()
    losses = build_losses([{"name": "SupAP", "weight": 1.0, "kwargs": {}}])
    loss_tx = optax.adamw(1e-3)
    rng = np.random.RandomState(seed)
    batch = {
        "image": rng.rand(batch_size, 4, 32, 32, 3).astype(np.float32),
        "label": (np.arange(batch_size) % 4).astype(np.int32),
        "index": np.arange(batch_size),
    }
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
         "band_drop": jax.random.PRNGKey(2)},
        jnp.asarray(batch["image"]), train=True,
    )
    entries = build_optimizers(
        [{"name": "SGD", "params": None, "kwargs": {"lr": 0.1, "momentum": 0.0}}],
        variables["params"],
    )
    state = init_train_state(model, losses, entries, loss_tx, batch, seed=0)
    step = jax.jit(build_train_step(model, losses, entries, loss_tx,
                                    sub_batch=sub_batch))
    hyper = _build_hyper(entries, epoch=1, step=0, warm_up=0, warm_up_key=None)
    return state, step, batch, hyper


def _run(batch_size, sub_batch):
    state, step, batch, hyper = _setup(batch_size, sub_batch)
    new_state, metrics = step(state, batch, hyper)
    return new_state, {k: float(v) for k, v in metrics.items()}


@pytest.mark.parametrize("batch_size", [8, 10, 9])
def test_microbatched_step_matches_full_batch(batch_size):
    """sub_batch=4 over b=8 (divisible), b=10 (tail chunk 2), b=9 (size-1
    tail merged into a 5-sample chunk) must all reproduce the full-batch
    gradient step exactly."""
    full_state, full_metrics = _run(batch_size, sub_batch=None)
    micro_state, micro_metrics = _run(batch_size, sub_batch=4)

    assert np.isfinite(micro_metrics["total_loss"])
    assert abs(full_metrics["total_loss"] - micro_metrics["total_loss"]) < 1e-5
    assert abs(full_metrics["ortho_loss"] - micro_metrics["ortho_loss"]) < 1e-6

    flat_full = jax.tree_util.tree_leaves_with_path(full_state.params)
    flat_micro = {"/".join(map(str, p)): l
                  for p, l in jax.tree_util.tree_leaves_with_path(micro_state.params)}
    for path, leaf in flat_full:
        name = "/".join(map(str, path))
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat_micro[name]),
            atol=2e-5, rtol=1e-4, err_msg=name,
        )


def test_ortho_loss_not_dropped_and_trains():
    """The advanced Gram ortho loss is parameter-only: it must appear in the
    metrics AND move the fusion query tokens even though the main loss's
    gradient flows through the embeddings."""
    state, step, batch, hyper = _setup(8, sub_batch=4)
    new_state, metrics = step(state, batch, hyper)
    assert float(metrics["ortho_loss"]) > 0.0

    def find_query_tokens(tree):
        for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
            if any("query_tokens" in str(p) for p in path):
                return np.asarray(leaf)
        raise AssertionError("no query_tokens param found")

    before = find_query_tokens(state.params)
    after = find_query_tokens(new_state.params)
    assert np.abs(after - before).max() > 0.0


def test_sub_batch_geq_batch_is_plain_step():
    """landmarks.yaml ships sub_batch=128 with batches smaller than that —
    must fall back to the single-pass step, not a zero-length scan."""
    full_state, full_metrics = _run(8, sub_batch=None)
    micro_state, micro_metrics = _run(8, sub_batch=128)
    assert abs(full_metrics["total_loss"] - micro_metrics["total_loss"]) < 1e-7
    for a, b in zip(jax.tree_util.tree_leaves(full_state.params),
                    jax.tree_util.tree_leaves(micro_state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_batch_dependent_ortho_weighted_average():
    """Non-advanced bottleneck head: ortho depends on the batch-mean
    attention, so micro-batching yields the size-weighted average across
    chunks (the reference's documented semantics, base_update.py:272-279) —
    finite, positive, and within the span of the per-chunk values."""
    model = get_model(
        "multidino_attention_hashing_ortho",
        backbone="vit_tiny", nbits=16, use_bn=False, frozen_backbone=False,
        fusion_config={
            "type": "cross_attention_bottleneck", "output_dim": 64,
            "num_queries": 4, "num_heads": 2, "dropout": 0.0,
            "sub_band_dropout_p": 0.0, "ortho_weight": 0.1,
        },
    )
    losses = build_losses([{"name": "SupAP", "weight": 1.0, "kwargs": {}}])
    loss_tx = optax.adamw(1e-3)
    rng = np.random.RandomState(0)
    batch = {
        "image": rng.rand(10, 4, 32, 32, 3).astype(np.float32),
        "label": (np.arange(10) % 4).astype(np.int32),
        "index": np.arange(10),
    }
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
         "band_drop": jax.random.PRNGKey(2)},
        jnp.asarray(batch["image"]), train=True,
    )
    entries = build_optimizers(
        [{"name": "SGD", "params": None, "kwargs": {"lr": 0.1}}], variables["params"]
    )
    state = init_train_state(model, losses, entries, loss_tx, batch, seed=0)
    step = jax.jit(build_train_step(model, losses, entries, loss_tx, sub_batch=4))
    _, metrics = step(state, batch, hyper := _build_hyper(
        entries, epoch=1, step=0, warm_up=0, warm_up_key=None))
    assert np.isfinite(float(metrics["ortho_loss"]))
    assert float(metrics["ortho_loss"]) > 0.0
