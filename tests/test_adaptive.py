"""'adaptative' grad-norm loss re-weighting (base_update.py:115-128)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import optax

from irw_tpu.data import SyntheticDataset
from irw_tpu.engine.optimizers import build_optimizers
from irw_tpu.engine.train_step import build_train_step
from irw_tpu.engine.train import _build_hyper
from irw_tpu.getter import Getter, init_train_state
from irw_tpu.losses import build_losses, uses_adaptive_weights
from irw_tpu.models import get_model


def test_uses_adaptive_detection():
    assert uses_adaptive_weights([{"name": "SupAP", "weight": "adaptative"}])
    assert not uses_adaptive_weights([{"name": "SupAP", "weight": 1.0}])
    losses = build_losses([{"name": "SupAP", "weight": "adaptative"}])
    assert losses[0][1] == 1.0


@pytest.mark.slow
def test_adaptive_step_runs(rng):
    dataset = SyntheticDataset(num_samples=32, num_classes=4, image_size=32, seed=0)
    (host_t, device_t), _ = Getter().get_transform(
        {"train": {"Resize": {"size": 32}, "CustomTransform": {"decompose_levels": 1}},
         "test": {}}
    )
    model = get_model(
        "multidino_attention_hashing_ortho",
        backbone="vit_tiny",
        nbits=16,
        frozen_backbone=False,
        fusion_config={"type": "standard", "output_dim": 64, "num_heads": 2},
    )
    losses = build_losses([
        {"name": "CalibrationLoss", "weight": "adaptative", "kwargs": {}},
        {"name": "SupAP", "weight": "adaptative", "kwargs": {}},
    ])
    np_rng = np.random.RandomState(0)
    idx = np.arange(8)
    batch = {
        "image": np.stack([host_t(dataset.load_image(int(i)), np_rng, True) for i in idx]),
        "label": dataset.labels[idx],
        "index": idx,
    }
    x = device_t(batch["image"])
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
         "band_drop": jax.random.PRNGKey(2)}, x, train=True,
    )
    entries = build_optimizers(
        [{"name": "AdamW", "params": None, "kwargs": {"lr": 1e-3}}], variables["params"]
    )
    loss_tx = optax.adamw(1e-3)
    state = init_train_state(model, losses, entries, loss_tx, batch, device_transform=device_t)
    step = jax.jit(build_train_step(
        model, losses, entries, loss_tx, device_transform=device_t,
        adaptive_weights=True, adaptive_head_key="HashHead",
    ))
    hyper = _build_hyper(entries, 1, 0, 0, None)
    state, metrics = step(state, batch, hyper)
    assert np.isfinite(float(metrics["total_loss"]))
    # adaptive weights logged and positive
    w0 = float(metrics["adaptive_weight_0"])
    w1 = float(metrics["adaptive_weight_1"])
    assert w0 > 0 and w1 > 0
    # mean-normalised: geometric middle around 1
    assert 0.01 < w0 < 100 and 0.01 < w1 < 100
