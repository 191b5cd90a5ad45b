"""Instrumentation + introspection tests (reference had only runnable
scripts for this, train_new.py/model_hooks)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from irw_tpu.hooks import FixedBatchInstrumentor, capture_features, capture_gradients
from irw_tpu.models import get_model

RNGS = {
    "params": jax.random.PRNGKey(0),
    "dropout": jax.random.PRNGKey(1),
    "band_drop": jax.random.PRNGKey(2),
}


def _flagship():
    return get_model(
        "multidino_attention_hashing_ortho",
        backbone="vit_tiny",
        nbits=8,
        frozen_backbone=False,
        fusion_config={"type": "cross_attention_advanced", "output_dim": 64,
                       "num_queries": 2, "num_heads": 2},
    )


def test_capture_features(rng):
    model = _flagship()
    x = jnp.asarray(rng.rand(2, 4, 32, 32, 3), dtype=jnp.float32)
    variables = model.init(RNGS, x, train=True)
    out, aux, feats = capture_features(
        model, variables, x, train=False, filter_fn=lambda p, v: "Block_" in "/".join(p)
    )
    assert len(feats) > 0
    for name, value in feats.items():
        assert "Block_" in name


@pytest.mark.slow
def test_capture_gradients(rng):
    model = _flagship()
    x = jnp.asarray(rng.rand(2, 4, 32, 32, 3), dtype=jnp.float32)
    variables = model.init(RNGS, x, train=True)
    grads = capture_gradients(model, variables, x, lambda out: jnp.sum(out**2))
    total = sum(float(jnp.abs(g).sum()) for g in grads.values())
    assert np.isfinite(total) and total > 0


def test_fixed_batch_instrumentor(rng, tmp_path):
    model = _flagship()
    x = rng.rand(2, 4, 32, 32, 3).astype(np.float32)
    variables = model.init(RNGS, jnp.asarray(x), train=True)
    inst = FixedBatchInstrumentor(model, str(tmp_path), target_epochs=(1, 3))
    inst.snapshot_batch({"image": (x * 255).astype(np.uint8), "label": np.arange(2)})
    assert os.path.exists(os.path.join(str(tmp_path), "fixed_batch.npz"))

    path = inst.maybe_dump(1, variables, loss_fn=lambda out: jnp.sum(out**2))
    assert path is not None and os.path.exists(path)
    data = np.load(path)
    assert any(k.startswith("feat/") for k in data.files)
    assert any(k.startswith("grad/") for k in data.files)
    # non-target epoch → no dump
    assert inst.maybe_dump(2, variables) is None


@pytest.mark.slow
def test_densenet_and_hybrid(rng):
    model = get_model("densenet121")
    x = jnp.asarray(rng.rand(1, 32, 32, 3), dtype=jnp.float32)
    variables = model.init(RNGS, x, train=True)
    out, _ = model.apply(variables, x, train=False, mutable=["batch_stats"])
    assert out.shape == (1, 1024)
