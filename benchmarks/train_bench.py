#!/usr/bin/env python
"""Training-step throughput on the flagship VOC regime (not part of the
driver's bench.py contract — run manually; results recorded in BASELINE.md).

Regime: frozen ViT-S backbones + trainable fusion/hash head, HashLoss with
trainable proxies, batch 96 @224² (the VOC ablation protocol,
studies/voc_lambda_2_ablation_….yaml).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import optax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from irw_tpu.engine.optimizers import build_optimizers
    from irw_tpu.engine.train_step import build_train_step
    from irw_tpu.engine.train import _build_hyper
    from irw_tpu.getter import init_train_state
    from irw_tpu.losses import build_losses
    from irw_tpu.models import get_model

    from irw_tpu.transforms import build_transforms

    batch_size = 96
    _, device_transform = build_transforms(
        {"SWTTransform": {"level": 1, "wavelet": "haar"}}
    )
    model = get_model(
        "multidino_attention_hashing_ortho",
        backbone="dinov2_vits14",
        nbits=64,
        frozen_backbone=True,
        vit_kwargs={"dtype": "bfloat16"},
        fusion_config={"type": "cross_attention_advanced", "output_dim": 384,
                       "num_queries": 4, "num_heads": 8, "ortho_weight": 0.01},
    )
    losses = build_losses([
        {"name": "HashLoss", "weight": 1.0,
         "kwargs": {"num_classes": 20, "embedding_size": 64}},
    ])
    loss_tx = optax.adamw(1e-4)

    rng = np.random.RandomState(0)
    images = rng.randint(0, 255, (batch_size, 224, 224, 3), dtype=np.uint8)
    labels = (rng.rand(batch_size, 20) > 0.8).astype(np.float32)
    batch = {"image": images, "label": labels, "index": np.arange(batch_size)}

    sample_bands = device_transform(images[:1])
    variables = jax.jit(lambda r, x: model.init(r, x, train=True))(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
         "band_drop": jax.random.PRNGKey(2)},
        sample_bands,
    )
    entries = build_optimizers(
        [{"name": "AdamW", "params": None, "kwargs": {"lr": 1e-4}}],
        variables["params"],
        frozen_collections=tuple(model.frozen_param_collections),
    )
    state = init_train_state(
        model, losses, entries, loss_tx, batch, device_transform=device_transform, seed=0
    )
    step = jax.jit(
        build_train_step(
            model, losses, entries, loss_tx, clip_grad=5.0,
            device_transform=device_transform,
            frozen_collections=tuple(model.frozen_param_collections),
        ),
        donate_argnums=(0,),
    )
    hyper = _build_hyper(entries, 1, 0, 0, None)

    state, metrics = step(state, batch, hyper)  # compile
    print("compiled; loss:", float(metrics["total_loss"]))
    iters = 10

    # (a) deployable number: device-resident batch (PCIe-attached hosts
    # stream batches asynchronously; the axon dev tunnel is far slower)
    dev_batch = {k: jax.device_put(np.asarray(v)) for k, v in batch.items()}
    state, metrics = step(state, dev_batch, hyper)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step(state, dev_batch, hyper)
    _ = float(metrics["total_loss"])
    dt = (time.perf_counter() - t0) / iters
    print(f"train step (device-resident batch): {dt*1000:.1f} ms/step -> "
          f"{batch_size/dt:.0f} img/s (batch {batch_size}, frozen backbones)")

    # (b) including host->device transfer of the uint8 batch (dev tunnel)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step(state, batch, hyper)
    _ = float(metrics["total_loss"])
    dt = (time.perf_counter() - t0) / iters
    print(f"train step (incl. uint8 host transfer): {dt*1000:.1f} ms/step -> "
          f"{batch_size/dt:.0f} img/s")


if __name__ == "__main__":
    main()
