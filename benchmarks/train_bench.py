#!/usr/bin/env python
"""Training-step throughput on the flagship VOC regime (not part of the
driver's bench.py contract — run manually; results recorded in BASELINE.md).

Two regimes:

- ``--frozen``: frozen ViT-S backbones + trainable fusion/hash head (the
  round-1 measurement);
- default (unfrozen): all four DINOv2 branches train — the reference's
  actual flagship study config
  (config/model/multidino_attention_hashing_ortho.yaml sets frozen: False
  for every branch; studies/voc_lambda_2_….yaml trains it that way).

HashLoss with trainable proxies, batch 96 @224² by default.  Prints
ms/step, img/s, and analytic MFU.
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build(batch_size: int, frozen: bool, sub_batch=None, flash=False,
          remat_policy=None, fused_qkv=False, split_cls=False,
          vmem_attn=False, scan_group=1, ln_fused=False):
    import jax
    import optax

    from irw_tpu.engine.optimizers import build_optimizers
    from irw_tpu.engine.train_step import build_train_step
    from irw_tpu.getter import init_train_state
    from irw_tpu.losses import build_losses
    from irw_tpu.models import get_model
    from irw_tpu.transforms import build_transforms

    _, device_transform = build_transforms(
        {"SWTTransform": {"level": 1, "wavelet": "haar"}}
    )
    vit_kwargs = {"dtype": "bfloat16"}
    if not frozen:
        # unfrozen backward through 4×ViT-S needs block remat to fit HBM
        vit_kwargs["remat_blocks"] = True
        if remat_policy:
            vit_kwargs["remat_policy"] = remat_policy
    if flash:
        vit_kwargs["use_flash"] = True
    if fused_qkv:
        vit_kwargs["fused_qkv"] = True
    if split_cls:
        vit_kwargs["split_cls"] = True
    if vmem_attn:
        vit_kwargs["vmem_attn"] = True
    if scan_group and scan_group > 1:
        vit_kwargs["scan_group"] = scan_group
    if ln_fused:
        vit_kwargs["ln_fused"] = True
    model = get_model(
        "multidino_attention_hashing_ortho",
        backbone="dinov2_vits14",
        nbits=64,
        frozen_backbone=frozen,
        vit_kwargs=vit_kwargs,
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
    frozen_cols = tuple(model.frozen_param_collections)
    entries = build_optimizers(
        [{"name": "AdamW", "params": None, "kwargs": {"lr": 1e-4}}],
        variables["params"],
        frozen_collections=frozen_cols,
    )
    state = init_train_state(
        model, losses, entries, loss_tx, batch,
        device_transform=device_transform, seed=0,
    )
    step = jax.jit(
        build_train_step(
            model, losses, entries, loss_tx, clip_grad=5.0,
            device_transform=device_transform,
            sub_batch=sub_batch,
            frozen_collections=frozen_cols,
        ),
        donate_argnums=(0,),
    )
    return step, state, batch, entries


def measure(step, state, batch, entries, batch_size: int, iters: int = 10):
    import jax

    from irw_tpu.engine.train import _build_hyper

    hyper = _build_hyper(entries, 1, 0, 0, None)
    dev_batch = {k: jax.device_put(np.asarray(v)) for k, v in batch.items()}

    t_compile = time.perf_counter()
    state, metrics = step(state, dev_batch, hyper)
    loss0 = float(metrics["total_loss"])  # hard sync
    compile_s = time.perf_counter() - t_compile

    state, metrics = step(state, dev_batch, hyper)  # warm
    _ = float(metrics["total_loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step(state, dev_batch, hyper)
    _ = float(metrics["total_loss"])  # host fetch = reliable sync on axon
    dt = (time.perf_counter() - t0) / iters
    return dt, loss0, compile_s


def main():
    from irw_tpu.utils.chip_lock import acquire_chip_lock

    acquire_chip_lock()  # serialize TPU attach on the shared dev chip
    parser = argparse.ArgumentParser()
    parser.add_argument("--frozen", action="store_true",
                        help="freeze the 4 ViT branches (round-1 regime)")
    parser.add_argument("--batch", type=int, default=96)
    parser.add_argument("--sub-batch", type=int, default=None,
                        help="remat+scan micro-batching size")
    parser.add_argument("--remat-policy", default=None,
                        choices=["nothing", "dots", "dots_no_batch",
                                 "dots_no_batch_gelu", "dots_no_batch_attn",
                                 "dots_no_batch_gelu_attn", "everything"],
                        help="selective checkpointing policy for scanned blocks")
    parser.add_argument("--fused-qkv", action="store_true",
                        help="single fused QKV matmul in attention")
    parser.add_argument("--split-cls", action="store_true",
                        help="lane-aligned CLS-split attention (seq 257->256+1)")
    parser.add_argument("--flash", action="store_true",
                        help="Pallas flash attention + fused QKV projection")
    parser.add_argument("--vmem-attn", action="store_true",
                        help="VMEM-resident fused attention kernel "
                             "(ops/vmem_attention.py)")
    parser.add_argument("--scan-group", type=int, default=1,
                        help="blocks per remat group (grouped/sqrt remat "
                             "scan; 1 = per-block, the old layout)")
    parser.add_argument("--ln-fused", action="store_true",
                        help="stat-free custom-VJP LayerNorm (ops/fused_ln.py)")
    parser.add_argument("--iters", type=int, default=10)
    args = parser.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from irw_tpu.utils.flops import device_peak_flops, flagship_forward_flops

    step, state, batch, entries = build(args.batch, args.frozen,
                                        sub_batch=args.sub_batch,
                                        flash=args.flash,
                                        remat_policy=args.remat_policy,
                                        fused_qkv=args.fused_qkv,
                                        split_cls=args.split_cls,
                                        vmem_attn=args.vmem_attn,
                                        scan_group=args.scan_group,
                                        ln_fused=args.ln_fused)
    dt, loss0, compile_s = measure(step, state, batch, entries, args.batch,
                                   args.iters)
    ips = args.batch / dt

    fwd = flagship_forward_flops()
    # unfrozen train ≈ 3× forward (fwd + 2× in backward); frozen ≈ 1× (the
    # backbone runs forward-only under stop_gradient, heads are <1%)
    flops_per_img = fwd * (1.0 if args.frozen else 3.0)
    peak, label = device_peak_flops()
    mfu = flops_per_img * ips / peak

    regime = "frozen" if args.frozen else "unfrozen"
    print(f"train step [{regime}, batch {args.batch}"
          + (f", sub_batch {args.sub_batch}" if args.sub_batch else "")
          + (", flash" if args.flash else "")
          + (f", policy={args.remat_policy}" if args.remat_policy else "")
          + (", fused_qkv" if args.fused_qkv else "")
          + (", split_cls" if args.split_cls else "")
          + (", vmem_attn" if args.vmem_attn else "")
          + (f", scan_group={args.scan_group}" if args.scan_group > 1 else "")
          + (", ln_fused" if args.ln_fused else "")
          + f"]: {dt*1000:.1f} ms/step -> {ips:.0f} img/s"
          f" | MFU {mfu*100:.1f}% of {label}"
          f" ({flops_per_img/1e9:.1f} GFLOP/img analytic)"
          f" | first loss {loss0:.4f}, compile {compile_s:.0f}s")


if __name__ == "__main__":
    main()
