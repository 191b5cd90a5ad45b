"""Export a trained retrieval model to a serialized serving artifact.

Serializes the jitted eval forward — subband stack in, L2/hash codes out,
weights baked in as constants — through ``jax.export`` (StableHLO +
calling-convention metadata).  The artifact is deployable to any process
with a compatible jax runtime (CPU/TPU) without the irw_tpu model zoo, the
config system, or Python model code: ``jax.export.deserialize(blob).call``
is the entire serving surface.  Batch size is exported as a symbolic
dimension so one artifact serves any batch.

The reference has no serving story — its evaluate.py re-instantiates the
torch model from config + checkpoint every time
(/root/reference/evaluate.py, main/engine/ref: SURVEY §3.3).

Usage:
  python tools/export_serving.py --run experiments/<name> --out model.jaxexp
  python tools/export_serving.py --model multidino_attention_hashing_ortho \
      --backbone vit_tiny --nbits 64 --height 112 --width 112 --out m.jaxexp

Serving:
  import jax
  from jax import export
  fn = export.deserialize(open("m.jaxexp", "rb").read()).call
  codes = jax.jit(fn)(bands)   # (B, S, H, W, C) float32 -> (B, nbits)
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def export_model(model, variables, input_shape, out_path: str | None = None,
                 symbolic_batch: bool = True, platforms=("cpu", "tpu"),
                 bake_weights: bool = True, device_transform=None,
                 compress_int8: bool = False):
    """Serialize the eval forward; returns the jax.export.Exported object.

    input_shape: (S, H, W, C) per-sample subband-stack shape.  The default
    lowers for both cpu and tpu so one artifact serves either runtime.

    bake_weights=True inlines the parameters as constants — a single
    self-contained file (~param bytes).  bake_weights=False exports
    ``call(variables, bands)`` instead: the artifact is a few MB of
    program, weights travel separately (e.g. the orbax checkpoint) — the
    right shape for large models and for transports that cap payload size.

    device_transform folds the on-device featurization (e.g. the SWT
    subband transform, irw_tpu.transforms.DeviceTransform) INTO the
    program: the artifact then takes raw (B, H, W, 3) uint8 images —
    input_shape becomes the per-sample image shape — and is the complete
    serving pipeline.  Note: the fused Pallas wavelet kernels need
    concrete dims, so pass symbolic_batch=False (a fixed serve batch)
    when the transform uses them.
    """
    import jax
    from jax import export as jexport

    from irw_tpu.transforms.pipeline import DeviceTransform

    if device_transform is not None:
        tf_ops = device_transform.ops

        def featurize(x):
            return DeviceTransform._apply(tf_ops, x)

        in_dtype = np.uint8
    else:
        featurize = None
        in_dtype = np.float32

    if symbolic_batch is True:
        (batch,) = jexport.symbolic_shape("b")
        spec = jax.ShapeDtypeStruct((batch, *input_shape), in_dtype)
    else:
        # symbolic_batch=False -> batch 1; an int fixes that batch size
        fixed = 1 if symbolic_batch is False else int(symbolic_batch)
        spec = jax.ShapeDtypeStruct((fixed, *input_shape), in_dtype)

    def forward(v, x):
        if featurize is not None:
            x = featurize(x)
        out, _aux = model.apply(v, x, train=False)
        return out

    if bake_weights:
        if compress_int8:
            # bake the quant-path kernels as int8 constants (~4× smaller
            # artifact); dequant happens inside the program and a
            # quant_int8 model reproduces the float tree's outputs to
            # ≤1 ulp (ops/quant.py compress/decompress contract)
            from irw_tpu.ops.quant import (
                compress_params_int8,
                decompress_params_int8,
            )

            ctree = compress_params_int8(variables)
            exported = jexport.export(
                jax.jit(lambda x: forward(decompress_params_int8(ctree), x)),
                platforms=list(platforms))(spec)
        else:
            exported = jexport.export(
                jax.jit(lambda x: forward(variables, x)),
                platforms=list(platforms))(spec)
    else:
        var_specs = jax.tree_util.tree_map(
            lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), variables)
        exported = jexport.export(jax.jit(forward), platforms=list(platforms))(
            var_specs, spec)
    if out_path:
        with open(out_path, "wb") as f:
            f.write(exported.serialize())
    return exported


def _from_run(run_dir: str, quant: str | None = None):
    """Rebuild model + eval variables from a run's rolling checkpoint (the
    config travels inside it — engine/checkpoint.py)."""
    from irw_tpu.config import Config
    from irw_tpu.engine.checkpoint import load_checkpoint
    from irw_tpu.getter import Getter

    restored = load_checkpoint(run_dir)
    if restored is None:
        raise SystemExit(f"no rolling checkpoint under {run_dir}")
    state, meta = restored
    config = Config(meta["config"])
    model_cfg = dict(config.model)
    if quant == "int8":
        # the param tree is unchanged under quant_int8 (ops/quant.py), so
        # the run's checkpoint applies verbatim to the quantized program
        kw = dict(model_cfg.get("kwargs") or {})
        vit_kw = dict(kw.get("vit_kwargs") or {})
        vit_kw["quant_int8"] = True
        kw["vit_kwargs"] = vit_kw
        model_cfg["kwargs"] = kw
    getter = Getter()
    model = getter.get_model(model_cfg)
    _, (_, device_eval) = getter.get_transform(config.get("transform", {}))
    variables = {"params": state["params"]}
    if state.get("batch_stats"):
        variables["batch_stats"] = state["batch_stats"]
    return model, variables, config, device_eval


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", help="run dir with weights/rolling (config inside)")
    ap.add_argument("--model", default="multidino_attention_hashing_ortho")
    ap.add_argument("--backbone", default="dinov2_vits14")
    ap.add_argument("--nbits", type=int, default=64)
    ap.add_argument("--bands", type=int, default=4)
    ap.add_argument("--height", type=int, default=112)
    ap.add_argument("--width", type=int, default=112)
    ap.add_argument("--out", required=True)
    ap.add_argument("--no-bake-weights", action="store_true",
                    help="export call(variables, bands); weights travel "
                         "separately (small artifact for big models)")
    ap.add_argument("--with-transform", action="store_true",
                    help="fold the run's eval DeviceTransform (SWT/DWT/"
                         "normalize) into the program: the artifact takes "
                         "raw (B, H, W, 3) uint8 images (requires --run; "
                         "fixed batch = --serve-batch, the Pallas wavelet "
                         "kernels need concrete dims)")
    ap.add_argument("--serve-batch", type=int, default=64,
                    help="fixed batch size for --with-transform artifacts")
    ap.add_argument("--quant", choices=["int8"], default=None,
                    help="int8 dynamic-quant matmuls for the ViT qkv/out/mlp "
                         "(MXU int8 path, 2x bf16 peak on v5e; same param "
                         "tree, so the checkpoint applies unchanged)")
    args = ap.parse_args()

    import jax

    device_transform = None
    if args.with_transform and not args.run:
        raise SystemExit("--with-transform needs --run (the transform comes "
                         "from the run's config)")
    if args.run:
        model, variables, _, device_eval = _from_run(args.run, quant=args.quant)
        if args.with_transform:
            device_transform = device_eval
            shape = (args.height, args.width, 3)
        else:
            shape = (args.bands, args.height, args.width, 3)
    else:
        from irw_tpu.models import get_model

        model_kw = {}
        if args.quant == "int8":
            model_kw["vit_kwargs"] = {"quant_int8": True}
        model = get_model(args.model, backbone=args.backbone, nbits=args.nbits,
                          **model_kw)
        shape = (args.bands, args.height, args.width, 3)
        x = np.zeros((1, *shape), np.float32)
        rngs = {"params": jax.random.PRNGKey(0),
                "dropout": jax.random.PRNGKey(1),
                "band_drop": jax.random.PRNGKey(2)}
        variables = jax.jit(lambda r, i: model.init(r, i, train=False))(rngs, x)

    exported = export_model(
        model, variables, shape, out_path=args.out,
        bake_weights=not args.no_bake_weights,
        device_transform=device_transform,
        symbolic_batch=True if device_transform is None else args.serve_batch,
        # quantized baked artifacts also bake the quant-path kernels as
        # int8 constants — ~4× smaller, bit-identical outputs
        compress_int8=args.quant == "int8" and not args.no_bake_weights)
    size = os.path.getsize(args.out)
    print(f"exported {exported.fun_name} -> {args.out} "
          f"({size / 1e6:.1f} MB, in {exported.in_avals}, "
          f"out {exported.out_avals}, platforms {exported.platforms})")


if __name__ == "__main__":
    main()
