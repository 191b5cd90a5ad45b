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


def build_eval_fn(model, variables):
    """Close the weights over the eval forward: bands -> codes."""

    def fn(bands):
        out, _aux = model.apply(variables, bands, train=False)
        return out

    return fn


def export_model(model, variables, input_shape, out_path: str | None = None,
                 symbolic_batch: bool = True, platforms=("cpu", "tpu"),
                 bake_weights: bool = True):
    """Serialize the eval forward; returns the jax.export.Exported object.

    input_shape: (S, H, W, C) per-sample subband-stack shape.  The default
    lowers for both cpu and tpu so one artifact serves either runtime.

    bake_weights=True inlines the parameters as constants — a single
    self-contained file (~param bytes).  bake_weights=False exports
    ``call(variables, bands)`` instead: the artifact is a few MB of
    program, weights travel separately (e.g. the orbax checkpoint) — the
    right shape for large models and for transports that cap payload size.
    """
    import jax
    from jax import export as jexport

    if symbolic_batch:
        (batch,) = jexport.symbolic_shape("b")
        spec = jax.ShapeDtypeStruct((batch, *input_shape), np.float32)
    else:
        spec = jax.ShapeDtypeStruct((1, *input_shape), np.float32)
    if bake_weights:
        fn = build_eval_fn(model, variables)
        exported = jexport.export(jax.jit(fn), platforms=list(platforms))(spec)
    else:
        def fn(v, bands):
            out, _aux = model.apply(v, bands, train=False)
            return out

        var_specs = jax.tree_util.tree_map(
            lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), variables)
        exported = jexport.export(jax.jit(fn), platforms=list(platforms))(
            var_specs, spec)
    if out_path:
        with open(out_path, "wb") as f:
            f.write(exported.serialize())
    return exported


def _from_run(run_dir: str):
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
    model = Getter().get_model(config.model)
    variables = {"params": state["params"]}
    if state.get("batch_stats"):
        variables["batch_stats"] = state["batch_stats"]
    return model, variables, config


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
    args = ap.parse_args()

    import jax

    if args.run:
        model, variables, _ = _from_run(args.run)
        shape = (args.bands, args.height, args.width, 3)
    else:
        from irw_tpu.models import get_model

        model = get_model(args.model, backbone=args.backbone, nbits=args.nbits)
        shape = (args.bands, args.height, args.width, 3)
        x = np.zeros((1, *shape), np.float32)
        rngs = {"params": jax.random.PRNGKey(0),
                "dropout": jax.random.PRNGKey(1),
                "band_drop": jax.random.PRNGKey(2)}
        variables = jax.jit(lambda r, i: model.init(r, i, train=False))(rngs, x)

    exported = export_model(model, variables, shape, out_path=args.out,
                            bake_weights=not args.no_bake_weights)
    size = os.path.getsize(args.out)
    print(f"exported {exported.fun_name} -> {args.out} "
          f"({size / 1e6:.1f} MB, in {exported.in_avals}, "
          f"out {exported.out_avals}, platforms {exported.platforms})")


if __name__ == "__main__":
    main()
