#!/usr/bin/env python
"""Convert torch checkpoints → flax params (one-time, torch-CPU only).

Covers the pretrained-weight paths of the reference (net.py:20-414 pulls
torchvision ResNets and torch.hub DINOv2; multi_dino_attention.py:473-476
loads per-band expert checkpoints).  This image has torch-cpu but no
torchvision/hub weights, so the converter operates on a *state-dict file*
you provide:

    python tools/convert_torch_weights.py --kind resnet50 --src r50.pth --dst r50.msgpack
    python tools/convert_torch_weights.py --kind dinov2_vits14 --src d2.pth --dst d2.msgpack

The output is a flax-serialized param tree matching irw_tpu.models.resnet /
irw_tpu.models.vit module structures.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

# the HF paths import irw_tpu (shared config/variant table) — make direct
# `python tools/convert_torch_weights.py` invocations find the repo root
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _t(x):
    return np.asarray(x.detach().cpu().numpy() if hasattr(x, "detach") else x)


def _conv(sd, key):
    return {"kernel": _t(sd[key + ".weight"]).transpose(2, 3, 1, 0)}


def _bn(sd, key):
    return (
        {"scale": _t(sd[key + ".weight"]), "bias": _t(sd[key + ".bias"])},
        {"mean": _t(sd[key + ".running_mean"]), "var": _t(sd[key + ".running_var"])},
    )


def convert_resnet(sd: dict, stage_sizes=(3, 4, 6, 3), bottleneck=True) -> dict:
    """torchvision resnet state dict → irw_tpu.models.resnet.ResNet params.

    Layout mapping: conv weights OIHW → HWIO; per-stage blocks become
    Bottleneck_{i}/BasicBlock_{i} children in definition order; BN affine →
    BatchNorm_{j} scale/bias, running stats → batch_stats collection.
    """
    params: dict = {}
    stats: dict = {}

    def conv(key):
        return _conv(sd, key)

    def bn(key):
        return _bn(sd, key)

    conv_i = bn_i = block_i = 0

    def put_conv(w):
        nonlocal conv_i
        params[f"Conv_{conv_i}"] = w
        conv_i += 1

    def put_bn(pair):
        nonlocal bn_i
        params[f"BatchNorm_{bn_i}"], stats[f"BatchNorm_{bn_i}"] = pair
        bn_i += 1

    put_conv(conv("conv1"))
    put_bn(bn("bn1"))

    block_name = "Bottleneck" if bottleneck else "BasicBlock"
    n_convs = 3 if bottleneck else 2
    for stage, n_blocks in enumerate(stage_sizes, start=1):
        for b in range(n_blocks):
            prefix = f"layer{stage}.{b}"
            bp: dict = {}
            bs: dict = {}
            ci = bi = 0
            for c in range(1, n_convs + 1):
                bp[f"Conv_{ci}"] = conv(f"{prefix}.conv{c}")
                ci += 1
                aff, run = bn(f"{prefix}.bn{c}")
                bp[f"BatchNorm_{bi}"], bs[f"BatchNorm_{bi}"] = aff, run
                bi += 1
            if f"{prefix}.downsample.0.weight" in sd:
                bp[f"Conv_{ci}"] = conv(f"{prefix}.downsample.0")
                aff, run = bn(f"{prefix}.downsample.1")
                bp[f"BatchNorm_{bi}"], bs[f"BatchNorm_{bi}"] = aff, run
            params[f"{block_name}_{block_i}"] = bp
            stats[f"{block_name}_{block_i}"] = bs
            block_i += 1
    return {"params": params, "batch_stats": stats}


def convert_densenet(sd: dict, block_sizes=(6, 12, 24, 16)) -> dict:
    """torchvision densenet state dict → irw_tpu.models.densenet.DenseNet
    params (features.conv0/norm0, denseblockB.denselayerL.{norm1,conv1,
    norm2,conv2}, transitionB.{norm,conv}, norm5 → sequential DenseLayer_i /
    Transition_i children, NHWC kernels)."""
    params: dict = {}
    stats: dict = {}
    params["Conv_0"] = _conv(sd, "features.conv0")
    params["BatchNorm_0"], stats["BatchNorm_0"] = _bn(sd, "features.norm0")
    dl = tr = 0
    for bi, n_layers in enumerate(block_sizes, start=1):
        for li in range(1, n_layers + 1):
            pre = f"features.denseblock{bi}.denselayer{li}"
            bp, bs = {}, {}
            bp["BatchNorm_0"], bs["BatchNorm_0"] = _bn(sd, f"{pre}.norm1")
            bp["Conv_0"] = _conv(sd, f"{pre}.conv1")
            bp["BatchNorm_1"], bs["BatchNorm_1"] = _bn(sd, f"{pre}.norm2")
            bp["Conv_1"] = _conv(sd, f"{pre}.conv2")
            params[f"DenseLayer_{dl}"], stats[f"DenseLayer_{dl}"] = bp, bs
            dl += 1
        if bi < len(block_sizes):
            pre = f"features.transition{bi}"
            tp, ts = {}, {}
            tp["BatchNorm_0"], ts["BatchNorm_0"] = _bn(sd, f"{pre}.norm")
            tp["Conv_0"] = _conv(sd, f"{pre}.conv")
            params[f"Transition_{tr}"], stats[f"Transition_{tr}"] = tp, ts
            tr += 1
    params["BatchNorm_1"], stats["BatchNorm_1"] = _bn(sd, "features.norm5")
    return {"params": params, "batch_stats": stats}


def convert_dinov2(sd: dict) -> dict:
    """DINOv2 ViT state dict → irw_tpu.models.vit.VisionTransformer params."""
    p: dict = {}
    p["cls_token"] = _t(sd["cls_token"])
    p["pos_embed"] = _t(sd["pos_embed"])
    p["PatchEmbed_0"] = {
        "Conv_0": {
            "kernel": _t(sd["patch_embed.proj.weight"]).transpose(2, 3, 1, 0),
            "bias": _t(sd["patch_embed.proj.bias"]),
        }
    }
    depth = max(int(k.split(".")[1]) for k in sd if k.startswith("blocks.")) + 1
    for i in range(depth):
        b = f"blocks.{i}"
        dim = _t(sd[f"{b}.norm1.weight"]).shape[0]
        qkv_w = _t(sd[f"{b}.attn.qkv.weight"])  # (3D, D)
        qkv_b = _t(sd[f"{b}.attn.qkv.bias"])
        heads_guess = dim // 64
        q_w, k_w, v_w = np.split(qkv_w, 3, axis=0)
        q_b, k_b, v_b = np.split(qkv_b, 3, axis=0)

        def head_split(w, b_):
            # (D, D) torch (out,in) → flax (in, heads, head_dim)
            return (
                w.T.reshape(dim, heads_guess, dim // heads_guess),
                b_.reshape(heads_guess, dim // heads_guess),
            )

        attn = {}
        for name, (w, bb) in zip(
            ("query", "key", "value"),
            (head_split(q_w, q_b), head_split(k_w, k_b), head_split(v_w, v_b)),
        ):
            attn[name] = {"kernel": w, "bias": bb}
        out_w = _t(sd[f"{b}.attn.proj.weight"])
        attn["out"] = {
            "kernel": out_w.T.reshape(heads_guess, dim // heads_guess, dim),
            "bias": _t(sd[f"{b}.attn.proj.bias"]),
        }
        p[f"Block_{i}"] = {
            "norm1": {"LayerNorm_0": {"scale": _t(sd[f"{b}.norm1.weight"]),
                                       "bias": _t(sd[f"{b}.norm1.bias"])}},
            "attn": attn,
            "ls1": _t(sd[f"{b}.ls1.gamma"]) if f"{b}.ls1.gamma" in sd else np.ones(dim) * 1e-5,
            "norm2": {"LayerNorm_0": {"scale": _t(sd[f"{b}.norm2.weight"]),
                                       "bias": _t(sd[f"{b}.norm2.bias"])}},
            "Mlp_0": {
                "Dense_0": {"kernel": _t(sd[f"{b}.mlp.fc1.weight"]).T,
                             "bias": _t(sd[f"{b}.mlp.fc1.bias"])},
                "Dense_1": {"kernel": _t(sd[f"{b}.mlp.fc2.weight"]).T,
                             "bias": _t(sd[f"{b}.mlp.fc2.bias"])},
            },
            "ls2": _t(sd[f"{b}.ls2.gamma"]) if f"{b}.ls2.gamma" in sd else np.ones(dim) * 1e-5,
        }
    p["norm"] = {"LayerNorm_0": {"scale": _t(sd["norm.weight"]), "bias": _t(sd["norm.bias"])}}
    return {"params": p}


def stack_scanned_blocks(params: dict, depth: int, scan_group: int = 1) -> dict:
    """Convert unrolled ``Block_{i}`` params to the ``scan_blocks`` layout
    (one ``blocks`` child with a stacked leading depth axis).  With
    ``scan_group=k`` the stack is regrouped to the grouped remat-scan layout
    (``blocks/inner/…`` with leading ``(depth/k, k)`` axes) that
    ``VisionTransformer(scan_group=k)`` initialises."""
    import jax

    blocks = [params.pop(f"Block_{i}") for i in range(depth)]
    # scanned layout (verified against VisionTransformer(scan_blocks=True)
    # init): params["blocks"]["Block_0"][...] with a stacked depth axis
    params["blocks"] = {"Block_0": jax.tree_util.tree_map(lambda *xs: np.stack(xs), *blocks)}
    if scan_group > 1:
        from irw_tpu.models.vit import regroup_block_params

        params["blocks"] = regroup_block_params(params["blocks"], scan_group)
    return params


def convert_siglip(sd: dict) -> dict:
    """torch ``SiglipVisionModel`` state dict (the architecture behind
    google/siglip2-base-patch16-224, config/model/siglip2.yaml) →
    ``HuggingFaceVisionWrapper(variant='siglip2')`` params
    (irw_tpu/models/siglip.SiglipVisionTower).

    Pure transpose/split mapping: torch Linear (out,in) → flax kernel
    (in,out); the pooling head's fused ``in_proj`` splits row-wise into
    q/k/v.  Forward parity vs the actual transformers torch implementation
    is asserted in tests/test_converter_numeric.py."""
    pre = "vision_model."
    sd = {k[len(pre):] if k.startswith(pre) else k: _t(v)
          for k, v in sd.items() if "position_ids" not in k}

    def lin(key):
        return {"kernel": sd[f"{key}.weight"].T, "bias": sd[f"{key}.bias"]}

    def ln(key):
        return {"scale": sd[f"{key}.weight"], "bias": sd[f"{key}.bias"]}

    tower: dict = {
        "patch_embedding": {
            # torch conv (O,I,kh,kw) → flax (kh,kw,I,O)
            "kernel": sd["embeddings.patch_embedding.weight"].transpose(2, 3, 1, 0),
            "bias": sd["embeddings.patch_embedding.bias"],
        },
        "position_embedding": sd["embeddings.position_embedding.weight"],
        "post_layernorm": ln("post_layernorm"),
    }
    depth = max(int(k.split(".")[2]) for k in sd if k.startswith("encoder.layers.")) + 1
    for i in range(depth):
        p = f"encoder.layers.{i}"
        tower[f"layers_{i}"] = {
            "layer_norm1": ln(f"{p}.layer_norm1"),
            "layer_norm2": ln(f"{p}.layer_norm2"),
            "q_proj": lin(f"{p}.self_attn.q_proj"),
            "k_proj": lin(f"{p}.self_attn.k_proj"),
            "v_proj": lin(f"{p}.self_attn.v_proj"),
            "out_proj": lin(f"{p}.self_attn.out_proj"),
            "fc1": lin(f"{p}.mlp.fc1"),
            "fc2": lin(f"{p}.mlp.fc2"),
        }
    d = tower["position_embedding"].shape[-1]
    in_w = sd["head.attention.in_proj_weight"]  # (3D, D), rows [q; k; v]
    in_b = sd["head.attention.in_proj_bias"]
    tower["head"] = {
        "probe": sd["head.probe"],
        "q_proj": {"kernel": in_w[:d].T, "bias": in_b[:d]},
        "k_proj": {"kernel": in_w[d:2 * d].T, "bias": in_b[d:2 * d]},
        "v_proj": {"kernel": in_w[2 * d:].T, "bias": in_b[2 * d:]},
        "out_proj": lin("head.attention.out_proj"),
        "layernorm": ln("head.layernorm"),
        "fc1": lin("head.mlp.fc1"),
        "fc2": lin("head.mlp.fc2"),
    }
    return {"params": {"tower": tower}}


def convert_hf_vision(sd: dict, variant: str = "clip_vit_b16", **config_overrides) -> dict:
    """torch ``transformers`` vision-tower state dict (CLIPVisionModel /
    ViTModel — the towers the reference pulls at runtime for
    clip/siglip2/metaclip2/openclip, net.py:335-408,
    hugging_face_models.py:6-24) → ``HuggingFaceVisionWrapper`` params.

    Uses transformers' own torch→flax key/transpose rules against the SAME
    config object the wrapper builds (hf_wrapper.build_hf_config), so the
    converted tree is structurally guaranteed to load; numeric forward
    parity is asserted in tests/test_converter_numeric.py."""
    import torch

    from transformers.modeling_flax_pytorch_utils import (
        convert_pytorch_state_dict_to_flax,
    )

    from irw_tpu.models.hf_wrapper import HF_DEFAULT_CONFIGS, build_hf_flax_model

    if HF_DEFAULT_CONFIGS[variant]["kind"] == "siglip":
        return convert_siglip(sd)
    flax_model = build_hf_flax_model(variant, do_init=True, **config_overrides)
    sd = {k: (v if isinstance(v, torch.Tensor) else torch.as_tensor(v))
          for k, v in sd.items()}
    params = convert_pytorch_state_dict_to_flax(sd, flax_model)
    # the wrapper nests the tower module under scope "tower"
    return {"params": {"tower": _to_numpy_tree(params)}}


def _to_numpy_tree(tree):
    if isinstance(tree, dict):
        return {k: _to_numpy_tree(v) for k, v in tree.items()}
    return np.asarray(tree)


HF_KINDS = ("clip_vit_b32", "clip_vit_b16", "vit_b16_hf", "siglip2", "metaclip2")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--kind", required=True,
                        choices=["resnet18", "resnet50", "resnet101",
                                 "densenet121",
                                 "dinov2_vits14", "dinov2_vitb14",
                                 *HF_KINDS])
    parser.add_argument("--src", required=True)
    parser.add_argument("--dst", required=True)
    parser.add_argument("--scan", action="store_true",
                        help="emit the scan_blocks ViT layout (stacked depth axis)")
    parser.add_argument("--config-json", default=None,
                        help="HF kinds only: the checkpoint's own config.json "
                             "(vision_config honored) — real checkpoints can "
                             "differ from the local preset (hidden sizes, "
                             "hidden_act quick_gelu vs gelu); keys present in "
                             "the file override the preset")
    args = parser.parse_args()

    import torch
    from flax.serialization import msgpack_serialize

    sd = torch.load(args.src, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    if args.kind.startswith("resnet"):
        sizes = {"resnet18": (2, 2, 2, 2), "resnet50": (3, 4, 6, 3),
                 "resnet101": (3, 4, 23, 3)}[args.kind]
        tree = convert_resnet(sd, sizes, bottleneck=args.kind != "resnet18")
    elif args.kind == "densenet121":
        tree = convert_densenet(sd)
    elif args.kind in HF_KINDS:
        overrides = {}
        if args.config_json:
            import json

            with open(args.config_json) as f:
                cj = json.load(f)
            cj = cj.get("vision_config", cj)
            overrides = {k: cj[k] for k in
                         ("hidden_size", "num_hidden_layers",
                          "num_attention_heads", "image_size", "patch_size",
                          "intermediate_size", "hidden_act", "layer_norm_eps")
                         if k in cj}
        tree = convert_hf_vision(sd, variant=args.kind, **overrides)
    else:
        tree = convert_dinov2(sd)
        if args.scan:
            depth = sum(1 for k in tree["params"] if k.startswith("Block_"))
            tree["params"] = stack_scanned_blocks(tree["params"], depth)
    with open(args.dst, "wb") as f:
        f.write(msgpack_serialize(tree))
    print(f"wrote {args.dst}")


if __name__ == "__main__":
    main()
