"""Model registry: explicit name → constructor map.

Replaces the reference's ``getattr(models_module, config.name)`` dispatch
(main/getter.py:235-244) with a declared registry; names cover the backbone
zoo of main/models/net.py:20-414 so existing model configs resolve.
"""

from __future__ import annotations

from typing import Callable

MODEL_REGISTRY: dict[str, Callable] = {}


def register_model(name: str):
    def wrap(ctor):
        MODEL_REGISTRY[name] = ctor
        return ctor

    return wrap


def _populate():
    from irw_tpu.models import baselines, hashing_nets, mtwavenet, multi_dino, wresnet
    from irw_tpu.models.convnext import (
        convnext_small as _convnext_small,
        convnext_tiny as _convnext_tiny,
    )
    from irw_tpu.models.densenet import densenet121 as _densenet121
    from irw_tpu.models.resnet import resnet18, resnet34, resnet50, resnet101
    from irw_tpu.models.vit import make_vit

    entries = {
        # plain trunks (wrapped by RetrievalNet through the getter)
        "resnet18": resnet18,
        "resnet34": resnet34,
        "resnet50": resnet50,
        "resnet101": resnet101,
        "densenet121": _densenet121,
        "convnext": _convnext_tiny,
        "convnext_tiny": _convnext_tiny,
        "convnext_small": _convnext_small,
        "vit_small": lambda **kw: make_vit("vit_small", **kw),
        "vit_base": lambda **kw: make_vit("vit_base", **kw),
        "vit_tiny": lambda **kw: make_vit("vit_tiny", **kw),
        "deit_small": lambda **kw: make_vit("deit_small", **kw),
        "dino": lambda **kw: make_vit("dinov2_vits14", **kw),
        # CE / hashing single trunks (resnet_ce.py)
        "resnet_ce": hashing_nets.ResNetCE,
        "resnet18_ce": lambda **kw: hashing_nets.ResNetCE(depth=18, **kw),
        "resnet50_tanh": hashing_nets.ResNetHashing,
        "resnet_hashing_2": hashing_nets.ResNetHashing,
        "resnet_hashing_alpha": hashing_nets.ResNetHashingAlpha,
        "resnet50_dsch": hashing_nets.ResNet50DSCH,
        "resnet50_mod": hashing_nets.ResNet50Mod,
        # wavelet CNN families (wresnet.py)
        "wresnet": wresnet.WaveResNet,
        "wresnet_ce": wresnet.WaveResNetCE,
        "wcnn": lambda **kw: wresnet.WCNN(ce=False, **kw),
        "wcnn_ce": lambda **kw: wresnet.WCNN(ce=True, **kw),
        "wcnn_all_subs": wresnet.WCNN_ALL,
        "wcnn_attention": lambda **kw: wresnet.WCNNAttention(ce=False, **kw),
        "wcnn_attention_ce": lambda **kw: wresnet.WCNNAttention(ce=True, **kw),
        # stage-interleaved multi-branch (mtwavenet.py)
        "mtwavenet": lambda **kw: mtwavenet.FourBranchResNet(depth=18, **kw),
        "mtwavenet50": mtwavenet.FourBranchResNet50,
        "mtwavenet50_fusion": mtwavenet.FourBranchResNet50Fusion,
        "hybrid_mtwavenet_ce": mtwavenet.HybridMultiBranch,
        "hybrid_mtwavenet_v2_ce": mtwavenet.HybridMultiBranchV2,
        # DINO families (dino_models.py, multi_dino_attention.py, dino_baseline.py)
        "dino_ce": baselines.DinoModelCE,
        "multi_dino": baselines.MultiDinoModel,
        "multidino_attention": multi_dino.MultiDinoAttention,
        "multidino_attention_hashing": multi_dino.MultiDinoHashing,
        "multidino_attention_hashing_ortho": multi_dino.MultiDinoHashing,
        "multidino_hashing_tf": lambda **kw: multi_dino.MultiDinoHashing(
            tanh_train=True, **kw
        ),
        "shared_dino_hashing": multi_dino.SharedDinoHashing,
        "prompted_shared_dino_hashing": multi_dino.PromptedSharedDinoHashing,
        "pretrained_multidino_hashing": multi_dino.PretrainedMultiDinoHashing,
        "dino_hash_baseline": baselines.DINOHashBaseline,
        "single_band_net": baselines.SingleBandNet,
        "detail_tester": baselines.DetailTesterNet,
    }
    MODEL_REGISTRY.update(entries)

    # reference-preset class names (RetrievalNet, MultiDinoHashing, ...)
    # with the reference kwargs dialect — factory.py adapters
    from irw_tpu.models.factory import reference_model_entries

    MODEL_REGISTRY.update(reference_model_entries())

    # HF-backed towers (clip/siglip2/metaclip2, net.py:335-374): gated —
    # only registered when transformers' flax classes import cleanly
    try:
        from irw_tpu.models.hf_wrapper import HF_DEFAULT_CONFIGS, HuggingFaceVisionWrapper

        for variant in HF_DEFAULT_CONFIGS:
            MODEL_REGISTRY[variant] = (
                lambda v=variant, **kw: HuggingFaceVisionWrapper(variant=v, **kw)
            )
        MODEL_REGISTRY["clip"] = MODEL_REGISTRY["clip_vit_b16"]
        MODEL_REGISTRY["openclip"] = MODEL_REGISTRY["clip_vit_b16"]
    except Exception:  # pragma: no cover - transformers flax unavailable
        pass


def get_model(name: str, **kwargs):
    """Instantiate a registered model by name (the getter's model path).

    ``dtype`` may be a string ('bfloat16'/'float32') from YAML configs —
    the bf16 compute policy is how the TPU build gets its MXU throughput.
    """
    if name not in MODEL_REGISTRY:
        _populate()
    import jax.numpy as jnp

    def _fix_dtype(d):
        if isinstance(d, dict) and isinstance(d.get("dtype"), str):
            d = dict(d)
            d["dtype"] = jnp.dtype(d["dtype"])
        return d

    kwargs = _fix_dtype(kwargs)
    for sub in ("vit_kwargs",):
        if isinstance(kwargs.get(sub), dict):
            kwargs[sub] = _fix_dtype(kwargs[sub])
    try:
        ctor = MODEL_REGISTRY[name]
    except KeyError as exc:
        raise ValueError(
            f"unknown model {name!r}; available: {sorted(MODEL_REGISTRY)}"
        ) from exc
    return ctor(**kwargs)


_populate()
