"""Reference-config compatibility factory.

The reference's model presets name torch classes (``RetrievalNet``,
``MultiDinoHashing``, ...) with a reference-specific kwargs dialect
(``backbones_config`` lists, ``binary_config.nbits``, ``with_autocast``,
``attention``+``attention_type`` pairs, ...).  The adapters here accept that
dialect verbatim and construct the equivalent TPU-native modules, so every
reference model preset (``/root/reference/config/model/*.yaml``) composes
and builds unchanged.

Reference: main/models/net.py:20-414 (``get_backbone`` dispatch),
net.py:417-489 (``RetrievalNet`` wrapper + its passthrough routing for
classifier/multi-branch/hashing trunks), main/getter.py:235-244.

Kwargs the torch build needed but the TPU build expresses differently are
normalised (``with_autocast`` → the models' dtype policy, ``frozen`` →
``frozen_backbone``/optimizer masks, hub ``weights`` paths → the offline
converter) and anything left that a module doesn't declare is dropped with
a debug log — mirroring the reference's own permissive ``**kwargs`` plumbing.
"""

from __future__ import annotations

import dataclasses
import inspect

from irw_tpu.utils import LOGGER


def _accepted(ctor) -> set:
    try:
        return {f.name for f in dataclasses.fields(ctor)}
    except TypeError:
        params = inspect.signature(ctor).parameters
        return set(params)


def _filter_kwargs(ctor, kw: dict, renames: dict | None = None) -> dict:
    renames = renames or {}
    fields = _accepted(ctor)
    out, dropped = {}, []
    for k, v in kw.items():
        k2 = renames.get(k, k)
        if k2 in fields:
            out[k2] = v
        else:
            dropped.append(k)
    if dropped:
        name = getattr(ctor, "__name__", str(ctor))
        LOGGER.debug(f"{name}: dropped reference-only kwargs {sorted(dropped)}")
    return out


def _pop_common(kw: dict) -> dict:
    """Normalise the reference's shared kwargs dialect."""
    kw = dict(kw)
    autocast = kw.pop("with_autocast", None)
    kw.pop("modelhooks", None)  # hooks are wired via experience.hooks_configs
    binary = kw.pop("binary_config", None)
    if isinstance(binary, dict) and binary.get("nbits") is not None:
        kw.setdefault("nbits", int(binary["nbits"]))
    bcfgs = kw.pop("backbones_config", None)
    if bcfgs:
        first = dict(bcfgs[0])
        kw.setdefault("backbone", first.get("name", "dinov2_vits14"))
        kw.setdefault("frozen_backbone", bool(first.get("frozen", False)))
    bcfg = kw.pop("backbone_config", None)
    if bcfg:
        kw.setdefault("backbone", bcfg.get("name", "dinov2_vits14"))
        kw.setdefault("frozen_backbone", bool(bcfg.get("frozen", False)))
        if bcfg.get("use_dsln"):
            kw.setdefault("use_dsln", True)
    # TPU equivalents of the reference's training affordances, applied to the
    # ViT family via vit_kwargs (non-ViT models just drop them):
    # - with_autocast (torch.cuda.amp, base_update.py autocast blocks) →
    #   bf16 compute policy (MXU peak path);
    # - unfrozen backbones → scanned-block FULL remat ("nothing" policy):
    #   the round-4 save-axis scan measured monotone speedup the LESS is
    #   saved (364 img/s / 27.1% MFU full remat vs 356.6 dots_no_batch vs
    #   347 dots at batch 48; "everything" doesn't even compile) — the
    #   backward is HBM-bound, so recomputing the block forward beats
    #   re-reading any saved intermediate (BASELINE.md round-4 table)
    vit_kw = dict(kw.get("vit_kwargs") or {})
    if autocast:
        vit_kw.setdefault("dtype", "bfloat16")
    if kw.get("frozen_backbone") is False:
        vit_kw.setdefault("remat_blocks", True)
        vit_kw.setdefault("remat_policy", "nothing")
        # VMEM-resident fused attention (ops/vmem_attention.py): no
        # HBM-materialised (N, N) tensors in forward OR backward — the
        # profiled dominant traffic class of the unfrozen step.  Measured
        # 401 img/s / 29.9% MFU at batch 96 vs 279 without (round 4).
        # Default on any TPU; CPU keeps stock XLA attention (the kernel's
        # interpret mode is numerically verified but slow —
        # tests/test_vmem_attention.py).  Multi-chip safety lives in
        # vmem_attention_fn itself: Mosaic custom calls cannot be
        # partitioned by GSPMD/Shardy (jax/_src/tpu_custom_call.py:339-352),
        # so the kernel runs inside a jax.shard_map over the mesh the
        # engine registers via set_attention_mesh (dp over "data", tp heads
        # over "model", and — round 5 — the vmapped band dim over "band"
        # via nn.vmap(spmd_axis_name) in BandedViT), falling back to flax
        # attention when no mesh is registered, under pipeline parallelism,
        # or when shapes don't divide.
        import jax

        vit_kw.setdefault("vmem_attn", jax.default_backend() == "tpu")
    if vit_kw:
        kw["vit_kwargs"] = vit_kw
    return kw


def _class_adapter(cls, renames: dict | None = None, **fixed):
    renames = {"dino_backbone": "backbone", **(renames or {})}

    def build(**kw):
        kw = _pop_common(kw)
        kw.update(fixed)
        if isinstance(kw.get("branches"), list):
            kw["branches"] = tuple(kw["branches"])
        return cls(**_filter_kwargs(cls, kw, renames))

    return build


def build_single_band(**kw):
    """SingleBandNet/DetailTesterNet (detail_tester.py:54-86): the reference
    keys ``backbone_name``/``detail_index``/``is_hashing``/``output_dim``."""
    from irw_tpu.models.baselines import SingleBandNet

    kw = _pop_common(kw)
    is_hashing = kw.pop("is_hashing", True)
    kw.setdefault("mode", "hashing" if is_hashing else "metric")
    out_dim = kw.pop("output_dim", None)
    if out_dim and kw["mode"] == "hashing":
        kw.setdefault("nbits", int(out_dim))
    return SingleBandNet(**_filter_kwargs(
        SingleBandNet, kw,
        renames={"backbone_name": "backbone", "detail_index": "band",
                 "dino_backbone": "backbone"}))


def _attention_kw(kw: dict) -> dict:
    """Reference pairs a bool ``attention`` with an ``attention_type``
    string; our modules take one ``attention`` string (or None)."""
    out = dict(kw)
    att = out.pop("attention", None)
    atype = out.pop("attention_type", "cbam")
    if att is True:
        out["attention"] = atype
    elif isinstance(att, str) and att:
        out["attention"] = att
    return out


_HASH_RENAMES = {"num_bits": "nbits", "n_bits": "nbits"}


def build_retrieval_net(backbone_name: str, embed_dim: int = 512,
                        norm_features=False, without_fc=False,
                        with_autocast=False, pooling: str = "default",
                        projection_normalization_layer: str = "none",
                        pretrained=False, frozen=False, **kw):
    """``RetrievalNet`` presets.  Two routes, same as the reference:

    - trunks the reference's forward returns untouched (classifier,
      multi-branch, hashing nets — net.py:476-481) build the TPU-native
      module directly;
    - embedding trunks get wrapped by our ``RetrievalNet``
      (pool → standardize → projection → L2, net.py:417-489).

    ``pretrained`` hub/timm weights don't exist in this image; conversion is
    offline via tools/convert_torch_weights.py, so the flag only logs.
    """
    from irw_tpu.models import baselines, hashing_nets, mtwavenet as mtw, wresnet as wrn
    from irw_tpu.models.retrieval_net import RetrievalNet
    from irw_tpu.models.vit import make_vit

    name = backbone_name
    if pretrained:
        LOGGER.info(
            f"model preset asks pretrained={pretrained!r} for {name!r}: load "
            "converted weights via tools/convert_torch_weights.py + restore")

    def _direct(cls, kwargs, renames=None, **fixed):
        kwargs = _filter_kwargs(cls, _pop_common(kwargs), renames)
        kwargs.update(fixed)
        return cls(**kwargs)

    # --- passthrough trunks ------------------------------------------------
    if name == "wresnet":
        return _direct(wrn.WaveResNet, _attention_kw(kw))
    if name == "wresnet_ce":
        return _direct(wrn.WaveResNetCE, _attention_kw(kw))
    if name == "wcnn":
        return _direct(wrn.WCNN, kw, ce=False)
    if name == "wcnn_ce":
        return _direct(wrn.WCNN, kw, ce=True)
    if name == "wcnn_attention":
        return _direct(wrn.WCNNAttention, _attention_kw(kw), ce=False)
    if name == "wcnn_attention_ce":
        return _direct(wrn.WCNNAttention, _attention_kw(kw), ce=True)
    if name == "resnet_ce":
        return _direct(hashing_nets.ResNetCE, kw, depth=50)
    if name == "resnet18_ce":
        return _direct(hashing_nets.ResNetCE, kw, depth=18)
    if name in ("resnet50_tanh", "resnet_hashing_2"):
        return _direct(hashing_nets.ResNetHashing, kw, renames=_HASH_RENAMES,
                       depth=50)
    if name == "dino_ce":
        return _direct(baselines.DinoModelCE, kw,
                       renames={"dino_backbone": "backbone"})
    if name in ("multi_dino", "multi_dino_v3"):
        kw2 = _pop_common(kw)
        if isinstance(kw2.get("branches"), list):
            kw2["branches"] = tuple(kw2["branches"])
        return baselines.MultiDinoModel(**_filter_kwargs(
            baselines.MultiDinoModel, kw2, {"dino_backbone": "backbone"}))
    if name == "mtwavenet":
        return _direct(mtw.FourBranchResNet, _attention_kw(kw), depth=18)
    if name == "mtwavenet50":
        return _direct(mtw.FourBranchResNet50, _attention_kw(kw))
    if name == "mtwavenet50_fusion":
        return _direct(mtw.FourBranchResNet50Fusion, _attention_kw(kw))
    if name == "hybrid_mtwavenet_ce":
        return _direct(mtw.HybridMultiBranch, _attention_kw(kw))
    if name == "hybrid_mtwavenet_v2_ce":
        return _direct(mtw.HybridMultiBranchV2, _attention_kw(kw))

    # --- wrapped embedding trunks -------------------------------------------
    if name in ("resnet18", "resnet50", "resnet101"):
        from irw_tpu.models import resnet as _rn

        trunk = getattr(_rn, name)()
    elif name == "vit":
        trunk = make_vit("vit_small", patch_size=16)
    elif name.startswith("vit_deit"):
        trunk = make_vit("deit_base" if "base" in name else "deit_small",
                         patch_size=16)
    elif name in ("dino", "dino_v3"):
        trunk = make_vit(kw.get("dino_backbone", "dinov2_vits14"))
    elif name == "convnext":
        from irw_tpu.models.convnext import convnext_small, convnext_tiny

        bb = kw.get("bb_name", "convnext_tiny")
        trunk = convnext_small() if "small" in bb else convnext_tiny()
    elif name == "ibot":
        bb = kw.get("bb_name", "vit_small")
        trunk = make_vit("vit_base" if "base" in bb else "vit_small",
                         patch_size=16)
    elif name in ("clip", "siglip2", "metaclip2", "openclip"):
        try:
            from irw_tpu.models.hf_wrapper import HuggingFaceVisionWrapper

            variant = {"clip": "clip_vit_b16", "openclip": "clip_vit_b16",
                       "siglip2": "siglip2", "metaclip2": "metaclip2"}[name]
            trunk = HuggingFaceVisionWrapper(variant=variant)
        except Exception:  # transformers flax unavailable: native ViT tower
            trunk = make_vit("vit_base", patch_size=16)
    else:
        raise ValueError(f"RetrievalNet: unknown backbone_name {name!r} "
                         "(net.py:20-414 dispatch)")

    proj_norm = projection_normalization_layer
    return RetrievalNet(
        backbone=trunk,
        embed_dim=int(embed_dim),
        pooling=pooling,
        standardize=bool(norm_features),
        projection_norm=None if proj_norm in (None, "none") else proj_norm,
        without_fc=bool(without_fc),
        frozen_backbone=bool(frozen),
    )


def reference_model_entries() -> dict:
    """Class-style registry names used by the reference presets."""
    from irw_tpu.models import baselines, hashing_nets, multi_dino

    return {
        "RetrievalNet": build_retrieval_net,
        "retrieval_net": build_retrieval_net,
        "MultiDinoAttention": _class_adapter(multi_dino.MultiDinoAttention),
        "MultiDinoHashing": _class_adapter(multi_dino.MultiDinoHashing),
        "MultiDinoHashingTF": _class_adapter(
            multi_dino.MultiDinoHashing, tanh_train=True),
        "PretrainedMultiDinoHashing": _class_adapter(
            multi_dino.MultiDinoHashing, frozen_backbone=True),
        "SharedDinoHashing": _class_adapter(multi_dino.SharedDinoHashing),
        "PromptedSharedDinoHashing": _class_adapter(
            multi_dino.PromptedSharedDinoHashing),
        "DINOHashBaseline": _class_adapter(baselines.DINOHashBaseline),
        "SingleBandNet": build_single_band,
        "DetailTesterNet": build_single_band,
        "ResNet50Mod": _class_adapter(
            hashing_nets.ResNet50Mod,
            renames={"nbits": "n_bits", "num_bits": "n_bits"}),
        "ResNet50DSCH": _class_adapter(
            hashing_nets.ResNet50DSCH,
            renames={"nbits": "n_bits", "num_bits": "n_bits"}),
    }
