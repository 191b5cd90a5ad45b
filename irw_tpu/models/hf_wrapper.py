"""HuggingFace vision backbones as flax modules.

Reference: hugging_face_models.py (siglip2/metaclip2 via AutoModel,
net.py:335-408's clip/openclip/convnext/ibot hub pulls).  This image has
``transformers`` with Flax model classes but no downloaded weights (zero
egress), so the wrapper builds from *config* (random init) by default and
loads converted weights from a local path when given — the pattern the
reference used for dinov3's local checkpoints (net.py:275-321).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from irw_tpu.models.layers import l2_normalize

HF_DEFAULT_CONFIGS = {
    "clip_vit_b32": dict(kind="clip", hidden_size=768, num_hidden_layers=12,
                          num_attention_heads=12, image_size=224, patch_size=32),
    "clip_vit_b16": dict(kind="clip", hidden_size=768, num_hidden_layers=12,
                          num_attention_heads=12, image_size=224, patch_size=16),
    "vit_b16_hf": dict(kind="vit", hidden_size=768, num_hidden_layers=12,
                        num_attention_heads=12, image_size=224, patch_size=16),
    # google/siglip2-base-patch16-224 (config/model/siglip2.yaml): the
    # fixed-res SigLIP-2 checkpoints use the SigLIP vision architecture —
    # no CLS token, attention-pool head (irw_tpu/models/siglip.py)
    "siglip2": dict(kind="siglip", hidden_size=768, num_hidden_layers=12,
                     num_attention_heads=12, image_size=224, patch_size=16),
    "metaclip2": dict(kind="clip", hidden_size=768, num_hidden_layers=12,
                       num_attention_heads=12, image_size=224, patch_size=16),
}


def build_hf_config(variant: str, **overrides):
    """The transformers config object for a wrapper variant — shared between
    the module's setup and the weight converter (tools/convert_torch_weights
    builds the SAME config so converted trees always line up)."""
    cfg = {**HF_DEFAULT_CONFIGS[variant], **overrides}
    common = dict(
        hidden_size=cfg["hidden_size"],
        num_hidden_layers=cfg["num_hidden_layers"],
        num_attention_heads=cfg["num_attention_heads"],
        image_size=cfg["image_size"],
        patch_size=cfg["patch_size"],
        intermediate_size=cfg.get("intermediate_size", cfg["hidden_size"] * 4),
    )
    # real checkpoints can override activation/eps (e.g. CLIP quick_gelu vs
    # MetaCLIP gelu) — pass through when given (converter --config-json)
    for k in ("hidden_act", "layer_norm_eps"):
        if k in cfg:
            common[k] = cfg[k]
    if cfg["kind"] == "clip":
        from transformers import CLIPVisionConfig

        return CLIPVisionConfig(**common)
    if cfg["kind"] == "siglip":
        from transformers import SiglipVisionConfig

        return SiglipVisionConfig(**common)
    from transformers import ViTConfig

    return ViTConfig(**common)


def build_hf_flax_model(variant: str, do_init: bool = False, **overrides):
    """The transformers Flax model for a variant (uninitialised by default;
    the converter needs ``do_init=True`` — transformers' torch→flax
    converter reads the template tree from ``model.params``).

    SigLIP has no transformers Flax class — those variants use the native
    tower (irw_tpu/models/siglip.py) and never reach here."""
    kind = HF_DEFAULT_CONFIGS[variant]["kind"]
    if kind == "siglip":
        raise ValueError("siglip variants use irw_tpu.models.siglip."
                         "SiglipVisionTower (transformers has no Flax SigLIP)")
    config = build_hf_config(variant, **overrides)
    if kind == "clip":
        from transformers import FlaxCLIPVisionModel

        return FlaxCLIPVisionModel(config, _do_init=do_init)
    from transformers import FlaxViTModel

    return FlaxViTModel(config, _do_init=do_init)


class HuggingFaceVisionWrapper(nn.Module):
    """Pooled CLS output of a transformers Flax vision tower
    (hugging_face_models.py:6-24).  ``variant`` picks a config preset;
    pretrained weights come via params restore (checkpoint or
    tools/convert_torch_weights.py --kind clip_vit_b16/siglip2/...)."""

    variant: str = "clip_vit_b16"
    normalize: bool = True
    # same override dialect as build_hf_config / the converter's
    # --config-json: a model built with the overrides a checkpoint was
    # converted with is guaranteed to match it (e.g. hidden_act)
    config_overrides: dict | None = None

    def setup(self):
        overrides = dict(self.config_overrides or {})
        if HF_DEFAULT_CONFIGS[self.variant]["kind"] == "siglip":
            from irw_tpu.models.siglip import SiglipVisionTower

            cfg = {**HF_DEFAULT_CONFIGS[self.variant], **overrides}
            self.tower = SiglipVisionTower(
                hidden_size=cfg["hidden_size"],
                num_layers=cfg["num_hidden_layers"],
                num_heads=cfg["num_attention_heads"],
                patch_size=cfg["patch_size"],
                image_size=cfg["image_size"],
                intermediate_size=cfg.get("intermediate_size",
                                          cfg["hidden_size"] * 4),
                layer_norm_eps=cfg.get("layer_norm_eps", 1e-6),
                hidden_act=cfg.get("hidden_act", "gelu_pytorch_tanh"),
            )
        else:
            self.tower = build_hf_flax_model(self.variant, **overrides).module

    def __call__(self, x, train: bool = False):
        if HF_DEFAULT_CONFIGS[self.variant]["kind"] == "siglip":
            pooled, _ = self.tower(x, train=train)
        else:
            # the inner transformers Flax modules take channel-LAST
            # pixel_values (the outer FlaxPreTrainedModel wrapper, which we
            # bypass, is what transposes NCHW→NHWC —
            # modeling_flax_clip.py:761); our pipeline is already NHWC
            out = self.tower(pixel_values=x, deterministic=not train)
            pooled = out.pooler_output
        aux = {"ortho_loss": jnp.float32(0.0)}
        if self.normalize:
            return l2_normalize(pooled), aux
        return pooled, aux
