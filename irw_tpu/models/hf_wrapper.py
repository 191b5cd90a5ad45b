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
    "siglip2": dict(kind="clip", hidden_size=768, num_hidden_layers=12,
                     num_attention_heads=12, image_size=224, patch_size=16),
    "metaclip2": dict(kind="clip", hidden_size=768, num_hidden_layers=12,
                       num_attention_heads=12, image_size=224, patch_size=16),
}


class HuggingFaceVisionWrapper(nn.Module):
    """Pooled CLS output of a transformers Flax vision tower
    (hugging_face_models.py:6-24).  ``variant`` picks a config preset;
    pretrained weights come via params restore (checkpoint / converter)."""

    variant: str = "clip_vit_b16"
    normalize: bool = True

    def setup(self):
        cfg = HF_DEFAULT_CONFIGS[self.variant]
        if cfg["kind"] == "clip":
            from transformers import CLIPVisionConfig, FlaxCLIPVisionModel

            config = CLIPVisionConfig(
                hidden_size=cfg["hidden_size"],
                num_hidden_layers=cfg["num_hidden_layers"],
                num_attention_heads=cfg["num_attention_heads"],
                image_size=cfg["image_size"],
                patch_size=cfg["patch_size"],
                intermediate_size=cfg["hidden_size"] * 4,
            )
            self.tower = FlaxCLIPVisionModel(config, _do_init=False).module
        else:
            from transformers import FlaxViTModel, ViTConfig

            config = ViTConfig(
                hidden_size=cfg["hidden_size"],
                num_hidden_layers=cfg["num_hidden_layers"],
                num_attention_heads=cfg["num_attention_heads"],
                image_size=cfg["image_size"],
                patch_size=cfg["patch_size"],
                intermediate_size=cfg["hidden_size"] * 4,
            )
            self.tower = FlaxViTModel(config, _do_init=False).module

    def __call__(self, x, train: bool = False):
        # HF flax vision models take channel-first pixel_values
        pixels = jnp.moveaxis(x, -1, 1)
        out = self.tower(pixel_values=pixels, deterministic=not train)
        pooled = out.pooler_output
        aux = {"ortho_loss": jnp.float32(0.0)}
        if self.normalize:
            return l2_normalize(pooled), aux
        return pooled, aux
