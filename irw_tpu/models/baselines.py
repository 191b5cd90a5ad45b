"""Single-backbone baselines and probes.

Reference: dino_baseline.py (DINOHashBaseline), detail_tester.py
(DetailTesterNet / SingleBandNet), dino_models.py (DinoModel_ce /
Multi_DinoModel), hugging_face_models.py (HF vision wrapper — gated here
because `transformers` weights need conversion; the class exists so configs
resolve, see tools/convert_torch_weights.py).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from irw_tpu.models.layers import HashHead, binarize, l2_normalize
from irw_tpu.models.multi_dino import BandedViT
from irw_tpu.models.vit import VIT_DIMS, make_vit


class DINOHashBaseline(nn.Module):
    """Single ViT + Linear(no-bias)+BN hash head; logits in train, sign in
    eval (dino_baseline.py:4-35).  Input: plain images (B, H, W, C).

    Setup-style with the nn.compact-era auto-names pinned explicitly, so
    checkpoints/converter trees are unchanged and the pipeline-parallel
    apply (parallel/pp.py) can delegate to ``head_out`` as the single
    source of truth for the head + binarize tail."""

    backbone: str = "dinov2_vits14"
    nbits: int = 64
    frozen_backbone: bool = True
    vit_kwargs: dict | None = None

    def setup(self):
        from .vit import VisionTransformer, vit_config

        self.vit = VisionTransformer(
            **vit_config(self.backbone, **(self.vit_kwargs or {})),
            name="VisionTransformer_0")
        self.head = HashHead(self.nbits, use_bn=True, name="HashHead_0")

    def __call__(self, x, train: bool = False):
        cls, _ = self.vit(x, train=train and not self.frozen_backbone)
        if self.frozen_backbone:
            cls = jax.lax.stop_gradient(cls)
        return self.head_out(cls, train)

    def head_out(self, cls, train: bool = False):
        """Hash head + binarize on precomputed cls embeddings (the pp
        train step pipelines the backbone, then applies this via
        ``model.apply(..., method="head_out")``)."""
        logits = self.head(cls, train=train)
        return binarize(logits, train), {"ortho_loss": jnp.float32(0.0)}


class SingleBandNet(nn.Module):
    """Single-subband probe (detail_tester.py:54-86): picks one band from
    the (B, S, H, W, C) stack; hashing (tanh/sign) or metric (L2-norm)
    output."""

    backbone: str = "dinov2_vits14"
    band: int = 0
    mode: str = "hashing"  # 'hashing' | 'metric'
    nbits: int = 64
    frozen_backbone: bool = True
    vit_kwargs: dict | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        cls, _ = make_vit(self.backbone, **(self.vit_kwargs or {}))(
            x[:, self.band], train=train and not self.frozen_backbone
        )
        if self.frozen_backbone:
            cls = jax.lax.stop_gradient(cls)
        aux = {"ortho_loss": jnp.float32(0.0)}
        if self.mode == "hashing":
            logits = HashHead(self.nbits, use_bn=True)(cls, train=train)
            return binarize(logits, train, "tanh"), aux
        return l2_normalize(cls), aux


DetailTesterNet = SingleBandNet


class DinoModelCE(nn.Module):
    """CLS-token classifier in train / normalised CLS in eval
    (dino_models.py:6-30)."""

    backbone: str = "dinov2_vits14"
    num_classes: int = 100
    frozen_backbone: bool = True
    vit_kwargs: dict | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        cls, _ = make_vit(self.backbone, **(self.vit_kwargs or {}))(
            x, train=train and not self.frozen_backbone
        )
        if self.frozen_backbone:
            cls = jax.lax.stop_gradient(cls)
        aux = {"ortho_loss": jnp.float32(0.0)}
        if train:
            return nn.Dense(self.num_classes, kernel_init=nn.initializers.zeros)(cls), aux
        return l2_normalize(cls), aux


class MultiDinoModel(nn.Module):
    """Per-band ViTs; train → list of per-branch embeddings, eval →
    normalised concat (dino_models.py:32-54)."""

    backbone: str = "dinov2_vits14"
    branches: tuple = (0, 1, 2, 3)
    frozen_backbone: bool = True
    vit_kwargs: dict | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        bands = x[:, jnp.array(self.branches)]
        cls, _ = BandedViT(backbone=self.backbone, vit_kwargs=self.vit_kwargs)(
            bands, train=train and not self.frozen_backbone
        )
        if self.frozen_backbone:
            cls = jax.lax.stop_gradient(cls)
        aux = {"ortho_loss": jnp.float32(0.0)}
        if train:
            return [cls[:, i] for i in range(cls.shape[1])], aux
        return l2_normalize(cls.reshape(cls.shape[0], -1)), aux
