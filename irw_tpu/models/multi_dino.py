"""Multi-band ViT retrieval/hashing models (the flagship family).

Reference: multi_dino_attention.py:392-698 — MultiDinoAttention,
MultiDinoHashing, MultiDinoHashingTF, SharedDinoHashing,
PromptedSharedDinoHashing, PretrainedMultiDinoHashing.

TPU-first re-design:
- the four per-band backbones are ONE ``nn.vmap``-ed ViT with a leading
  band axis on the parameters — a single batched compute instead of four
  sequential module calls (the reference loops Python-side,
  multi_dino_attention.py:443-445);
- the shared-backbone variants fold the band axis into the batch
  (band-major, exactly like the reference's permute+view,
  multi_dino_attention.py:516-524) — on TPU this quadruples the matmul
  batch instead of quadrupling the step count;
- frozen backbones are an *optimizer* concern here (see
  ``frozen_param_collections``) — the getter builds an optax mask from it;
- band input layout is (B, S, H, W, C) with S=4 ordered [LL, LH, HL, HH].

Every ``__call__`` returns ``(output, aux)``; hashing models emit logits in
train and ±1 codes in eval.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from irw_tpu.models.fusion import get_fusion_head
from irw_tpu.models.layers import HashHead, binarize, l2_normalize, trunc_normal_init
from irw_tpu.models.vit import VIT_DIMS, VisionTransformer, make_vit, vit_config


class BandedViT(nn.Module):
    """A ViT vmapped over the band axis: independent parameters per band,
    one fused forward pass.  Input (B, S, H, W, C) → CLS stack (B, S, D).

    Replaces the reference's Python loop over an nn.ModuleList of four hub
    backbones (multi_dino_attention.py:395-404, 443-445)."""

    backbone: str = "dinov2_vits14"
    vit_kwargs: dict | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        # under band parallelism the engine registers band_axes with the
        # attention-mesh context; lifting with spmd_axis_name="band" makes
        # vmap's shard_map batching rule insert "band" into the VMEM
        # attention kernel's specs — each device runs the kernel on its
        # LOCAL bands, collective-free (ops/vmem_attention.set_attention_mesh)
        from irw_tpu.ops.vmem_attention import band_spmd_axis

        spmd_axis = band_spmd_axis()
        cfg = vit_config(self.backbone, **(self.vit_kwargs or {}))
        if spmd_axis is None:
            vmapped_cls = nn.vmap(
                VisionTransformer,
                in_axes=(1, None),
                out_axes=0,
                variable_axes={"params": 0, "batch_stats": 0, "intermediates": 0},
                split_rngs={"params": True, "dropout": True},
            )
            # NB: lifted vmap drops kwargs — `train` must ride positionally
            cls, aux = vmapped_cls(**cfg)(x, train)
        else:
            # the function form of nn.vmap: flax's spmd_axis_name path
            # cannot tree-match the static `train` bool against
            # in_axes=None ("Expected None, got True"), so close over it.
            # The explicit child name keeps the param path identical to
            # the class form ("VmapVisionTransformer_0"), which the band
            # sharding rules key on (parallel/band.is_band_stacked) and
            # checkpoints embed.
            def fwd(mdl, xb):
                return mdl(xb, train)

            vmapped = nn.vmap(
                fwd,
                in_axes=(1,),
                out_axes=0,
                variable_axes={"params": 0, "batch_stats": 0, "intermediates": 0},
                split_rngs={"params": True, "dropout": True},
                spmd_axis_name=spmd_axis,
            )
            cls, aux = vmapped(
                VisionTransformer(name="VmapVisionTransformer_0", **cfg), x)
        return jnp.swapaxes(cls, 0, 1), aux  # (B, S, D)


def _banded_vit(backbone_name: str, num_bands: int, **vit_kw):
    return BandedViT(backbone=backbone_name, vit_kwargs=vit_kw or None)


class MultiDinoAttention(nn.Module):
    """4 per-band ViTs → fusion head → L2-normalised embedding
    (multi_dino_attention.py:392-413)."""

    backbone: str = "dinov2_vits14"
    fusion_config: dict | None = None
    num_bands: int = 4
    frozen_backbone: bool = True
    vit_kwargs: dict | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        dim = VIT_DIMS[self.backbone]
        bands, _ = _banded_vit(self.backbone, self.num_bands, **(self.vit_kwargs or {}))(
            x, train=train and not self.frozen_backbone
        )
        if self.frozen_backbone:
            # like requires_grad=False in the reference: the backward pass
            # skips the backbone entirely
            bands = jax.lax.stop_gradient(bands)
        head = get_fusion_head(self.fusion_config or {"output_dim": dim}, dim)
        fused, aux = head(bands, train=train)
        return l2_normalize(fused), aux

    @property
    def frozen_param_collections(self):
        return ("BandedViT_0",) if self.frozen_backbone else ()


class MultiDinoHashing(nn.Module):
    """MultiDinoAttention + hash head; logits in train, sign codes in eval
    (multi_dino_attention.py:415-449).  ``tanh_train=True`` gives the
    MultiDinoHashingTF continuation variant (:451-487)."""

    backbone: str = "dinov2_vits14"
    fusion_config: dict | None = None
    nbits: int = 64
    use_bn: bool = True
    num_bands: int = 4
    frozen_backbone: bool = True
    tanh_train: bool = False
    vit_kwargs: dict | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        dim = VIT_DIMS[self.backbone]
        bands, _ = _banded_vit(self.backbone, self.num_bands, **(self.vit_kwargs or {}))(
            x, train=train and not self.frozen_backbone
        )
        if self.frozen_backbone:
            # requires_grad=False equivalent: no backward through backbones
            bands = jax.lax.stop_gradient(bands)
        head = get_fusion_head(self.fusion_config or {"output_dim": dim}, dim)
        fused, aux = head(bands, train=train)
        logits = HashHead(self.nbits, use_bn=self.use_bn)(fused, train=train)
        out = binarize(logits, train, "tanh" if self.tanh_train else "identity")
        return out, aux

    @property
    def frozen_param_collections(self):
        return ("BandedViT_0",) if self.frozen_backbone else ()


class SharedDinoHashing(nn.Module):
    """One shared backbone over the band-major flattened batch
    (multi_dino_attention.py:491-532); tanh in train, sign in eval."""

    backbone: str = "dinov2_vits14"
    fusion_config: dict | None = None
    nbits: int = 64
    num_bands: int = 4
    frozen_backbone: bool = True
    num_prompts: int = 0
    use_dsln: bool = False
    vit_kwargs: dict | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, s, h, w, c = x.shape
        dim = VIT_DIMS[self.backbone]
        # band-major flatten: all LL first, then LH, ... (ref :516-518)
        flat = jnp.swapaxes(x, 0, 1).reshape(b * s, h, w, c)

        vit_kw = dict(self.vit_kwargs or {})
        if self.use_dsln:
            vit_kw["num_domains"] = self.num_bands
        if self.num_prompts > 0:
            vit_kw["num_prompts"] = self.num_prompts
        vit = make_vit(self.backbone, **vit_kw)

        domain = None
        if self.use_dsln:
            domain = jnp.repeat(jnp.arange(s), b)

        prompts = None
        if self.num_prompts > 0:
            # per-band learned prompt tokens (PromptedSharedDinoHashing :553)
            bank = self.param(
                "prompts", trunc_normal_init, (self.num_bands, self.num_prompts, dim)
            )
            prompts = jnp.repeat(bank, b, axis=0)  # (S*B, P, D) band-major

        cls, _ = vit(
            flat,
            train=train and not self.frozen_backbone,
            domain=domain,
            prompts=prompts,
        )
        if self.frozen_backbone and self.num_prompts == 0 and not self.use_dsln:
            # frozen shared tower with no trainable tokens inside: skip the
            # backbone backward (prompts/DSLN need grads THROUGH the tower)
            cls = jax.lax.stop_gradient(cls)
        bands = jnp.swapaxes(cls.reshape(s, b, dim), 0, 1)  # (B, S, D)

        head = get_fusion_head(self.fusion_config or {"output_dim": dim}, dim)
        fused, aux = head(bands, train=train)
        logits = HashHead(self.nbits, use_bn=True)(fused, train=train)
        return binarize(logits, train, "tanh"), aux

    @property
    def frozen_param_collections(self):
        return ("VisionTransformer_0",) if self.frozen_backbone else ()


def PromptedSharedDinoHashing(num_prompts: int = 10, **kw) -> SharedDinoHashing:
    """multi_dino_attention.py:534-598 — shared backbone with per-band
    visual prompts (and optional domain-specific LayerNorms)."""
    return SharedDinoHashing(num_prompts=num_prompts, **kw)


def PretrainedMultiDinoHashing(**kw) -> MultiDinoHashing:
    """multi_dino_attention.py:641-698 — frozen continuous model + trainable
    hash head.  Structurally MultiDinoHashing; the 'pretrained + frozen'
    part is weight loading (tools/convert_torch_weights.py / checkpoint
    restore) plus the optimizer mask over everything but the hash head."""
    kw.setdefault("frozen_backbone", True)
    return MultiDinoHashing(**kw)
