"""WaveResNet / WCNN family: ResNet branches over wavelet subbands.

Reference: main/models/wresnet.py:252-546.

- ``WaveResNet``: in-model DWT (here: on-device :mod:`irw_tpu.ops.wavelets`
  lifting instead of pytorch_wavelets) → 4 ResNet-50 branches with a 1×1
  stem → optional CBAM/ECA subband fusion.  The reference's ``ll_only``
  NameError at wresnet.py:292 is fixed, per SURVEY §7 "bugs to not
  replicate".
- ``WaveResNetCE``: + per-branch classifiers for CE training (:325).
- ``WCNN``: 4 branches over externally supplied subbands, per-branch
  classifier logits in train / L2-normalised concat embedding in eval
  (:405-445).
- ``WCNN_ALL``: 7-branch two-level variant (:447).
- ``WCNNAttention``: WCNN + CBAM/ECA gate fusion with gate-alpha
  introspection via aux (:485-523); ``ce=True`` = WCNN_Attention_CE (:526).

All branch compute is a single ``nn.vmap``-ed ResNet (per-branch params,
fused batched convs) instead of the reference's sequential branch loop.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from irw_tpu.models.attention_blocks import SUBBAND_GATES
from irw_tpu.models.layers import l2_normalize
from irw_tpu.models.resnet import BasicBlock, Bottleneck, ResNet
from irw_tpu.ops.wavelets.lifting import lifting_decompose


class BandedResNet(nn.Module):
    """ResNet vmapped over the band axis: (B, S, H, W, C) → (B, S, D)."""

    stage_sizes: tuple = (3, 4, 6, 3)
    block_name: str = "bottleneck"
    width: int = 64
    stem_kernel: int = 7
    stem_stride: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, frozen_bn: bool = False):
        vmapped = nn.vmap(
            ResNet,
            in_axes=(1, None, None),
            out_axes=0,
            variable_axes={"params": 0, "batch_stats": 0, "intermediates": 0},
            split_rngs={"params": True, "dropout": True},
        )
        block = Bottleneck if self.block_name == "bottleneck" else BasicBlock
        # NB: lifted vmap drops kwargs — train/frozen_bn ride positionally
        feats = vmapped(
            stage_sizes=self.stage_sizes,
            block=block,
            width=self.width,
            stem_kernel=self.stem_kernel,
            stem_stride=self.stem_stride,
            dtype=self.dtype,
        )(x, train, frozen_bn)
        return jnp.swapaxes(feats, 0, 1)  # (B, S, D)


def decompose_to_bands(x, levels: int, basis: str):
    """(B, H, W, C) images → (B, 4, h, w, C) coarsest-level subband stack
    (the in-model DWT of wresnet.py:256, on device)."""
    img = jnp.moveaxis(x, -1, 1)  # (B, C, H, W)
    approx, details = lifting_decompose(img, levels=levels, basis=basis)
    stack = jnp.stack([approx[-1], *details[-1]], axis=1)  # (B, 4, C, h, w)
    return jnp.moveaxis(stack, 2, -1)


def _wcnn_branch_feats(x, backbone: str, frozen_bn: bool, dtype, train: bool):
    """Shared branch trunk: must be called inside a compact scope."""
    if backbone == "resnet18":
        sizes, block = (2, 2, 2, 2), "basic"
    else:
        sizes, block = (3, 4, 6, 3), "bottleneck"
    return BandedResNet(stage_sizes=sizes, block_name=block, dtype=dtype)(
        x, train=train, frozen_bn=frozen_bn
    )


class WaveResNet(nn.Module):
    """In-model DWT + 4 ResNet-50 branches + optional subband gate fusion
    (wresnet.py:252-323).  Input: plain images (B, H, W, C)."""

    decom_level: int = 1
    wave: str = "haar"
    feature_size: int = 2048
    attention: str | None = None  # None | 'cbam' | 'eca'
    ll_only: bool = False
    frozen_bn: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        bands = decompose_to_bands(x, self.decom_level, self.wave)
        if self.ll_only:
            bands = bands[:, :1]
        feats = BandedResNet(
            stage_sizes=(3, 4, 6, 3),
            block_name="bottleneck",
            stem_kernel=1,  # 1×1 stem surgery (wresnet.py:260-261)
            stem_stride=1,
            dtype=self.dtype,
        )(bands, train=train, frozen_bn=self.frozen_bn)
        aux = {"ortho_loss": jnp.float32(0.0)}
        if self.attention in SUBBAND_GATES and not self.ll_only:
            fused, alphas = SUBBAND_GATES[self.attention](num_subbands=feats.shape[1])(feats)
            aux["gate"] = alphas
            return fused, aux
        return feats.reshape(feats.shape[0], -1), aux


class WaveResNetCE(nn.Module):
    """WaveResNet + per-branch classifiers (wresnet.py:325-403): per-branch
    logits in train, normalised concat embedding in eval."""

    num_classes: int = 100
    decom_level: int = 1
    wave: str = "haar"
    frozen_bn: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        bands = decompose_to_bands(x, self.decom_level, self.wave)
        feats = BandedResNet(
            stage_sizes=(3, 4, 6, 3),
            block_name="bottleneck",
            stem_kernel=1,
            stem_stride=1,
            dtype=self.dtype,
        )(bands, train=train, frozen_bn=self.frozen_bn)
        aux = {"ortho_loss": jnp.float32(0.0)}
        if train:
            logits = nn.DenseGeneral(
                self.num_classes,
                axis=-1,
                kernel_init=nn.initializers.zeros,
                name="branch_classifiers",
            )(feats)
            return [logits[:, i] for i in range(logits.shape[1])], aux
        emb = l2_normalize(feats, axis=-1).reshape(feats.shape[0], -1)
        return l2_normalize(emb), aux


class WCNN(nn.Module):
    """4 branches over externally supplied subbands (B, S, H, W, C);
    per-branch classifier logits in train / L2-normalised concat in eval
    (wresnet.py:405-445)."""

    num_classes: int = 100
    backbone: str = "resnet50"
    ce: bool = True
    frozen_bn: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = _wcnn_branch_feats(x, self.backbone, self.frozen_bn, self.dtype, train)
        aux = {"ortho_loss": jnp.float32(0.0)}
        if train and self.ce:
            logits = nn.DenseGeneral(
                self.num_classes, axis=-1, kernel_init=nn.initializers.zeros
            )(feats)
            return [logits[:, i] for i in range(logits.shape[1])], aux
        emb = l2_normalize(feats, axis=-1).reshape(feats.shape[0], -1)
        return l2_normalize(emb), aux


def WCNN_ALL(**kw) -> "WCNN":
    """7-branch 2-level variant (wresnet.py:447-483): same module — the
    band axis of the input carries 7 subbands instead of 4."""
    return WCNN(**kw)


class WCNNAttention(nn.Module):
    """WCNN + CBAM/ECA subband-gate fusion (wresnet.py:485-546).  In train
    with ``ce=True`` returns [per-branch logits..., fused logits]."""

    num_classes: int = 100
    attention: str = "cbam"
    ce: bool = False
    backbone: str = "resnet50"
    frozen_bn: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = _wcnn_branch_feats(x, self.backbone, self.frozen_bn, self.dtype, train)
        fused, alphas = SUBBAND_GATES[self.attention](num_subbands=feats.shape[1])(feats)
        aux = {"ortho_loss": jnp.float32(0.0), "gate": alphas}
        if train and self.ce:
            branch_logits = nn.DenseGeneral(
                self.num_classes, axis=-1, kernel_init=nn.initializers.zeros
            )(feats)
            fused_logits = nn.Dense(self.num_classes, kernel_init=nn.initializers.zeros)(fused)
            return (
                [branch_logits[:, i] for i in range(branch_logits.shape[1])] + [fused_logits],
                aux,
            )
        return l2_normalize(fused), aux
