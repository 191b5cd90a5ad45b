"""ResNet family in flax (NHWC), the conv backbone for the wavelet-branch
models (reference: torchvision resnet18/50/101 used throughout
main/models/net.py:21-38, wresnet.py, mtwavenet.py).

TPU notes: NHWC layout, bf16-capable via ``dtype``; ``frozen_bn`` pins the
batch-norm statistics (the Boudiaf-protocol freeze the reference applies via
``train()`` overrides, mtwavenet.py:357-365, resnet_ce.py:39-45) — here it's
a constructor flag rather than runtime monkey-patching.

``stem_kernel=1`` reproduces the 1×1-conv stem surgery WaveResNet applies so
half-resolution subbands keep spatial extent (wresnet.py:260-261).
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp


class BasicBlock(nn.Module):
    filters: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, frozen_bn: bool = False):
        use_ra = (not train) or frozen_bn
        norm = partial(nn.BatchNorm, use_running_average=use_ra, momentum=0.9, dtype=self.dtype)
        conv = partial(nn.Conv, use_bias=False, dtype=self.dtype)

        residual = x
        y = conv(self.filters, (3, 3), strides=(self.stride, self.stride), padding=1)(x)
        y = norm()(y)
        y = nn.relu(y)
        y = conv(self.filters, (3, 3), padding=1)(y)
        y = norm()(y)
        if residual.shape != y.shape:
            residual = conv(self.filters, (1, 1), strides=(self.stride, self.stride))(x)
            residual = norm()(residual)
        return nn.relu(y + residual)


class Bottleneck(nn.Module):
    filters: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, frozen_bn: bool = False):
        use_ra = (not train) or frozen_bn
        norm = partial(nn.BatchNorm, use_running_average=use_ra, momentum=0.9, dtype=self.dtype)
        conv = partial(nn.Conv, use_bias=False, dtype=self.dtype)

        residual = x
        y = conv(self.filters, (1, 1))(x)
        y = norm()(y)
        y = nn.relu(y)
        y = conv(self.filters, (3, 3), strides=(self.stride, self.stride), padding=1)(y)
        y = norm()(y)
        y = nn.relu(y)
        y = conv(self.filters * 4, (1, 1))(y)
        y = norm()(y)
        if residual.shape != y.shape:
            residual = conv(self.filters * 4, (1, 1), strides=(self.stride, self.stride))(x)
            residual = norm()(residual)
        return nn.relu(y + residual)


class ResNet(nn.Module):
    """Stage-structured ResNet; ``__call__`` returns pooled features by
    default, or all per-stage feature maps with ``return_stages=True`` (used
    by FourBranchResNet's stage-interleaved cross-band attention)."""

    stage_sizes: Sequence[int]
    block: type = Bottleneck
    width: int = 64
    stem_kernel: int = 7
    stem_stride: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, frozen_bn: bool = False, return_stages: bool = False):
        conv = partial(nn.Conv, use_bias=False, dtype=self.dtype)
        use_ra = (not train) or frozen_bn
        pad = self.stem_kernel // 2
        x = conv(
            self.width,
            (self.stem_kernel, self.stem_kernel),
            strides=(self.stem_stride, self.stem_stride),
            padding=pad,
        )(x)
        x = nn.BatchNorm(use_running_average=use_ra, momentum=0.9, dtype=self.dtype)(x)
        x = nn.relu(x)
        if self.stem_kernel > 1:
            x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        stages = []
        for stage_idx, num_blocks in enumerate(self.stage_sizes):
            for block_idx in range(num_blocks):
                stride = 2 if stage_idx > 0 and block_idx == 0 else 1
                x = self.block(
                    filters=self.width * 2**stage_idx, stride=stride, dtype=self.dtype
                )(x, train=train, frozen_bn=frozen_bn)
            stages.append(x)
        if return_stages:
            return stages
        return x.mean(axis=(1, 2))  # global average pool → (B, C)


def resnet18(**kw) -> ResNet:
    return ResNet(stage_sizes=(2, 2, 2, 2), block=BasicBlock, **kw)


def resnet34(**kw) -> ResNet:
    return ResNet(stage_sizes=(3, 4, 6, 3), block=BasicBlock, **kw)


def resnet50(**kw) -> ResNet:
    return ResNet(stage_sizes=(3, 4, 6, 3), block=Bottleneck, **kw)


def resnet101(**kw) -> ResNet:
    return ResNet(stage_sizes=(3, 4, 23, 3), block=Bottleneck, **kw)


RESNET_FEATURE_DIMS = {
    "resnet18": 512,
    "resnet34": 512,
    "resnet50": 2048,
    "resnet101": 2048,
}
