"""ConvNeXt in flax (NHWC) — the timm convnext backbone of net.py:322-334.

Standard ConvNeXt-T/S blocks: 7×7 depthwise conv → LayerNorm → pointwise
MLP (4×) with GELU → LayerScale; patchify stem, LN-conv downsampling.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp


class ConvNeXtBlock(nn.Module):
    dim: int
    layerscale_init: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(
            self.dim, (7, 7), padding=3, feature_group_count=self.dim, dtype=self.dtype
        )(x)
        y = nn.LayerNorm(dtype=self.dtype)(y)
        y = nn.Dense(4 * self.dim, dtype=self.dtype)(y)
        y = nn.gelu(y)
        y = nn.Dense(self.dim, dtype=self.dtype)(y)
        gamma = self.param("gamma", nn.initializers.constant(self.layerscale_init), (self.dim,))
        return x + y * gamma


class ConvNeXt(nn.Module):
    depths: Sequence[int] = (3, 3, 9, 3)
    dims: Sequence[int] = (96, 192, 384, 768)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # patchify stem: 4×4 stride-4 conv + LN
        x = nn.Conv(self.dims[0], (4, 4), strides=(4, 4), dtype=self.dtype)(x)
        x = nn.LayerNorm(dtype=self.dtype)(x)
        for stage, (depth, dim) in enumerate(zip(self.depths, self.dims)):
            if stage > 0:
                x = nn.LayerNorm(dtype=self.dtype)(x)
                x = nn.Conv(dim, (2, 2), strides=(2, 2), dtype=self.dtype)(x)
            for _ in range(depth):
                x = ConvNeXtBlock(dim, dtype=self.dtype)(x)
        x = x.mean(axis=(1, 2))
        x = nn.LayerNorm(dtype=self.dtype)(x)
        return x


def convnext_tiny(**kw) -> ConvNeXt:
    return ConvNeXt(depths=(3, 3, 9, 3), dims=(96, 192, 384, 768), **kw)


def convnext_small(**kw) -> ConvNeXt:
    return ConvNeXt(depths=(3, 3, 27, 3), dims=(96, 192, 384, 768), **kw)
