"""DenseNet in flax (NHWC) — the detail-branch trunk of HybridMultiBranch
(reference: mtwavenet.py:420-520 pairs ResNet50 on LL with DenseNet121 on
the detail bands; torchvision densenet121 = growth 32, blocks (6,12,24,16)).
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp


class DenseLayer(nn.Module):
    growth_rate: int
    bn_size: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, frozen_bn: bool = False):
        use_ra = (not train) or frozen_bn
        norm = partial(nn.BatchNorm, use_running_average=use_ra, momentum=0.9, dtype=self.dtype)
        y = norm()(x)
        y = nn.relu(y)
        y = nn.Conv(self.bn_size * self.growth_rate, (1, 1), use_bias=False, dtype=self.dtype)(y)
        y = norm()(y)
        y = nn.relu(y)
        y = nn.Conv(self.growth_rate, (3, 3), padding=1, use_bias=False, dtype=self.dtype)(y)
        return jnp.concatenate([x, y], axis=-1)


class Transition(nn.Module):
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, frozen_bn: bool = False):
        use_ra = (not train) or frozen_bn
        x = nn.BatchNorm(use_running_average=use_ra, momentum=0.9, dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.Conv(self.out_channels, (1, 1), use_bias=False, dtype=self.dtype)(x)
        return nn.avg_pool(x, (2, 2), strides=(2, 2))


class DenseNet(nn.Module):
    block_sizes: Sequence[int] = (6, 12, 24, 16)
    growth_rate: int = 32
    init_features: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, frozen_bn: bool = False):
        use_ra = (not train) or frozen_bn
        x = nn.Conv(self.init_features, (7, 7), strides=(2, 2), padding=3,
                    use_bias=False, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=use_ra, momentum=0.9, dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        channels = self.init_features
        for block_idx, n_layers in enumerate(self.block_sizes):
            for _ in range(n_layers):
                x = DenseLayer(self.growth_rate, dtype=self.dtype)(
                    x, train=train, frozen_bn=frozen_bn
                )
                channels += self.growth_rate
            if block_idx < len(self.block_sizes) - 1:
                channels //= 2
                x = Transition(channels, dtype=self.dtype)(x, train=train, frozen_bn=frozen_bn)
        x = nn.BatchNorm(use_running_average=use_ra, momentum=0.9, dtype=self.dtype)(x)
        x = nn.relu(x)
        return x.mean(axis=(1, 2))  # (B, 1024) for densenet121


def densenet121(**kw) -> DenseNet:
    return DenseNet(block_sizes=(6, 12, 24, 16), **kw)


DENSENET_FEATURE_DIMS = {"densenet121": 1024}
