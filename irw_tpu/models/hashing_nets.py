"""Single-trunk CE/hashing ResNets (reference: main/models/resnet_ce.py).

- ``ResNetCE`` (:10): CE-logits in train / L2-normalised embedding in eval,
  zero-init classifier, frozen-BN protocol.
- ``ResNetHashing`` (:47): tanh in train / sign in eval.
- ``ResNetHashingAlpha`` (:81): HashNet continuation tanh(α·x); α is an
  explicit input (``alpha``) stepped by the engine's epoch schedule instead
  of mutable module state (resnet_ce.py:188-192).
- ``ResNet50DSCH`` (:100): the DSCH trunk — n_bits fc, optional double pool
  / layernorm / L2-normalise.
- ``ResNet50Mod`` (:180): tanh(α·fc) DSCH wrapper.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from irw_tpu.models.layers import global_pool, l2_normalize
from irw_tpu.models.resnet import ResNet, Bottleneck, BasicBlock


def _trunk(depth: int, dtype):
    if depth == 18:
        return ResNet(stage_sizes=(2, 2, 2, 2), block=BasicBlock, dtype=dtype)
    if depth == 101:
        return ResNet(stage_sizes=(3, 4, 23, 3), block=Bottleneck, dtype=dtype)
    return ResNet(stage_sizes=(3, 4, 6, 3), block=Bottleneck, dtype=dtype)


class ResNetCE(nn.Module):
    num_classes: int = 100
    depth: int = 50
    frozen_bn: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = _trunk(self.depth, self.dtype)(x, train=train, frozen_bn=self.frozen_bn)
        aux = {"ortho_loss": jnp.float32(0.0)}
        if train:
            logits = nn.Dense(
                self.num_classes,
                kernel_init=nn.initializers.zeros,
                bias_init=nn.initializers.zeros,
            )(feats)
            return logits, aux
        return l2_normalize(feats), aux


class ResNetHashing(nn.Module):
    """tanh(fc) in train / sign in eval (resnet_ce.py:47-79); pass ``alpha``
    for the HashNet continuation variant (ResNetHashingAlpha)."""

    nbits: int = 64
    depth: int = 50
    frozen_bn: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, alpha: float = 1.0):
        feats = _trunk(self.depth, self.dtype)(x, train=train, frozen_bn=self.frozen_bn)
        codes = nn.Dense(self.nbits, kernel_init=nn.initializers.normal(0.01))(feats)
        aux = {"ortho_loss": jnp.float32(0.0)}
        if train:
            return jnp.tanh(alpha * codes), aux
        return jnp.sign(codes), aux


def ResNetHashingAlpha(**kw) -> ResNetHashing:
    return ResNetHashing(**kw)


class ResNet50DSCH(nn.Module):
    """resnet_ce.py:100-178 — DSCH trunk: fc to n_bits with optional double
    pooling (avg+max), LayerNorm and L2-normalisation."""

    n_bits: int = 64
    double_pool: bool = False
    use_layernorm: bool = False
    normalize: bool = False
    frozen_bn: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, alpha: float = 1.0):
        trunk = ResNet(stage_sizes=(3, 4, 6, 3), block=Bottleneck, dtype=self.dtype)
        fmap = trunk(x, train=train, frozen_bn=self.frozen_bn, return_stages=True)[-1]
        feats = global_pool(fmap, "avg_max" if self.double_pool else "avg")
        if self.use_layernorm:
            feats = nn.LayerNorm()(feats)
        codes = nn.Dense(self.n_bits)(feats)
        if self.normalize:
            codes = l2_normalize(codes)
        return codes, {"ortho_loss": jnp.float32(0.0)}


class ResNet50Mod(nn.Module):
    """resnet_ce.py:180-198 — DSCH tanh(α·x) wrapper; α comes in as an input
    and is stepped per epoch by the engine (the ``epoch_step`` continuation)."""

    n_bits: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, alpha: float = 1.0):
        codes, aux = ResNet50DSCH(n_bits=self.n_bits, dtype=self.dtype)(
            x, train=train
        )
        if train:
            return jnp.tanh(alpha * codes), aux
        return jnp.sign(codes), aux
