"""Shared building blocks: pooling, projection heads, norm helpers.

Reference equivalents: ``main/models/create_projection_head.py`` and the
pooling/standardize plumbing of ``RetrievalNet`` (net.py:450-471).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

trunc_normal_init = nn.initializers.truncated_normal(stddev=0.02)


def l2_normalize(x, axis=-1, eps=1e-12):
    return x / jnp.sqrt(jnp.sum(x * x, axis=axis, keepdims=True) + eps)


def global_pool(x, pool: str = "avg"):
    """Pool (B, H, W, C) spatial features → (B, C).

    'default'/'avg' = mean, 'max' = max, 'avg_max' = mean of both
    (FourBranchResNet50's double pool, mtwavenet.py:300-320), 'none' = flatten.
    """
    if pool in ("avg", "default"):
        return x.mean(axis=(-3, -2))
    if pool == "max":
        return x.max(axis=(-3, -2))
    if pool == "avg_max":
        return 0.5 * (x.mean(axis=(-3, -2)) + x.max(axis=(-3, -2)))
    if pool == "none":
        return x.reshape(x.shape[0], -1)
    raise ValueError(f"unknown pool {pool!r}")


class QuantDense(nn.Module):
    """Drop-in Dense with an int8 dynamically-quantized matmul
    (ops/quant.py).  Same param leaves (kernel/bias, float, lecun-normal)
    as ``nn.Dense`` — instantiate with the explicit auto-name
    (``name="Dense_0"``) to keep an existing param tree bit-identical.
    Inference-only: the round() in the quantizer has zero gradient.
    """

    features: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from irw_tpu.ops.quant import quant_dense_apply

        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (x.shape[-1], self.features))
        bias = (self.param("bias", nn.initializers.zeros, (self.features,))
                if self.use_bias else None)
        return quant_dense_apply(x.astype(self.dtype), kernel, bias,
                                 out_dtype=self.dtype)


class Mlp(nn.Module):
    """Transformer MLP: Linear → GELU → Linear → Dropout.

    GELU flavor: the tanh approximation by default (2.6× faster on the TPU
    VPU, measured; activation diff ~1e-3); ``exact_gelu=True`` switches to
    the erf form torch nn.GELU()/DINOv2 compute — needed for bit-parity
    with converted torch weights (tests/test_converter_numeric.py).

    ``quant_int8=True`` routes both matmuls through the int8 MXU path
    (ops/quant.py) with the identical param tree — serving only.
    """

    hidden_dim: int
    out_dim: int
    dropout: float = 0.0
    exact_gelu: bool = False
    quant_int8: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        from jax.ad_checkpoint import checkpoint_name

        if self.quant_int8:
            dense = lambda feats, name: QuantDense(  # noqa: E731
                feats, dtype=self.dtype, name=name)
        else:
            dense = lambda feats, name: nn.Dense(  # noqa: E731
                feats, dtype=self.dtype, name=name)
        x = dense(self.hidden_dim, "Dense_0")(x)
        x = nn.gelu(x, approximate=not self.exact_gelu)
        # name the activation so selective-remat policies can pin it
        # (vit.py "dots_no_batch_gelu": the transcendental is the costly
        # part of the elementwise recompute chain); identity outside remat
        x = checkpoint_name(x, "mlp_act")
        x = dense(self.out_dim, "Dense_1")(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return x


class ProjectionHead(nn.Module):
    """Linear or MLP projection head with optional bn/ln between layers
    (create_projection_head.py:6-33)."""

    dims: Sequence[int]
    norm: str | None = None  # None | 'bn' | 'ln'
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i, dim in enumerate(self.dims):
            x = nn.Dense(dim, dtype=self.dtype)(x)
            if i < len(self.dims) - 1:
                if self.norm == "bn":
                    x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(x)
                elif self.norm == "ln":
                    x = nn.LayerNorm(dtype=self.dtype)(x)
                x = nn.relu(x)
        return x


class HashHead(nn.Module):
    """Linear hash projection + BatchNorm1d bit centering, the shared tail of
    every hashing model (multi_dino_attention.py:430-439, dino_baseline.py).

    ``use_bn=False`` swaps BN for a zero-init bias, like the reference's
    ``bias=not use_bn`` + zeros_ init.
    """

    nbits: int
    use_bn: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Dense(
            self.nbits,
            use_bias=not self.use_bn,
            kernel_init=nn.initializers.normal(stddev=0.01),
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
        )(x)
        if self.use_bn:
            x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(x)
        return x


def binarize(logits, train: bool, continuous: str = "identity"):
    """Hashing output routing: continuous relaxation in train (identity or
    tanh, model-dependent), sign codes in eval (multi_dino_attention.py:449,487)."""
    if train:
        return jnp.tanh(logits) if continuous == "tanh" else logits
    return jnp.sign(logits)
