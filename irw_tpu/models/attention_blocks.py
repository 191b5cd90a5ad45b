"""Subband attention/gating blocks: CBAM, ECA, cross-band stage attention.

Reference equivalents: wresnet.py:110-251 (ChannelGate/CBAM/Eca1D over the
(B, S, D) branch-embedding stack — note those gates return the gate-weighted
*mean over subbands*, i.e. they fuse), mtwavenet.py:9-147 (ChannelGate1D,
FusionModule, CrossBandAttention applied after every ResNet stage).

All blocks take the stacked layout (B, S, ...) and expose their gate values
through the aux dict so the alpha-inspection CLI (alpha_weights.py) has an
explicit channel instead of a hook.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class SubbandChannelGate(nn.Module):
    """Gate over the subband axis of (B, S, D): avg+max pool over D, shared
    MLP, sigmoid → returns the gate-weighted mean over subbands (B, D)
    (wresnet.py ChannelGate.forward:121-144)."""

    num_subbands: int = 4
    reduction_ratio: int = 1
    pool_types: tuple = ("avg", "max")
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        mlp = nn.Sequential(
            [
                nn.Dense(self.num_subbands // self.reduction_ratio, dtype=self.dtype),
                nn.relu,
                nn.Dense(self.num_subbands, dtype=self.dtype),
            ]
        )
        att = 0.0
        for pool in self.pool_types:
            pooled = x.mean(axis=-1) if pool == "avg" else x.max(axis=-1)
            att = att + mlp(pooled)
        scale = nn.sigmoid(att)  # (B, S)
        fused = jnp.einsum("bsd,bs->bd", x, scale) / self.num_subbands
        return fused, scale


class SubbandEca(nn.Module):
    """ECA variant: 1D conv over the subband-gate vector instead of an MLP
    (wresnet.py Eca1D_layer:214-239).  Same weighted-mean fusion output."""

    num_subbands: int = 4
    kernel_size: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = x.mean(axis=-1)  # (B, S)
        y = nn.Conv(
            1, (self.kernel_size,), padding="SAME", use_bias=False, dtype=self.dtype
        )(y[..., None])[..., 0]
        scale = nn.sigmoid(y)
        fused = jnp.einsum("bsd,bs->bd", x, scale) / self.num_subbands
        return fused, scale


class SubbandCBAM(nn.Module):
    """CBAM over the branch-embedding stack; `no_spatial=True` is the only
    configuration the reference instantiates (wresnet.py:197-208)."""

    num_subbands: int = 4
    reduction_ratio: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return SubbandChannelGate(
            num_subbands=self.num_subbands,
            reduction_ratio=self.reduction_ratio,
            dtype=self.dtype,
        )(x)


SUBBAND_GATES = {"cbam": SubbandCBAM, "eca": SubbandEca, "channel": SubbandChannelGate}


class ChannelGate1D(nn.Module):
    """mtwavenet.py:9-40 — same weighted sum but WITHOUT the /S division."""

    num_subbands: int = 4
    reduction_ratio: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        mlp = nn.Sequential(
            [
                nn.Dense(self.num_subbands // self.reduction_ratio, dtype=self.dtype),
                nn.relu,
                nn.Dense(self.num_subbands, dtype=self.dtype),
            ]
        )
        att = mlp(x.mean(axis=-1)) + mlp(x.max(axis=-1))
        scale = nn.sigmoid(att)
        fused = jnp.einsum("bsd,bs->bd", x, scale)
        return fused, scale


class CrossBandAttention(nn.Module):
    """Stage-level cross-band channel gate (mtwavenet.py:123-147).

    Input (B, S, H, W, C) — NHWC per band.  Channel attention is computed
    over the concatenated S·C channels (avg+max global pool → MLP → sigmoid)
    and multiplies the features; optional 7×7 spatial gate.
    Returns the gated (B, S, H, W, C) stack + the (B, S·C) alphas.
    """

    reduction_ratio: int = 1
    no_spatial: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, s, h, w, c = x.shape
        flat = jnp.moveaxis(x, 1, -2).reshape(b, h, w, s * c)  # (B,H,W,S*C)
        mlp = nn.Sequential(
            [
                nn.Dense(s * c // self.reduction_ratio, dtype=self.dtype),
                nn.relu,
                nn.Dense(s * c, dtype=self.dtype),
            ]
        )
        att = mlp(flat.mean(axis=(1, 2))) + mlp(flat.max(axis=(1, 2)))
        scale = nn.sigmoid(att)  # (B, S*C)
        out = flat * scale[:, None, None, :]
        if not self.no_spatial:
            pooled = jnp.concatenate(
                [out.max(axis=-1, keepdims=True), out.mean(axis=-1, keepdims=True)],
                axis=-1,
            )
            spatial = nn.Conv(1, (7, 7), padding="SAME", use_bias=False, dtype=self.dtype)(
                pooled
            )
            spatial = nn.BatchNorm(use_running_average=True, dtype=self.dtype)(spatial)
            out = out * nn.sigmoid(spatial)
        out = jnp.moveaxis(out.reshape(b, h, w, s, c), 3, 1)
        return out, scale
