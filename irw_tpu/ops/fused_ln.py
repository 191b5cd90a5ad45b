"""LayerNorm with a stat-free custom VJP (the round-4 profiler's secondary
movement class).

Evidence (`benchmarks/runs/profile_r4_vmem_b48.txt`, BASELINE.md round 4):
after the VMEM attention kernel removed the (N, N) tensors, ~9% of summed
device op time in the unfrozen flagship step is async copies of
``f32[bands, B, N]`` tensors — the LayerNorm mean/variance statistics.
flax's ``nn.LayerNorm`` lets autodiff pick the residuals, and XLA
schedules the recomputed stats of the remat'd backward far from their
consumers, spilling them to HBM and prefetching them back per block.

This implementation pins the residuals by hand: the custom VJP saves ONLY
``(x, scale)`` — ``x`` is the block input the scanned remat carry already
holds, so effectively nothing extra is materialised — and recomputes
mean/rstd *inside the backward fusion*, where they live and die in VMEM.
Statistics math follows flax exactly (f32 promotion, fast variance
``E[x²] − E[x]²``, eps inside rsqrt) so the swap is numerically neutral at
f32 and within bf16 round-off otherwise.

The module below reproduces ``nn.LayerNorm``'s parameter tree (``scale``,
``bias`` in f32) so checkpoints, the torch converter and the
tensor-parallel path rules (parallel/tp.py) apply unchanged.

Reference: the torch backbones' ``nn.LayerNorm`` blocks
(/root/reference/main/models/multi_dino_attention.py:601-639 and the
DINOv2 hub ViT); this file is a TPU-scheduling refinement, not new math.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from flax import linen as nn


def _stats(xf, eps):
    """f32 mean and rstd over the feature (last) axis — flax's
    ``use_fast_variance`` formula (E[x²] − E[x]², clamped at 0)."""
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    mu2 = jnp.mean(xf * xf, axis=-1, keepdims=True)
    var = jnp.maximum(mu2 - mu * mu, 0.0)
    return mu, jax.lax.rsqrt(var + eps)


def _ln_forward(x, scale, bias, eps, out_dtype):
    xf = x.astype(jnp.float32)
    mu, r = _stats(xf, eps)
    y = (xf - mu) * (r * scale.astype(jnp.float32)) + bias.astype(jnp.float32)
    return y.astype(out_dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_layernorm(x, scale, bias, eps=1e-6, out_dtype=None):
    """``LayerNorm(x) * scale + bias`` over the last axis, f32 statistics,
    with a backward that recomputes the statistics instead of saving them.

    ``out_dtype`` defaults to ``x.dtype`` (flax casts the result to the
    module dtype; callers pass it explicitly for the same behavior).
    """
    return _ln_forward(x, scale, bias, eps, out_dtype or x.dtype)


def _fused_ln_fwd(x, scale, bias, eps, out_dtype):
    # residuals: ONLY (x, scale).  x is the remat region's own input, so
    # under the scanned-block checkpoint it costs nothing extra; the f32
    # stat planes are never residuals and cannot be spilled across passes.
    return _ln_forward(x, scale, bias, eps, out_dtype or x.dtype), (x, scale)


def _fused_ln_bwd(eps, out_dtype, res, dy):
    x, scale = res
    xf = x.astype(jnp.float32)
    dyf = dy.astype(jnp.float32)
    mu, r = _stats(xf, eps)
    xhat = (xf - mu) * r
    # param grads reduce over every non-feature axis
    red = tuple(range(dyf.ndim - 1))
    dscale = jnp.sum(dyf * xhat, axis=red)
    dbias = jnp.sum(dyf, axis=red)
    dxhat = dyf * scale.astype(jnp.float32)
    dx = r * (
        dxhat
        - jnp.mean(dxhat, axis=-1, keepdims=True)
        - xhat * jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    )
    return dx.astype(x.dtype), dscale.astype(scale.dtype), dbias.astype(scale.dtype)


fused_layernorm.defvjp(_fused_ln_fwd, _fused_ln_bwd)


class FusedLayerNorm(nn.Module):
    """Drop-in for ``nn.LayerNorm`` (same param tree: ``scale``/``bias``
    in f32, same eps/dtype semantics) backed by ``fused_layernorm``.
    Instantiate with ``name="LayerNorm_0"`` where it replaces an anonymous
    flax child so checkpoint paths stay identical."""

    epsilon: float = 1e-6
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (dim,))
        bias = self.param("bias", nn.initializers.zeros, (dim,))
        out_dtype = self.dtype or x.dtype
        return fused_layernorm(x, scale, bias, self.epsilon, out_dtype)
