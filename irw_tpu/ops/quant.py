"""Int8 post-training quantization primitives for the serving path.

TPU v5e executes int8×int8→int32 matmuls on the MXU at 2× the bf16 peak
(394 vs 197 TOPS), so a weights+activations int8 forward raises the
inference throughput ceiling without touching the checkpoint format.

Design (chosen for the MXU + XLA, not ported from anywhere — the reference
repo has no quantization support at all):

- **Weights**: symmetric per-output-channel int8, quantized **on the fly**
  from the unchanged float param tree inside the jitted forward.  The
  per-call requantization streams the (small) weight tensors once —
  ~0.4 ms for all four flagship ViTs at 819 GB/s — and in exchange the
  param tree, checkpoints, torch converter, and tensor-parallel specs all
  apply unchanged.  (Weights are NOT closed over / pre-baked: the axon
  remote-compile service rejects large constant-carrying programs, see
  CLAUDE.md.)
- **Activations**: dynamic symmetric per-token (last-axis) int8.  The amax
  reduction + scale division fuse into the surrounding elementwise chain;
  no calibration pass or data is needed, which matters because serving
  feeds arbitrary domains.
- **Accumulation**: int32 via ``preferred_element_type`` —
  ``lax.dot_general`` lowers to the MXU's native int8 path; the dequant
  multiply (x_scale ⊗ w_scale) happens in the compute dtype.

Attention cores (QKᵀ softmax AV), layernorms, GELU, residuals stay in the
float compute dtype: they are VPU-bound and quantizing them buys nothing.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

_INT8_MAX = 127.0
_EPS = 1e-8


def quantize_symmetric(x, reduce_axes, dtype=jnp.float32):
    """Symmetric int8 quantization along ``reduce_axes``.

    Returns ``(q, scale)`` with ``q ∈ [-127, 127]`` int8 and ``scale`` the
    per-group dequant factor (shape = x.shape with reduce_axes collapsed to
    1) such that ``q * scale ≈ x``.
    """
    amax = jnp.max(jnp.abs(x), axis=reduce_axes, keepdims=True)
    scale = (amax / _INT8_MAX + _EPS).astype(dtype)
    q = jnp.clip(jnp.round(x / scale), -_INT8_MAX, _INT8_MAX).astype(jnp.int8)
    return q, scale


def int8_dot(x, kernel, out_dtype=None):
    """``x @ kernel`` through the MXU int8 path with dynamic quantization.

    ``x``: (..., K) float; quantized per-token (over K).
    ``kernel``: (K, N) float; quantized per-output-channel (over K).
    Returns (..., N) in ``out_dtype`` (default: x.dtype).
    """
    out_dtype = out_dtype or x.dtype
    xq, xs = quantize_symmetric(x, reduce_axes=(-1,))
    wq, ws = quantize_symmetric(kernel, reduce_axes=(0,))
    acc = lax.dot_general(
        xq, wq,
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return (acc.astype(out_dtype) * (xs * ws).astype(out_dtype))


def quant_dense_apply(x, kernel, bias=None, out_dtype=None):
    """Quantized replacement for a Dense apply on a float param leaf.

    ``kernel`` may be DenseGeneral-shaped, e.g. (K, H, hd) or (H, hd, N):
    pass it pre-reshaped to 2-D (K, N) by the caller; this helper handles
    only the canonical matmul + bias.
    """
    out = int8_dot(x, kernel, out_dtype=out_dtype)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out
