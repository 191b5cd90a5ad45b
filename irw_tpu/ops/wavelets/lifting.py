"""Vectorised lifting-scheme DWT in jnp (Haar and CDF-9/7).

Semantics match the reference's transform-pipeline wavelets
(``main/transforms/wavelets/haar.py:20-86``, ``cdf_97.py:33-133``,
``utils.py:241-460``):

- split even/odd samples along an axis, apply the lifting steps, concatenate
  [s; d] along that axis (rows pass then cols pass);
- the ±1 neighbour shifts use **zero (constant) padding** at the boundary
  (``utils.py:401-460``, PAD_MODE='constant');
- 1D normalisation multiplies s by √2 (Haar) / k=1.1496 (CDF-9/7) and divides
  d by the same;
- after the 2D pass the four subbands get the "v6" scales
  ``[1/2, 1, 1√, 2]`` → LL·0.5, LH·1, HL·1, HH·√2 (``utils.py:58-77``);
- subband arrangement in the spatial quad (``utils.py:376-390``):
  LL = top-left, LH = bottom-left (highpass along H), HL = top-right
  (highpass along W), HH = bottom-right.

All functions operate on arrays with trailing spatial dims ``(..., H, W)``
and arbitrary leading batch/channel dims, are jit-safe, differentiable, and
work in any float dtype (use f32 for parity tests; bf16 in the train step).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

SQRT2 = math.sqrt(2.0)

# "v6" 2D subband scales (reference utils.py:58-77): best source-range
# preservation for LL and consistent detail ranges.
COEFFS_SCALES_2D = (0.5, 1.0, 1.0, SQRT2)

# CDF-9/7 lifting coefficients (Getreuer / Daubechies-Sweldens factorisation)
CDF97_A1 = -1.58613432
CDF97_A2 = -0.05298011854
CDF97_A3 = 0.8829110762
CDF97_A4 = 0.4435068522
CDF97_K = 1.149604398


def _split_even_odd(x, axis: int):
    even = jax.lax.slice_in_dim(x, 0, None, stride=2, axis=axis)
    odd = jax.lax.slice_in_dim(x, 1, None, stride=2, axis=axis)
    return even, odd


def _interleave(even, odd, axis: int):
    """Inverse of _split_even_odd: stack along a new minor axis and reshape."""
    axis = axis % even.ndim
    stacked = jnp.stack([even, odd], axis=axis + 1)
    shape = list(even.shape)
    shape[axis] *= 2
    return stacked.reshape(shape)


def _shift_next(x, axis: int):
    """x[i] -> x[i+1] with zero pad at the end (reference pos_shift_4d)."""
    axis = axis % x.ndim
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, 1)
    return jnp.pad(jax.lax.slice_in_dim(x, 1, None, axis=axis), pad)


def _shift_prev(x, axis: int):
    """x[i] -> x[i-1] with zero pad at the start (reference neg_shift_4d)."""
    axis = axis % x.ndim
    pad = [(0, 0)] * x.ndim
    pad[axis] = (1, 0)
    return jnp.pad(jax.lax.slice_in_dim(x, 0, -1, axis=axis), pad)


# ---------------------------------------------------------------------------
# 1D lifting passes (return (s, d) halves, not yet concatenated)
# ---------------------------------------------------------------------------


def _haar_lift_1d(x, axis: int, scale: bool = True):
    even, odd = _split_even_odd(x, axis)
    d = odd - even
    s = even + 0.5 * d
    if scale:
        s = s * SQRT2
        d = d / SQRT2
    return s, d


def _haar_unlift_1d(s, d, axis: int, scale: bool = True):
    if scale:
        s = s / SQRT2
        d = d * SQRT2
    even = s - 0.5 * d
    odd = d + even
    return _interleave(even, odd, axis)


def _cdf97_lift_1d(x, axis: int, scale: bool = True):
    even, odd = _split_even_odd(x, axis)
    odd = odd + CDF97_A1 * (even + _shift_next(even, axis))
    even = even + CDF97_A2 * (_shift_prev(odd, axis) + odd)
    odd = odd + CDF97_A3 * (even + _shift_next(even, axis))
    even = even + CDF97_A4 * (_shift_prev(odd, axis) + odd)
    if scale:
        even = even * CDF97_K
        odd = odd / CDF97_K
    return even, odd


def _cdf97_unlift_1d(s, d, axis: int, scale: bool = True):
    if scale:
        s = s / CDF97_K
        d = d * CDF97_K
    even = s - CDF97_A4 * (_shift_prev(d, axis) + d)
    odd = d - CDF97_A3 * (even + _shift_next(even, axis))
    even = even - CDF97_A2 * (_shift_prev(odd, axis) + odd)
    odd = odd - CDF97_A1 * (even + _shift_next(even, axis))
    return _interleave(even, odd, axis)


_LIFT_1D = {"haar": _haar_lift_1d, "cdf97": _cdf97_lift_1d}
_UNLIFT_1D = {"haar": _haar_unlift_1d, "cdf97": _cdf97_unlift_1d}


def _register_families():
    """Make every declarative lifting family (lifting_families.py — the
    reference's 11 dead-code wavelets, revived) addressable as a basis."""
    from irw_tpu.ops.wavelets.lifting_families import (
        FAMILY_ALIASES,
        LIFTING_FAMILIES,
        family_lift_1d,
        family_unlift_1d,
    )

    def make(key):
        fam = LIFTING_FAMILIES[key]

        def lift(x, axis, scale=True):
            return family_lift_1d(x, axis, fam, scale)

        def unlift(s, d, axis, scale=True):
            return family_unlift_1d(s, d, axis, fam, scale)

        return lift, unlift

    for key in LIFTING_FAMILIES:
        _LIFT_1D[key], _UNLIFT_1D[key] = make(key)
    for alias, key in FAMILY_ALIASES.items():
        _LIFT_1D[alias], _UNLIFT_1D[alias] = _LIFT_1D[key], _UNLIFT_1D[key]


_register_families()


# ---------------------------------------------------------------------------
# 2D transforms
# ---------------------------------------------------------------------------


def _lifting_dwt2(x, basis: str, scales_2d=COEFFS_SCALES_2D):
    """One-level 2D lifting DWT on (..., H, W).  Returns (ll, lh, hl, hh),
    each (..., H/2, W/2)."""
    lift = _LIFT_1D[basis]
    # rows pass (along H): s/d halves
    low_h, high_h = lift(x, axis=-2)
    # cols pass (along W) on each half
    ll, hl = lift(low_h, axis=-1)
    lh, hh = lift(high_h, axis=-1)
    s0, s1, s2, s3 = scales_2d
    return ll * s0, lh * s1, hl * s2, hh * s3


def _lifting_idwt2(ll, lh, hl, hh, basis: str, scales_2d=COEFFS_SCALES_2D):
    unlift = _UNLIFT_1D[basis]
    s0, s1, s2, s3 = scales_2d
    ll, lh, hl, hh = ll / s0, lh / s1, hl / s2, hh / s3
    low_h = unlift(ll, hl, axis=-1)
    high_h = unlift(lh, hh, axis=-1)
    return unlift(low_h, high_h, axis=-2)


def _pad_to_multiple(x, multiple: int):
    """Zero-pad H and W up to a multiple (reference HaarLifting/Cdf97Lifting
    pad right/bottom, custom_transforms.py:20-23,42-45)."""
    h, w = x.shape[-2], x.shape[-1]
    pad_h = (multiple - h % multiple) % multiple
    pad_w = (multiple - w % multiple) % multiple
    if pad_h or pad_w:
        pad = [(0, 0)] * (x.ndim - 2) + [(0, pad_h), (0, pad_w)]
        x = jnp.pad(x, pad)
    return x


def haar_dwt2(x, scales_2d=COEFFS_SCALES_2D):
    """One-level Haar lifting DWT.  (..., H, W) → 4×(..., H/2, W/2)."""
    return _lifting_dwt2(_pad_to_multiple(x, 2), "haar", scales_2d)


def haar_idwt2(ll, lh, hl, hh, scales_2d=COEFFS_SCALES_2D):
    return _lifting_idwt2(ll, lh, hl, hh, "haar", scales_2d)


def cdf97_dwt2(x, scales_2d=COEFFS_SCALES_2D):
    """One-level CDF-9/7 lifting DWT (reference pads to a multiple of 4)."""
    return _lifting_dwt2(_pad_to_multiple(x, 4), "cdf97", scales_2d)


def cdf97_idwt2(ll, lh, hl, hh, scales_2d=COEFFS_SCALES_2D):
    return _lifting_idwt2(ll, lh, hl, hh, "cdf97", scales_2d)


_DWT2 = {"haar": haar_dwt2, "cdf97": cdf97_dwt2}
_IDWT2 = {"haar": haar_idwt2, "cdf97": cdf97_idwt2}


def _register_family_2d():
    from irw_tpu.ops.wavelets.lifting_families import FAMILY_ALIASES, LIFTING_FAMILIES

    def make(key):
        def fwd(x, scales_2d=COEFFS_SCALES_2D):
            return _lifting_dwt2(_pad_to_multiple(x, 2), key, scales_2d)

        def inv(ll, lh, hl, hh, scales_2d=COEFFS_SCALES_2D):
            return _lifting_idwt2(ll, lh, hl, hh, key, scales_2d)

        return fwd, inv

    for key in LIFTING_FAMILIES:
        _DWT2[key], _IDWT2[key] = make(key)
    for alias, key in FAMILY_ALIASES.items():
        _DWT2[alias], _IDWT2[alias] = _DWT2[key], _IDWT2[key]


_register_family_2d()


def lifting_dwt2(x, basis: str = "haar", scales_2d=COEFFS_SCALES_2D):
    """One-level 2D lifting DWT for any registered basis (haar, cdf97, and
    the 11 revived reference families).  (..., H, W) → 4×(..., H/2, W/2)."""
    if basis not in _DWT2:
        raise ValueError(f"unknown lifting basis {basis!r}; one of {sorted(_DWT2)}")
    return _DWT2[basis](x, scales_2d)


def lifting_idwt2(ll, lh, hl, hh, basis: str = "haar", scales_2d=COEFFS_SCALES_2D):
    """Inverse of :func:`lifting_dwt2`."""
    if basis not in _IDWT2:
        raise ValueError(f"unknown lifting basis {basis!r}; one of {sorted(_IDWT2)}")
    return _IDWT2[basis](ll, lh, hl, hh, scales_2d)


@partial(jax.jit, static_argnames=("levels", "basis"))
def lifting_decompose(x, levels: int = 1, basis: str = "haar"):
    """Multi-level lifting decomposition, recursing on LL (reference
    HaarLifting.forward, custom_transforms.py:48-55).

    Args:
      x: (..., H, W).
    Returns:
      (approx, details): lists of per-level LL arrays and (lh, hl, hh)
      tuples, coarsest last.
    """
    approx, details = [], []
    for _ in range(levels):
        ll, lh, hl, hh = _DWT2[basis](x)
        approx.append(ll)
        details.append((lh, hl, hh))
        x = ll
    return approx, details


def subband_stack(images, levels: int = 1, basis: str = "haar", ll_only: bool = False):
    """The `CustomTransform` equivalent (custom_transforms.py:90-117), batched
    and on-device.

    Args:
      images: (B, H, W, C) float array (NHWC — the TPU-native layout; the
        reference uses per-sample CHW on CPU).
      levels: decomposition depth; output carries the **coarsest** level only
        (the reference's coarse_only=True default).
      ll_only: return just the LL band, shape (B, H/2ˡ, W/2ˡ, C).

    Returns:
      (B, 4, H/2ˡ, W/2ˡ, C) subband stack ordered [LL, LH, HL, HH], so that
      ``out[:, s]`` is an NHWC image per band — ready for per-band backbones.
    """
    x = jnp.moveaxis(images, -1, 1)  # (B, C, H, W)
    approx, details = lifting_decompose(x, levels=levels, basis=basis)
    ll = approx[-1]
    if ll_only:
        return jnp.moveaxis(ll, 1, -1)
    lh, hl, hh = details[-1]
    stack = jnp.stack([ll, lh, hl, hh], axis=1)  # (B, 4, C, h, w)
    return jnp.moveaxis(stack, 2, -1)  # (B, 4, h, w, C)
