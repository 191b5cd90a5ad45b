"""Fused Pallas TPU kernel for the multi-level Haar lifting DWT.

This is the hot data-path op: the reference computed it per-sample on CPU
loader workers (SURVEY §3.1 ★HOT); here a whole batch is transformed in one
kernel launch with a single HBM→VMEM→HBM round trip for *all* levels —
XLA's fusion would otherwise materialise each level.

Layout strategy: W rides the lane dimension, H the sublanes.  The even/odd
lifting split along H is a free sublane reshape ``(H, W) → (H/2, 2, W)``;
the split along W is done by transposing the two minor dims (a cheap VMEM
register shuffle) and reusing the sublane path.  All lifting algebra matches
:mod:`irw_tpu.ops.wavelets.lifting` (√2 1D normalisation + v6 2D scales),
so the kernel is drop-in for the jnp path and is tested against it.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SQRT2 = math.sqrt(2.0)
V6 = (0.5, 1.0, 1.0, SQRT2)


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


# CDF-9/7 lifting coefficients (Getreuer factorisation, cdf_97.py:14-27)
CDF97_A1 = -1.58613432
CDF97_A2 = -0.05298011854
CDF97_A3 = 0.8829110762
CDF97_A4 = 0.4435068522
CDF97_K = 1.149604398


def _pair_lift_sublane(x):
    """Haar lifting along axis -2 (must be even): (..., 2M, W) → s, d each
    (..., M, W)."""
    *lead, h, w = x.shape
    xr = x.reshape(*lead, h // 2, 2, w)
    even = xr[..., 0, :]
    odd = xr[..., 1, :]
    d = odd - even
    s = even + 0.5 * d
    return s * SQRT2, d / SQRT2


def _shift_next_sublane(v):
    """v[i] → v[i+1] along axis -2, zero pad at the end (pos_shift_4d)."""
    zeros = jnp.zeros_like(v[..., :1, :])
    return jnp.concatenate([v[..., 1:, :], zeros], axis=-2)


def _shift_prev_sublane(v):
    """v[i] → v[i−1] along axis -2, zero pad at the start (neg_shift_4d)."""
    zeros = jnp.zeros_like(v[..., :1, :])
    return jnp.concatenate([zeros, v[..., :-1, :]], axis=-2)


def _cdf97_pair_lift_sublane(x):
    """CDF-9/7 lifting along axis -2: the 4 lifting steps with zero-padded
    ±1 neighbour shifts (cdf_97.py:33-73)."""
    *lead, h, w = x.shape
    xr = x.reshape(*lead, h // 2, 2, w)
    even = xr[..., 0, :]
    odd = xr[..., 1, :]
    odd = odd + CDF97_A1 * (even + _shift_next_sublane(even))
    even = even + CDF97_A2 * (_shift_prev_sublane(odd) + odd)
    odd = odd + CDF97_A3 * (even + _shift_next_sublane(even))
    even = even + CDF97_A4 * (_shift_prev_sublane(odd) + odd)
    return even * CDF97_K, odd / CDF97_K


def _shift_sublane(v, n: int):
    """v[i] → v[i+n] along axis -2, zero-padded (generalised ±n shift)."""
    if n == 0:
        return v
    zeros = jnp.zeros_like(v[..., : abs(n), :])
    if n > 0:
        return jnp.concatenate([v[..., n:, :], zeros], axis=-2)
    return jnp.concatenate([zeros, v[..., :n, :]], axis=-2)


def _make_family_pair_lift(family):
    """Sublane pair-lift for a declarative lifting family
    (lifting_families.py): same algebra as family_lift_1d, expressed on the
    (..., M, 2, W) even/odd register layout."""
    steps, k = family

    def lift(x):
        *lead, h, w = x.shape
        xr = x.reshape(*lead, h // 2, 2, w)
        even = xr[..., 0, :]
        odd = xr[..., 1, :]
        for target, taps in steps:
            src = odd if target == "even" else even
            acc = None
            for shift, coeff in taps:
                term = coeff * _shift_sublane(src, shift)
                acc = term if acc is None else acc + term
            if target == "even":
                even = even + acc
            else:
                odd = odd + acc
        return even * k, odd / k

    return lift


_LIFTS = {"haar": _pair_lift_sublane, "cdf97": _cdf97_pair_lift_sublane}


def _register_family_lifts():
    from irw_tpu.ops.wavelets.lifting_families import (
        FAMILY_ALIASES,
        LIFTING_FAMILIES,
    )

    for name, family in LIFTING_FAMILIES.items():
        _LIFTS[name] = _make_family_pair_lift(family)
    for alias, name in FAMILY_ALIASES.items():
        _LIFTS[alias] = _LIFTS[name]


_register_family_lifts()


def _lift_level(x, basis: str):
    """One 2D lifting level on (..., H, W) → (ll, lh, hl, hh)."""
    lift = _LIFTS[basis]
    s, d = lift(x)  # rows pass
    s_t = jnp.swapaxes(s, -1, -2)
    d_t = jnp.swapaxes(d, -1, -2)
    ll_t, hl_t = lift(s_t)  # cols pass on transposed minors
    lh_t, hh_t = lift(d_t)
    ll = jnp.swapaxes(ll_t, -1, -2)
    hl = jnp.swapaxes(hl_t, -1, -2)
    lh = jnp.swapaxes(lh_t, -1, -2)
    hh = jnp.swapaxes(hh_t, -1, -2)
    return ll * V6[0], lh * V6[1], hl * V6[2], hh * V6[3]


def _haar_level(x):
    return _lift_level(x, "haar")


def _dwt_kernel(levels: int, basis: str, x_ref, out_ref):
    x = x_ref[...]
    for lvl in range(levels):
        ll, lh, hl, hh = _lift_level(x, basis)
        if lvl < levels - 1:
            # recurse on the scaled LL, like HaarLifting.forward
            # (custom_transforms.py:48-55) recursing on fast_haar_2d_op output
            x = ll
    out_ref[:, 0] = ll
    out_ref[:, 1] = lh
    out_ref[:, 2] = hl
    out_ref[:, 3] = hh


def _haar_kernel(levels: int, x_ref, out_ref):
    _dwt_kernel(levels, "haar", x_ref, out_ref)


@functools.partial(jax.jit, static_argnames=("levels", "basis", "tile_n", "interpret"))
def lifting_multi_level_pallas(
    x,
    levels: int = 1,
    basis: str = "haar",
    tile_n: int | None = None,
    interpret: bool | None = None,
):
    """Fused multi-level lifting DWT (haar, cdf97, or any declarative
    lifting family), coarsest-level subbands only (the reference
    CustomTransform's coarse_only output).

    Args:
      x: (N, H, W) float array; H, W divisible by 2**levels.
    Returns:
      (N, 4, H/2ˡ, W/2ˡ) stacked [LL, LH, HL, HH].
    """
    if interpret is None:
        interpret = _interpret_default()
    n, h, w = x.shape
    assert h % (2**levels) == 0 and w % (2**levels) == 0, (h, w, levels)
    ho, wo = h // 2**levels, w // 2**levels
    if tile_n is None:
        # Mosaic caps the kernel's scoped VMEM stack at 16 MB.  Measured
        # scoped use for haar levels=1 at 224² is ~2.13 MB per sample at
        # f32 (≈11 copies of the (H, W) plane held live across the
        # lift/transpose dataflow); cdf97 and the declarative families
        # roughly double that.  Budget 24 plane-copies in 12 MB so every
        # basis fits with headroom — at 64² this still resolves to the
        # full tile of 8, at 224² it drops to 2 (the kernel is
        # bandwidth-bound, so smaller tiles cost nothing).
        plane = h * w * x.dtype.itemsize
        tile_n = max(1, min(n, 8, (12 * 1024 * 1024) // (plane * 24)))
    pad_n = (-n) % tile_n
    if pad_n:
        x = jnp.concatenate([x, jnp.zeros((pad_n, h, w), x.dtype)], axis=0)
    grid = ((n + pad_n) // tile_n,)
    out = pl.pallas_call(
        functools.partial(_dwt_kernel, levels, basis),
        out_shape=jax.ShapeDtypeStruct((n + pad_n, 4, ho, wo), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_n, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (tile_n, 4, ho, wo), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(x)
    return out[:n]


def haar_multi_level_pallas(
    x, levels: int = 1, tile_n: int | None = None, interpret: bool | None = None
):
    return lifting_multi_level_pallas(x, levels, "haar", tile_n, interpret)


def cdf97_multi_level_pallas(
    x, levels: int = 1, tile_n: int | None = None, interpret: bool | None = None
):
    return lifting_multi_level_pallas(x, levels, "cdf97", tile_n, interpret)


def haar_dwt2_pallas(x, interpret: bool | None = None):
    """Single-level convenience wrapper: (N, H, W) → (N, 4, H/2, W/2)."""
    return haar_multi_level_pallas(x, levels=1, interpret=interpret)


# ---------------------------------------------------------------------------
# Stationary (undecimated) Haar transform — the flagship VOC-study transform
# (SWTTransform, custom_transforms.py:160-169), fused into one VMEM pass.
# Periodic extension == the circular rolls used here.
# ---------------------------------------------------------------------------


def _swt_kernel(x_ref, out_ref):
    x = x_ref[...]
    s = SQRT2 / 2.0  # haar dec filter coefficient 1/√2
    h, w = x.shape[-2], x.shape[-1]
    # rows pass (along H = axis -2): lo[i] = s(x[i] + x[i+1]) periodic
    # (pltpu.roll wants non-negative shifts: roll(n-1) == roll(-1))
    xn = pltpu.roll(x, shift=h - 1, axis=1)
    lo_h = s * (x + xn)
    hi_h = s * (x - xn)
    # cols pass (along W = lanes)
    lo_hn = pltpu.roll(lo_h, shift=w - 1, axis=2)
    hi_hn = pltpu.roll(hi_h, shift=w - 1, axis=2)
    out_ref[:, 0] = s * (lo_h + lo_hn)  # cA (LL)
    out_ref[:, 1] = s * (hi_h + hi_hn)  # cH (high along H)
    out_ref[:, 2] = s * (lo_h - lo_hn)  # cV (high along W)
    out_ref[:, 3] = s * (hi_h - hi_hn)  # cD


@functools.partial(jax.jit, static_argnames=("tile_n", "interpret"))
def haar_swt2_pallas(x, tile_n: int | None = None, interpret: bool | None = None):
    """Level-1 stationary Haar transform, size-preserving: (N, H, W) →
    (N, 4, H, W) ordered [cA, cH, cV, cD] (== swt2(x, 'haar', 1))."""
    if interpret is None:
        interpret = _interpret_default()
    # Mosaic's rotate (pltpu.roll) is 32-bit only — compute in f32 and cast
    # back for low-precision inputs
    in_dtype = x.dtype
    if in_dtype != jnp.float32:
        x = x.astype(jnp.float32)
    n, h, w = x.shape
    if tile_n is None:
        # VMEM budget: in block + 4-band out block + ~4 temporaries,
        # double-buffered → ~12 copies of (tile, H, W) f32 under 12 MB
        tile_n = max(1, (12 * 1024 * 1024) // (h * w * 4 * 12))
        tile_n = min(tile_n, n, 8)
    pad_n = (-n) % tile_n
    if pad_n:
        x = jnp.concatenate([x, jnp.zeros((pad_n, h, w), x.dtype)], axis=0)
    out = pl.pallas_call(
        _swt_kernel,
        out_shape=jax.ShapeDtypeStruct((n + pad_n, 4, h, w), x.dtype),
        grid=((n + pad_n) // tile_n,),
        in_specs=[pl.BlockSpec((tile_n, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(
            (tile_n, 4, h, w), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(x)
    return out[:n].astype(in_dtype)
