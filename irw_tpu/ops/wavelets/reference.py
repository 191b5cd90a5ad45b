"""Independent numpy oracle for the wavelet test suite.

Deliberately written as slow, loop-based direct implementations of the
definitions (no shared code with the jnp/Pallas paths) so the tests compare
two independent derivations — the role pywt played for the reference repo
(its only numerical harness was reconstruction MSE,
``main/transforms/wavelets/utils.py:123-176``).
"""

from __future__ import annotations

import math

import numpy as np

from irw_tpu.ops.wavelets.filters import get_filters

SQRT2 = math.sqrt(2.0)


# --- filter-bank DWT oracle (periodization mode) ----------------------------


def dwt1d_np(x, wavelet):
    dec_lo, dec_hi, _, _ = get_filters(wavelet)
    n, L = len(x), len(dec_lo)
    lo = np.zeros(n // 2)
    hi = np.zeros(n // 2)
    for k in range(n // 2):
        for m in range(L):
            idx = (2 * k - m + 1) % n
            lo[k] += dec_lo[m] * x[idx]
            hi[k] += dec_hi[m] * x[idx]
    return lo, hi


def idwt1d_np(lo, hi, wavelet):
    _, _, rec_lo, rec_hi = get_filters(wavelet)
    n, L = 2 * len(lo), len(rec_lo)
    x = np.zeros(n)
    for k in range(len(lo)):
        for m in range(L):
            idx = (2 * k + m - (L - 2)) % n
            x[idx] += rec_lo[m] * lo[k] + rec_hi[m] * hi[k]
    return x


def dwt2_np(img, wavelet):
    """(H, W) → (cA, (cH, cV, cD)) with periodization."""
    H, W = img.shape
    lo_rows = np.zeros((H // 2, W))
    hi_rows = np.zeros((H // 2, W))
    for col in range(W):
        lo_rows[:, col], hi_rows[:, col] = dwt1d_np(img[:, col], wavelet)
    ll = np.zeros((H // 2, W // 2))
    hl = np.zeros((H // 2, W // 2))
    lh = np.zeros((H // 2, W // 2))
    hh = np.zeros((H // 2, W // 2))
    for row in range(H // 2):
        ll[row], hl[row] = dwt1d_np(lo_rows[row], wavelet)
        lh[row], hh[row] = dwt1d_np(hi_rows[row], wavelet)
    return ll, (lh, hl, hh)


def swt1d_np(x, wavelet, dilation=1):
    dec_lo, dec_hi, _, _ = get_filters(wavelet)
    n, L = len(x), len(dec_lo)
    lo = np.zeros(n)
    hi = np.zeros(n)
    for i in range(n):
        for m in range(L):
            idx = (i - (m - 1) * dilation) % n
            lo[i] += dec_lo[m] * x[idx]
            hi[i] += dec_hi[m] * x[idx]
    return lo, hi


def swt2_np(img, wavelet, dilation=1):
    H, W = img.shape
    lo_rows = np.zeros((H, W))
    hi_rows = np.zeros((H, W))
    for col in range(W):
        lo_rows[:, col], hi_rows[:, col] = swt1d_np(img[:, col], wavelet, dilation)
    ll = np.zeros((H, W))
    hl = np.zeros((H, W))
    lh = np.zeros((H, W))
    hh = np.zeros((H, W))
    for row in range(H):
        ll[row], hl[row] = swt1d_np(lo_rows[row], wavelet, dilation)
        lh[row], hh[row] = swt1d_np(hi_rows[row], wavelet, dilation)
    return ll, (lh, hl, hh)


# --- lifting oracle (reference algebra: zero-padded shifts, v6 scales) ------

V6_SCALES = (0.5, 1.0, 1.0, SQRT2)


def haar_lift_1d_np(x):
    even, odd = x[0::2].astype(np.float64), x[1::2].astype(np.float64)
    d = odd - even
    s = even + 0.5 * d
    return s * SQRT2, d / SQRT2


def cdf97_lift_1d_np(x):
    a1, a2, a3, a4, k = -1.58613432, -0.05298011854, 0.8829110762, 0.4435068522, 1.149604398
    even, odd = x[0::2].astype(np.float64).copy(), x[1::2].astype(np.float64).copy()

    def shift_next(v):  # v[i+1], zero pad at end
        return np.concatenate([v[1:], [0.0]])

    def shift_prev(v):  # v[i-1], zero pad at start
        return np.concatenate([[0.0], v[:-1]])

    odd = odd + a1 * (even + shift_next(even))
    even = even + a2 * (shift_prev(odd) + odd)
    odd = odd + a3 * (even + shift_next(even))
    even = even + a4 * (shift_prev(odd) + odd)
    return even * k, odd / k


_LIFT_NP = {"haar": haar_lift_1d_np, "cdf97": cdf97_lift_1d_np}


def lifting_dwt2_np(img, basis="haar", scales=V6_SCALES):
    """(H, W) → (ll, lh, hl, hh), matching irw_tpu.ops.wavelets.lifting."""
    H, W = img.shape
    lift = _LIFT_NP[basis]
    low_h = np.zeros((H // 2, W))
    high_h = np.zeros((H // 2, W))
    for col in range(W):
        low_h[:, col], high_h[:, col] = lift(img[:, col])
    ll = np.zeros((H // 2, W // 2))
    hl = np.zeros((H // 2, W // 2))
    lh = np.zeros((H // 2, W // 2))
    hh = np.zeros((H // 2, W // 2))
    for row in range(H // 2):
        ll[row], hl[row] = lift(low_h[row])
        lh[row], hh[row] = lift(high_h[row])
    s0, s1, s2, s3 = scales
    return ll * s0, lh * s1, hl * s2, hh * s3
