#!/usr/bin/env python
"""Generate pywt golden vectors for the DWT/SWT parity tests — OFFLINE tool.

pywt is not installable in the build image (zero egress; verified absent
round 4), so the symmetric/reflect/zero boundary modes are tested there
against hand-written numpy oracles only.  Running this script on any
machine WITH pywt closes that loop: it writes small golden arrays for the
exact transforms the reference uses (pywt.wavedec2 / pywt.swt2 on haar —
main/transforms/custom_transforms.py:160-183), which
tests/test_wavelets.py::test_pywt_golden_parity then verifies against the
irw_tpu implementations.

Usage (offline, once):
    pip install pywavelets
    python tools/gen_pywt_golden.py          # writes tests/golden/pywt_golden.npz
then commit tests/golden/pywt_golden.npz.

Inputs are deterministic (seeded), so the artifact is reproducible.
"""

from __future__ import annotations

import os

import numpy as np

SHAPES = [(8, 8), (16, 12), (13, 9), (32, 32)]
MODES = ["symmetric", "reflect", "zero", "periodization"]
WAVELET = "haar"
LEVELS = {"wavedec2": 2, "swt2": 1}


def main():
    import pywt  # noqa: F401 — offline dependency by design

    out = {}
    for si, shape in enumerate(SHAPES):
        rng = np.random.RandomState(1234 + si)
        x = rng.rand(*shape).astype(np.float64)
        out[f"input_{si}"] = x
        for mode in MODES:
            coeffs = pywt.wavedec2(x, WAVELET, mode=mode,
                                   level=LEVELS["wavedec2"])
            ll = coeffs[0]
            out[f"wavedec2_{si}_{mode}_ll"] = ll
            for lvl, (lh, hl, hh) in enumerate(coeffs[1:]):
                out[f"wavedec2_{si}_{mode}_l{lvl}_lh"] = lh
                out[f"wavedec2_{si}_{mode}_l{lvl}_hl"] = hl
                out[f"wavedec2_{si}_{mode}_l{lvl}_hh"] = hh
        # swt2 requires even sizes
        if shape[0] % 2 == 0 and shape[1] % 2 == 0:
            (ca, (lh, hl, hh)), = pywt.swt2(x, WAVELET, level=LEVELS["swt2"])
            out[f"swt2_{si}_ca"] = ca
            out[f"swt2_{si}_lh"] = lh
            out[f"swt2_{si}_hl"] = hl
            out[f"swt2_{si}_hh"] = hh
    dst = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "tests", "golden", "pywt_golden.npz")
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    np.savez_compressed(dst, **out)
    print(f"wrote {dst} ({len(out)} arrays, pywt {pywt.__version__})")


if __name__ == "__main__":
    main()
