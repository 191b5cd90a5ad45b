"""On-device wavelet transforms.

The reference computes wavelets in three places (SURVEY §2.8):

1. lifting-scheme DWT in the transform pipeline, per-sample, CPU
   (``main/transforms/custom_transforms.py`` ``CustomTransform`` →
   ``wavelets/haar.py`` / ``wavelets/cdf_97.py``);
2. pywt ``swt2`` / ``wavedec2`` in ``SWTTransform`` / ``DWTTransform``;
3. in-model DWT inside WaveResNet (``main/models/wresnet.py:256``).

Here all three are **batched on-device ops** that run inside the jitted train
step.  Three implementations are provided:

- :mod:`lifting` — vectorised jnp lifting (Haar / CDF-9/7) matching the
  reference's algebra (zero-padded ±1 shifts, √2 1D normalisation, "v6"
  2D subband scales);
- :mod:`dwt` — general separable filter-bank DWT/SWT (``dwt2``, ``wavedec2``,
  ``swt2``, inverses) for the pywt-style transforms, with selectable
  extension modes;
- :mod:`pallas_dwt` — a fused Pallas TPU kernel for the hot multi-level
  Haar path (single VMEM round-trip for all levels).

``reference.py`` holds an independent numpy implementation used only by the
test suite as the golden oracle.
"""

from irw_tpu.ops.wavelets.filters import WAVELET_FILTERS, get_filters
from irw_tpu.ops.wavelets.lifting import (
    COEFFS_SCALES_2D,
    cdf97_dwt2,
    cdf97_idwt2,
    haar_dwt2,
    haar_idwt2,
    lifting_decompose,
    lifting_dwt2,
    lifting_idwt2,
    subband_stack,
)
from irw_tpu.ops.wavelets.lifting_families import (
    FAMILY_ALIASES,
    LIFTING_FAMILIES,
    resolve_family,
)
from irw_tpu.ops.wavelets.dwt import dwt2, idwt2, iswt2, swt2, wavedec2, waverec2
from irw_tpu.ops.wavelets.pallas_dwt import (
    cdf97_multi_level_pallas,
    haar_dwt2_pallas,
    haar_multi_level_pallas,
    lifting_multi_level_pallas,
)

__all__ = [
    "WAVELET_FILTERS",
    "get_filters",
    "COEFFS_SCALES_2D",
    "haar_dwt2",
    "haar_idwt2",
    "cdf97_dwt2",
    "cdf97_idwt2",
    "lifting_decompose",
    "subband_stack",
    "dwt2",
    "idwt2",
    "swt2",
    "iswt2",
    "wavedec2",
    "waverec2",
    "haar_dwt2_pallas",
    "haar_multi_level_pallas",
    "cdf97_multi_level_pallas",
    "lifting_multi_level_pallas",
]
