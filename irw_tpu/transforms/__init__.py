"""Transform pipeline split host/device (reference: main/transforms/ +
torchvision names resolved by the getter, main/getter.py:27-31).

- :class:`HostTransform` — decode-side geometry on PIL (resize, crops,
  flips), output uint8 HWC;
- :class:`DeviceTransform` — jit-side numerics: /255, Normalize, and the
  wavelet ops (``CustomTransform`` lifting DWT, ``SWTTransform``,
  ``DWTTransform``, ``ResizeSubBands``) batched on device;
- :func:`build_transforms` — consume the reference's transform YAML dicts
  (ordered name → kwargs) and split them into the two stages.
"""

from irw_tpu.transforms.pipeline import (
    DeviceTransform,
    HostTransform,
    build_transforms,
)

__all__ = ["HostTransform", "DeviceTransform", "build_transforms"]
