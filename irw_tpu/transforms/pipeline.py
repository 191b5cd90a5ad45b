"""Host (PIL, uint8) and device (jnp, jitted) transform stages.

The reference's transform configs are ordered dicts of names → kwargs
(config/transform/*.yaml), resolved against main.transforms then
torchvision (getter.py:27-31).  ``build_transforms`` consumes the same
dicts: geometric PIL ops stay on the host; ToTensor/Normalize and all
wavelet ops move into the jitted device stage.

Wavelet op semantics (custom_transforms.py):
- ``CustomTransform``: n-level lifting DWT (haar/cdf97) on the normalised
  image, coarse-only subband stack (:90-117) → (B, 4, H/2ˡ, W/2ˡ, C);
- ``SWTTransform``: stationary level-1 transform, size-preserving
  (:160-169) → (B, 4, H, W, C), after a bicubic ``fix_size`` resize to a
  multiple of 2^level (:132-139, handled host-side by rounding the resize);
- ``DWTTransform``: pywt-style wavedec2, coarsest level (:172-186);
- ``ResizeSubBands``: bilinear resize of the band stack (:57-84).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from irw_tpu.ops.wavelets import subband_stack, swt2, wavedec2

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


# ---------------------------------------------------------------------------
# Host stage
# ---------------------------------------------------------------------------


def _color_distort(img: Image.Image, rng, strength: float = 1.0) -> Image.Image:
    """SwAV-style color jitter + random grayscale (the reference's
    get_color_distortion, base_dataset.py:133-147)."""
    from PIL import ImageEnhance, ImageOps

    if rng.rand() < 0.8:
        for enhancer, span in (
            (ImageEnhance.Brightness, 0.8 * strength),
            (ImageEnhance.Contrast, 0.8 * strength),
            (ImageEnhance.Color, 0.8 * strength),
        ):
            img = enhancer(img).enhance(1.0 + span * (rng.rand() * 2 - 1))
    if rng.rand() < 0.2:
        img = ImageOps.grayscale(img).convert("RGB")
    return img


def _maybe_blur(img: Image.Image, rng, p: float = 0.5) -> Image.Image:
    """PILRandomGaussianBlur (base_dataset.py:118-131)."""
    from PIL import ImageFilter

    if rng.rand() < p:
        img = img.filter(ImageFilter.GaussianBlur(radius=rng.uniform(0.1, 2.0)))
    return img


def _color_jitter(img: Image.Image, rng, brightness=0.0, contrast=0.0,
                  saturation=0.0, hue=0.0) -> Image.Image:
    """torchvision-style ColorJitter: per-image factors sampled uniformly
    from [max(0, 1−v), 1+v] (hue from [−h, h]), applied in random order; a
    zero span disables that component (torchvision _check_input semantics).
    Used by the flagship train pipelines
    (/root/reference/config/transform/voc_swt.yaml:9-13)."""
    from PIL import ImageEnhance

    ops = []
    if brightness:
        ops.append(("b", rng.uniform(max(0.0, 1 - brightness), 1 + brightness)))
    if contrast:
        ops.append(("c", rng.uniform(max(0.0, 1 - contrast), 1 + contrast)))
    if saturation:
        ops.append(("s", rng.uniform(max(0.0, 1 - saturation), 1 + saturation)))
    if hue:
        ops.append(("h", rng.uniform(-hue, hue)))
    for i in rng.permutation(len(ops)):
        kind, f = ops[int(i)]
        if kind == "b":
            img = ImageEnhance.Brightness(img).enhance(f)
        elif kind == "c":
            img = ImageEnhance.Contrast(img).enhance(f)
        elif kind == "s":
            img = ImageEnhance.Color(img).enhance(f)
        else:  # hue: shift the H channel of an HSV decomposition
            hsv = np.asarray(img.convert("HSV"), dtype=np.int16)
            hsv[..., 0] = (hsv[..., 0] + int(round(f * 255))) % 256
            img = Image.fromarray(hsv.astype(np.uint8), mode="HSV").convert("RGB")
    return img


class HostTransform:
    """Minimal host-side geometry.  ``ops`` is a list of (name, kwargs):
    Resize, CenterCrop, RandomCrop, RandomResizedCrop,
    RandomHorizontalFlip, MultiCrop.  Output: uint8 (H, W, 3), or a LIST of
    arrays when MultiCrop is configured (the SwAV branch,
    base_dataset.py:94-110)."""

    def __init__(self, ops: Sequence[tuple[str, dict]] = (), image_size: int = 224):
        self.ops = list(ops) or [("Resize", {"size": (image_size, image_size)})]
        self.multi_crop = next((kw for name, kw in self.ops if name == "MultiCrop"), None)

    def _multi_crop(self, img: Image.Image, rng):
        """2 global + N local crops with color distortion + blur."""
        cfg = self.multi_crop
        sizes = cfg.get("size_crops", [224, 96])
        counts = cfg.get("nmb_crops", [2, 6])
        min_scales = cfg.get("min_scale_crops", [0.14, 0.05])
        max_scales = cfg.get("max_scale_crops", [1.0, 0.14])
        crops = []
        for size, count, lo, hi in zip(sizes, counts, min_scales, max_scales):
            for _ in range(count):
                area = img.width * img.height
                target = rng.uniform(lo, hi) * area
                ratio = rng.uniform(3 / 4, 4 / 3)
                cw = min(int(round(np.sqrt(target * ratio))), img.width)
                ch = min(int(round(np.sqrt(target / ratio))), img.height)
                left = rng.randint(0, img.width - cw + 1)
                top = rng.randint(0, img.height - ch + 1)
                crop = img.crop((left, top, left + cw, top + ch)).resize(
                    (size, size), Image.BILINEAR
                )
                if rng.rand() < 0.5:
                    crop = crop.transpose(Image.FLIP_LEFT_RIGHT)
                crop = _color_distort(crop, rng)
                crop = _maybe_blur(crop, rng)
                crops.append(np.asarray(crop, dtype=np.uint8))
        return crops

    @staticmethod
    def _size2d(size):
        if isinstance(size, int):
            return (size, size)
        return tuple(size)

    def __call__(self, img: Image.Image, rng: np.random.RandomState, train: bool):
        if self.multi_crop is not None and train:
            return self._multi_crop(img, rng)
        for name, kw in self.ops:
            if name == "MultiCrop":  # eval path: fall through to plain ops
                continue
            if name == "Resize":
                h, w = self._size2d(kw.get("size", 224))
                img = img.resize((w, h), Image.BILINEAR)
            elif name == "CenterCrop":
                h, w = self._size2d(kw.get("size", 224))
                left = max((img.width - w) // 2, 0)
                top = max((img.height - h) // 2, 0)
                img = img.crop((left, top, left + w, top + h))
            elif name == "RandomCrop":
                h, w = self._size2d(kw.get("size", 224))
                if train and img.width >= w and img.height >= h:
                    left = rng.randint(0, img.width - w + 1)
                    top = rng.randint(0, img.height - h + 1)
                    img = img.crop((left, top, left + w, top + h))
                else:
                    left = max((img.width - w) // 2, 0)
                    top = max((img.height - h) // 2, 0)
                    img = img.crop((left, top, left + w, top + h))
            elif name == "RandomResizedCrop":
                h, w = self._size2d(kw.get("size", 224))
                if train:
                    scale = kw.get("scale", (0.08, 1.0))
                    ratio_span = kw.get("ratio", (3 / 4, 4 / 3))
                    area = img.width * img.height
                    target = rng.uniform(*scale) * area
                    # torchvision samples the aspect ratio log-uniformly
                    ratio = float(np.exp(rng.uniform(
                        np.log(ratio_span[0]), np.log(ratio_span[1]))))
                    cw = int(round(np.sqrt(target * ratio)))
                    ch = int(round(np.sqrt(target / ratio)))
                    cw, ch = min(cw, img.width), min(ch, img.height)
                    left = rng.randint(0, img.width - cw + 1)
                    top = rng.randint(0, img.height - ch + 1)
                    img = img.crop((left, top, left + cw, top + ch))
                img = img.resize((w, h), Image.BILINEAR)
            elif name == "RandomHorizontalFlip":
                if train and rng.rand() < kw.get("p", 0.5):
                    img = img.transpose(Image.FLIP_LEFT_RIGHT)
            elif name == "ColorJitter":
                if train:
                    img = _color_jitter(
                        img, rng,
                        brightness=kw.get("brightness", 0.0),
                        contrast=kw.get("contrast", 0.0),
                        saturation=kw.get("saturation", 0.0),
                        hue=kw.get("hue", 0.0),
                    )
            elif name == "RandomGrayscale":
                if train and rng.rand() < kw.get("p", 0.1):
                    from PIL import ImageOps

                    img = ImageOps.grayscale(img).convert("RGB")
            elif name == "GaussianBlur":
                if train and rng.rand() < kw.get("p", 1.0):
                    from PIL import ImageFilter

                    sigma = kw.get("sigma", (0.1, 2.0))
                    lo, hi = (sigma, sigma) if isinstance(sigma, (int, float)) else sigma
                    img = img.filter(ImageFilter.GaussianBlur(radius=rng.uniform(lo, hi)))
            elif name == "FixSize":
                # bicubic pad-to-multiple (BaseWaveletTransform.fix_size)
                factor = 2 ** kw.get("level", 1)
                new_w = int(np.ceil(img.width / factor) * factor)
                new_h = int(np.ceil(img.height / factor) * factor)
                if (new_w, new_h) != (img.width, img.height):
                    img = img.resize((new_w, new_h), Image.BICUBIC)
            else:
                raise ValueError(f"unknown host transform {name!r}")
        arr = np.asarray(img, dtype=np.uint8)
        if arr.ndim == 2:
            arr = np.stack([arr] * 3, axis=-1)
        return arr

    # ------------------------------------------------------------------
    # Native-loader geometry planning (irw_tpu/native): the C++ loader
    # executes crop/resize/flip plans; Python does the sampling here so
    # augmentation draws are identical to the PIL path above.
    # ------------------------------------------------------------------

    _PIXEL_OPS = ("ColorJitter", "RandomGrayscale", "GaussianBlur")
    _GEOMETRY_OPS = ("Resize", "CenterCrop", "RandomCrop",
                     "RandomResizedCrop", "RandomHorizontalFlip", "FixSize")

    def native_plannable(self, train: bool) -> bool:
        """True when this pipeline can run through the native C++ loader.
        Geometry AND the color augmentations (ColorJitter without hue,
        RandomGrayscale, GaussianBlur) are native ops; a non-zero
        ColorJitter hue needs PIL's HSV round-trip, and MultiCrop produces
        a ragged list the single-output batch API can't carry."""
        if train and self.multi_crop is not None:
            return False
        for name, kw in self.ops:
            if name == "MultiCrop":
                continue
            if name in self._PIXEL_OPS:
                if train and name == "ColorJitter" and kw.get("hue", 0.0):
                    return False
                continue
            if name not in self._GEOMETRY_OPS:
                return False
        return True

    def plan(self, width: int, height: int, rng, train: bool):
        """Compute the geometry plan for one (width, height) image,
        consuming ``rng`` in the same order as ``__call__``.  Returns
        (steps, out_w, out_h) — steps as understood by
        ``irw_tpu.native.pack_plan`` — or None when this particular image
        hits a case only PIL handles (zero-padded crops)."""
        steps: list[tuple] = []
        w, h = width, height
        for name, kw in self.ops:
            if name == "MultiCrop":
                continue  # plannable() guarantees it's inactive (eval path)
            if name in self._PIXEL_OPS:
                if not train:
                    continue  # train-only no-ops
                # rng consumption must exactly mirror __call__'s PIL path
                if name == "ColorJitter":
                    cj: list[tuple] = []
                    for kind, span in (("brightness", kw.get("brightness", 0.0)),
                                       ("contrast", kw.get("contrast", 0.0)),
                                       ("saturation", kw.get("saturation", 0.0))):
                        if span:
                            cj.append((kind, float(rng.uniform(
                                max(0.0, 1 - span), 1 + span))))
                    if kw.get("hue", 0.0):
                        return None  # plannable() gates this; be safe
                    for i in rng.permutation(len(cj)):
                        steps.append(cj[int(i)])
                elif name == "RandomGrayscale":
                    if rng.rand() < kw.get("p", 0.1):
                        steps.append(("grayscale",))
                elif name == "GaussianBlur":
                    if rng.rand() < kw.get("p", 1.0):
                        sigma = kw.get("sigma", (0.1, 2.0))
                        lo, hi = ((sigma, sigma)
                                  if isinstance(sigma, (int, float)) else sigma)
                        steps.append(("blur", float(rng.uniform(lo, hi))))
                continue
            if name == "Resize":
                th, tw = self._size2d(kw.get("size", 224))
                steps.append(("resize", tw, th, 0))
                w, h = tw, th
            elif name == "CenterCrop":
                th, tw = self._size2d(kw.get("size", 224))
                if tw > w or th > h:
                    return None  # PIL zero-pads out-of-bounds crops
                steps.append(("crop", max((w - tw) // 2, 0),
                              max((h - th) // 2, 0), tw, th))
                w, h = tw, th
            elif name == "RandomCrop":
                th, tw = self._size2d(kw.get("size", 224))
                if train and w >= tw and h >= th:
                    left = rng.randint(0, w - tw + 1)
                    top = rng.randint(0, h - th + 1)
                else:
                    if tw > w or th > h:
                        return None
                    left = max((w - tw) // 2, 0)
                    top = max((h - th) // 2, 0)
                steps.append(("crop", left, top, tw, th))
                w, h = tw, th
            elif name == "RandomResizedCrop":
                th, tw = self._size2d(kw.get("size", 224))
                if train:
                    scale = kw.get("scale", (0.08, 1.0))
                    ratio_span = kw.get("ratio", (3 / 4, 4 / 3))
                    area = w * h
                    target = rng.uniform(*scale) * area
                    ratio = float(np.exp(rng.uniform(
                        np.log(ratio_span[0]), np.log(ratio_span[1]))))
                    cw = int(round(np.sqrt(target * ratio)))
                    ch = int(round(np.sqrt(target / ratio)))
                    cw, ch = min(cw, w), min(ch, h)
                    left = rng.randint(0, w - cw + 1)
                    top = rng.randint(0, h - ch + 1)
                    steps.append(("crop", left, top, cw, ch))
                    w, h = cw, ch
                steps.append(("resize", tw, th, 0))
                w, h = tw, th
            elif name == "RandomHorizontalFlip":
                if train and rng.rand() < kw.get("p", 0.5):
                    steps.append(("flip",))
            elif name == "FixSize":
                factor = 2 ** kw.get("level", 1)
                new_w = int(np.ceil(w / factor) * factor)
                new_h = int(np.ceil(h / factor) * factor)
                if (new_w, new_h) != (w, h):
                    steps.append(("resize", new_w, new_h, 1))  # bicubic
                    w, h = new_w, new_h
            else:
                return None
        return steps, w, h

    @staticmethod
    def apply_plan_pil(img: Image.Image, steps) -> np.ndarray:
        """Execute a geometry plan through PIL (per-sample fallback when the
        native loader reports a decode it can't handle)."""
        from PIL import ImageEnhance, ImageFilter, ImageOps

        enhancers = {"brightness": ImageEnhance.Brightness,
                     "contrast": ImageEnhance.Contrast,
                     "saturation": ImageEnhance.Color}
        for step in steps:
            if step[0] == "crop":
                _, left, top, cw, ch = step
                img = img.crop((left, top, left + cw, top + ch))
            elif step[0] == "resize":
                _, tw, th, filt = step
                img = img.resize(
                    (tw, th), Image.BICUBIC if filt == 1 else Image.BILINEAR)
            elif step[0] == "flip":
                img = img.transpose(Image.FLIP_LEFT_RIGHT)
            elif step[0] in enhancers:
                img = enhancers[step[0]](img).enhance(step[1])
            elif step[0] == "grayscale":
                img = ImageOps.grayscale(img).convert("RGB")
            elif step[0] == "blur":
                img = img.filter(ImageFilter.GaussianBlur(radius=step[1]))
        arr = np.asarray(img, dtype=np.uint8)
        if arr.ndim == 2:
            arr = np.stack([arr] * 3, axis=-1)
        return arr


# ---------------------------------------------------------------------------
# Device stage
# ---------------------------------------------------------------------------


class DeviceTransform:
    """Batched on-device numerics; ``__call__`` is jit-compiled.

    ops: list of (name, kwargs): Normalize, CustomTransform, SWTTransform,
    DWTTransform, ResizeSubBands.  Input (B, H, W, 3) uint8/float; output
    either (B, H, W, 3) images or (B, S, h, w, 3) subband stacks.
    """

    def __init__(self, ops: Sequence[tuple[str, dict]] = ()):
        self.ops = tuple((name, tuple(sorted(kw.items()))) for name, kw in ops)
        self._fn = jax.jit(partial(DeviceTransform._apply, self.ops))

    @staticmethod
    def _apply(ops, x):
        x = x.astype(jnp.float32)
        x = x / 255.0
        for name, kw_items in ops:
            kw = dict(kw_items)
            if name == "Normalize":
                mean = jnp.asarray(kw.get("mean", IMAGENET_MEAN), jnp.float32)
                std = jnp.asarray(kw.get("std", IMAGENET_STD), jnp.float32)
                x = (x - mean) / std
            elif name == "CustomTransform":
                levels = int(kw.get("decompose_levels", kw.get("levels", 1)))
                basis = kw.get("basis", "haar")
                ll_only = bool(kw.get("ll_only", False))
                coarse_only = bool(kw.get("coarse_only", True))
                divisible = (
                    x.shape[-3] % (2**levels) == 0 and x.shape[-2] % (2**levels) == 0
                )
                from irw_tpu.ops.wavelets.pallas_dwt import _LIFTS as _PALLAS_LIFTS

                if (coarse_only or levels == 1) and not ll_only and divisible and basis in _PALLAS_LIFTS:
                    # fused Pallas multi-level lifting kernel (every lifting
                    # family, incl. the 11 revived reference wavelets)
                    from irw_tpu.ops.wavelets.pallas_dwt import lifting_multi_level_pallas

                    img = jnp.moveaxis(x, -1, 1)  # (B, C, H, W)
                    b, c, h, w = img.shape
                    flat = lifting_multi_level_pallas(
                        img.reshape(b * c, h, w), levels=levels, basis=basis
                    )
                    ho, wo = flat.shape[-2:]
                    x = jnp.moveaxis(
                        flat.reshape(b, c, 4, ho, wo).transpose(0, 2, 1, 3, 4), 2, -1
                    )
                elif coarse_only or levels == 1:
                    x = subband_stack(x, levels=levels, basis=basis, ll_only=ll_only)
                else:
                    # full multi-level stack (the WCNN_ALL 7-band input the
                    # reference left NotImplemented, custom_transforms.py:107):
                    # coarsest LL + every level's details, finer levels
                    # average-pooled to the coarsest size
                    from irw_tpu.ops.wavelets.lifting import lifting_decompose

                    img = jnp.moveaxis(x, -1, 1)  # (B, C, H, W)
                    approx, details = lifting_decompose(img, levels=levels, basis=basis)
                    target_hw = approx[-1].shape[-2:]
                    bands = [approx[-1]]
                    for lvl in range(levels - 1, -1, -1):
                        for det in details[lvl]:
                            factor = det.shape[-1] // target_hw[1]
                            if factor > 1:
                                b_, c_, h_, w_ = det.shape
                                det = det.reshape(
                                    b_, c_, target_hw[0], factor, target_hw[1], factor
                                ).mean(axis=(3, 5))
                            bands.append(det)
                    x = jnp.moveaxis(jnp.stack(bands, axis=1), 2, -1)
            elif name == "SWTTransform":
                level = int(kw.get("level", 1))
                wavelet = kw.get("wavelet", "haar")
                img = jnp.moveaxis(x, -1, 1)  # (B, C, H, W)
                if wavelet == "haar" and level == 1:
                    # fused Pallas kernel for the flagship haar/level-1 path
                    from irw_tpu.ops.wavelets.pallas_dwt import haar_swt2_pallas

                    b, c, hh_, ww_ = img.shape
                    flat = haar_swt2_pallas(img.reshape(b * c, hh_, ww_))
                    stack = flat.reshape(b, c, 4, hh_, ww_).transpose(0, 2, 1, 3, 4)
                else:
                    (ca, (lh, hl, hh)), *_ = swt2(img, wavelet, level=level)
                    stack = jnp.stack([ca, lh, hl, hh], axis=1)  # (B, 4, C, H, W)
                x = jnp.moveaxis(stack, 2, -1)
            elif name == "DWTTransform":
                level = int(kw.get("level", 1))
                wavelet = kw.get("wavelet", "haar")
                # pywt.wavedec2's default extension is 'symmetric'
                # (custom_transforms.py:172-186 passes no mode) — honour it.
                # For haar on even sizes (every reference DWTTransform
                # config) this is bit-identical to periodization AND keeps
                # the exactly-halved size policy; longer filters grow by
                # ⌈(L−2)/2⌉ per side, matching pywt's coefficient counts.
                mode = kw.get("mode", "symmetric")
                img = jnp.moveaxis(x, -1, 1)
                coeffs = wavedec2(img, wavelet, level=level, mode=mode)
                ca, (lh, hl, hh) = coeffs[0], coeffs[1]
                stack = jnp.stack([ca, lh, hl, hh], axis=1)
                x = jnp.moveaxis(stack, 2, -1)
            elif name == "RGBToBGR":
                # channel swap (reference main/utils RGBToBGR, used by
                # BGR-pretrained backbones)
                x = x[..., ::-1]
            elif name == "ResizeSubBands":
                size = kw.get("size", 224)
                hw = (size, size) if isinstance(size, int) else tuple(size)
                b, s = x.shape[0], x.shape[1]
                flat = x.reshape((b * s,) + x.shape[2:])
                flat = jax.image.resize(
                    flat, (b * s, hw[0], hw[1], x.shape[-1]), method="bilinear"
                )
                x = flat.reshape((b, s) + flat.shape[1:])
            else:
                raise ValueError(f"unknown device transform {name!r}")
        return x

    def __call__(self, batch_images):
        return self._fn(jnp.asarray(batch_images))


HOST_OPS = {
    "Resize",
    "CenterCrop",
    "RandomCrop",
    "RandomResizedCrop",
    "RandomHorizontalFlip",
    "ColorJitter",
    "RandomGrayscale",
    "GaussianBlur",
    "FixSize",
    "MultiCrop",
}
DEVICE_OPS = {
    "Normalize",
    "CustomTransform",
    "SWTTransform",
    "DWTTransform",
    "ResizeSubBands",
    "RGBToBGR",
}
SKIP_OPS = {"ToTensor"}  # implicit in the device stage


def build_transforms(transform_config: dict | None, image_size: int = 224):
    """Split a reference-style transform dict (ordered name → kwargs) into
    (HostTransform, DeviceTransform).

    SWT/DWT transforms imply a host-side FixSize like the reference's
    ``fix_size`` (custom_transforms.py:132-139).
    """
    host_ops, device_ops = [], []
    for name, kw in (transform_config or {}).items():
        kw = dict(kw or {})
        if name in SKIP_OPS:
            continue
        if name in HOST_OPS:
            host_ops.append((name, kw))
        elif name in DEVICE_OPS:
            if name in ("SWTTransform", "DWTTransform"):
                host_ops.append(("FixSize", {"level": int(kw.get("level", 1))}))
            device_ops.append((name, kw))
        else:
            raise ValueError(f"unknown transform {name!r}")
    if not host_ops:
        host_ops = [("Resize", {"size": (image_size, image_size)})]
    return HostTransform(host_ops, image_size), DeviceTransform(device_ops)
