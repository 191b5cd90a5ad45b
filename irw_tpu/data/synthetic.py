"""Deterministic in-memory dataset for tests and benches.

The reference has nothing like it (its tests needed real data on disk); a
synthetic dataset makes the full train/eval pipeline runnable anywhere.
Images are class-dependent Gabor-ish patterns + noise so retrieval metrics
are meaningfully above chance after a few steps of training.
"""

from __future__ import annotations

import numpy as np

from irw_tpu.data.base import BaseDataset


class SyntheticDataset(BaseDataset):
    def __init__(
        self,
        num_samples: int = 256,
        num_classes: int = 8,
        image_size: int = 64,
        multi_label: bool = False,
        num_label_dims: int = 20,
        seed: int = 0,
        mode: str = "train",
        **kw,
    ):
        rng = np.random.RandomState(seed)
        if multi_label:
            labels = np.zeros((num_samples, num_label_dims), np.float32)
            primary = rng.randint(0, num_classes, num_samples)
            for i, p in enumerate(primary):
                labels[i, p % num_label_dims] = 1.0
                extra = rng.randint(0, num_label_dims, 2)
                labels[i, extra] = 1.0
            class_id = primary
        else:
            class_id = rng.randint(0, num_classes, num_samples)
            labels = class_id
        super_labels = class_id % max(num_classes // 2, 2)
        paths = [f"synthetic://{seed}/{i}" for i in range(num_samples)]
        super().__init__(paths, labels, super_labels, mode)

        # class-dependent frequency pattern + per-sample noise
        yy, xx = np.mgrid[0:image_size, 0:image_size].astype(np.float32)
        images = np.zeros((num_samples, image_size, image_size, 3), np.uint8)
        for i in range(num_samples):
            c = class_id[i]
            freq = 2 * np.pi * (1 + c) / image_size
            phase = rng.rand() * np.pi
            base = np.stack(
                [
                    np.sin(freq * xx + phase),
                    np.cos(freq * yy + phase),
                    np.sin(freq * (xx + yy) / 2 + phase),
                ],
                axis=-1,
            )
            noisy = base + 0.3 * rng.randn(image_size, image_size, 3)
            images[i] = np.clip((noisy * 0.5 + 0.5) * 255, 0, 255).astype(np.uint8)
        self.images = images

    def load_image(self, index: int):
        from PIL import Image

        return Image.fromarray(self.images[index])


class SyntheticHashingDataset(SyntheticDataset):
    """Query/gallery protocol variant: disjoint deterministic splits per
    mode from one class distribution — lets the full hashing eval protocol
    (query vs database) run without any data on disk."""

    _MODE_SEEDS = {"train": 0, "query": 1, "test": 1, "gallery": 2, "database": 2}

    def __init__(self, num_samples: int = 256, mode: str = "train", seed: int = 0, **kw):
        sizes = {"train": num_samples, "query": max(num_samples // 4, 8)}
        n = sizes.get("train" if mode == "train" else ("query" if mode in ("query", "test") else "gallery"),
                      num_samples)
        super().__init__(
            num_samples=n if mode in ("train", "query", "test") else num_samples,
            seed=seed * 10 + self._MODE_SEEDS.get(mode, 0),
            mode=mode,
            **kw,
        )


class SyntheticVOCDataset(SyntheticDataset):
    """VOC2012Hashing-shaped synthetic protocol for protocol-scale dress
    rehearsals on hardware without the real data: train == database ==
    gallery (``num_train``, default VOC's 5717), query/val/test a disjoint
    draw (``num_query``, default VOC's 5823), 20-dim float multi-label
    vectors (reference ``main/datasets/voc.py:33-38, 55-70``: train is the
    retrieval database, val is the query set).  Images carry a
    class-dependent frequency pattern, so retrieval mAP genuinely improves
    with training."""

    def __init__(self, num_train: int = 5717, num_query: int = 5823,
                 mode: str = "train", seed: int = 0, **kw):
        is_query = mode in ("query", "test", "val")
        kw.setdefault("multi_label", True)
        kw.setdefault("num_label_dims", 20)
        kw.setdefault("num_classes", 20)
        kw.pop("num_samples", None)
        super().__init__(
            num_samples=int(num_query) if is_query else int(num_train),
            seed=seed * 10 + (1 if is_query else 0),
            mode=mode,
            **kw,
        )
