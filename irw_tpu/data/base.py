"""Dataset contract (reference: main/datasets/base_dataset.py:12-116)."""

from __future__ import annotations

import os
from collections import defaultdict

import numpy as np


class BaseDataset:
    """Holds paths + labels; decoding happens in the loader.

    ``labels`` is (N,) int for single-label datasets or (N, C) float for
    multi-label (VOC/MIRFlickr/COCO — drives the matmul label matrix).
    ``super_labels`` optional (N,) int.
    """

    def __init__(self, paths, labels, super_labels=None, mode: str = "train"):
        self.paths = list(paths)
        self.labels = np.asarray(labels)
        self.super_labels = None if super_labels is None else np.asarray(super_labels)
        self.mode = mode
        self._instance_dict = None
        self._super_dict = None

    def __len__(self):
        return len(self.paths)

    @property
    def multi_label(self) -> bool:
        return self.labels.ndim > 1

    @property
    def instance_dict(self):
        """class → list of indices (base_dataset.py:63-66); for multi-label,
        class c → samples with label c active (voc.py:79-84)."""
        if self._instance_dict is None:
            d = defaultdict(list)
            if self.multi_label:
                for c in range(self.labels.shape[1]):
                    d[c] = np.where(self.labels[:, c] > 0)[0].tolist()
            else:
                for i, lbl in enumerate(self.labels):
                    d[int(lbl)].append(i)
            self._instance_dict = dict(d)
        return self._instance_dict

    @property
    def super_dict(self):
        """super → class → indices (base_dataset.py:68-75)."""
        if self._super_dict is None:
            if self.super_labels is None:
                return None
            d = defaultdict(lambda: defaultdict(list))
            for i, (lbl, sup) in enumerate(zip(self.labels, self.super_labels)):
                d[int(sup)][int(lbl)].append(i)
            self._super_dict = {s: dict(c) for s, c in d.items()}
        return self._super_dict

    @property
    def my_at_R(self) -> int:
        """max class count (base_dataset.py:57-61) — the R for mAP@R."""
        return max(len(v) for v in self.instance_dict.values())

    def load_image(self, index: int):
        """Decode one image to a PIL RGB image.  Overridden by in-memory
        datasets (synthetic, CIFAR)."""
        from PIL import Image

        try:
            with Image.open(self.paths[index]) as img:
                return img.convert("RGB")
        except Exception:  # corrupt-image tolerance (flikr_coco.py:53-56)
            from PIL import Image as _I

            return _I.new("RGB", (256, 256))

    def __getitem__(self, index: int):
        return {
            "image": self.load_image(index),
            "label": self.labels[index],
            "path": self.paths[index],
        }

    # --- helpers for subclasses ---------------------------------------------

    @staticmethod
    def remap_labels(raw_labels):
        """dense 0..K-1 relabeling preserving sort order."""
        uniq = sorted(set(raw_labels))
        lut = {lbl: i for i, lbl in enumerate(uniq)}
        return np.asarray([lut[lbl] for lbl in raw_labels])


def subset(dataset: BaseDataset, indices, mode: str | None = None) -> BaseDataset:
    """Reindexed shallow copy (reference make_subset.py:4-23)."""
    out = BaseDataset.__new__(type(dataset))
    BaseDataset.__init__(
        out,
        [dataset.paths[i] for i in indices],
        dataset.labels[np.asarray(indices)],
        None if dataset.super_labels is None else dataset.super_labels[np.asarray(indices)],
        mode or dataset.mode,
    )
    # in-memory datasets carry their pixel store along
    if hasattr(dataset, "images"):
        out.images = dataset.images[np.asarray(indices)]
    return out
