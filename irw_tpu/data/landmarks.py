"""Landmark retrieval datasets: SfM-120k training + revisited Oxford/Paris
evaluation with easy/hard/junk ground truth.

Reference: sfm120k.py:26 (pickle db of cluster ids), revisited_dataset.py:19
(gnd pkl with per-query easy/hard/junk lists, consumed by
main/engine/landmark_evaluation.py).
"""

from __future__ import annotations

import os
import pickle

import numpy as np

from irw_tpu.data.base import BaseDataset


class SfM120kDataset(BaseDataset):
    """sfm120k.py:26-80: retrieval-SfM-120k pickle with train/val splits of
    image cids + 3D-cluster labels."""

    def __init__(self, data_dir: str, mode: str = "train", **kw):
        pkl = os.path.join(data_dir, "retrieval-SfM-120k.pkl")
        with open(pkl, "rb") as f:
            db = pickle.load(f)[mode if mode in ("train", "val") else "train"]
        cids = db["cids"]
        labels = np.asarray(db["cluster"])
        paths = [
            os.path.join(data_dir, "ims", cid[-2:], cid[-4:-2], cid[-6:-4], cid)
            for cid in cids
        ]
        super().__init__(paths, labels, mode=mode)


class RevisitedDataset(BaseDataset):
    """revisited_dataset.py:19-80: roxford5k / rparis6k with gnd easy /
    hard / junk per query.  mode 'query' serves the 70 queries, 'gallery'
    the database; ``gnd`` is kept for the landmark evaluation protocol."""

    def __init__(self, data_dir: str, city: str = "roxford5k", mode: str = "gallery", **kw):
        pkl = os.path.join(data_dir, city, f"gnd_{city}.pkl")
        with open(pkl, "rb") as f:
            cfg = pickle.load(f)
        self.city = city
        self.gnd = cfg["gnd"]
        img_dir = os.path.join(data_dir, city, "jpg")
        if mode in ("query", "test"):
            names = cfg["qimlist"]
            self.bbx = [g.get("bbx") for g in self.gnd]
        else:
            names = cfg["imlist"]
            self.bbx = None
        paths = [os.path.join(img_dir, f"{name}.jpg") for name in names]
        labels = np.arange(len(paths))  # identity labels; gnd drives eval
        super().__init__(paths, labels, mode=mode)
