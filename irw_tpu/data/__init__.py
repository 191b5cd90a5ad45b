"""Datasets + host loader (reference: main/datasets/, SURVEY §2.7).

Contract preserved from base_dataset.py:12-116: ``paths``, ``labels``,
optional ``super_labels``, ``instance_dict`` (class → indices),
``super_dict`` (super → class → indices), ``my_at_R`` (max class count),
``__getitem__`` → {"image", "label", "path"}.

TPU-first split of responsibilities: the host loader only decodes and
resizes to uint8 (threaded, prefetching); normalisation and the DWT/SWT run
on device inside the jitted step — the reference instead ran per-sample
pywt/lifting on CPU loader workers, its hot-path bottleneck (SURVEY §3.1).
"""

from irw_tpu.data.base import BaseDataset
from irw_tpu.data.synthetic import SyntheticDataset
from irw_tpu.data.loader import EpochLoader
from irw_tpu.data.registry import DATASET_REGISTRY, get_dataset

__all__ = [
    "BaseDataset",
    "SyntheticDataset",
    "EpochLoader",
    "DATASET_REGISTRY",
    "get_dataset",
]
