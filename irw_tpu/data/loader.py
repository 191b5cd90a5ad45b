"""Threaded host loader: decode + resize ONLY, prefetch to device.

The reference's DataLoader workers decoded, augmented, normalised AND ran
the per-sample CPU wavelet transform (SURVEY §3.1 ★HOT).  Here the host does
the minimum (JPEG decode + resize + crop/flip → uint8 HWC) and everything
numeric happens on device inside the jitted step — the "host never touches
decoded pixels after load" rule of SURVEY §7 step 3.
"""

from __future__ import annotations

import concurrent.futures as futures
import queue
import threading

import numpy as np

from irw_tpu.transforms.pipeline import HostTransform


class EpochLoader:
    """Iterate the sampler's batch index lists, decoding batches in a thread
    pool with a bounded prefetch queue.

    Yields dicts: image (B, H, W, 3) uint8, label, index (gallery positions
    for XBM keying — replaces the reference's path-keyed memory dict,
    memory.py:37-40).
    """

    def __init__(
        self,
        dataset,
        batches,
        host_transform: HostTransform | None = None,
        num_workers: int = 8,
        prefetch: int = 4,
        train: bool = True,
        seed: int = 0,
    ):
        self.dataset = dataset
        self.batches = list(batches)
        self.host_transform = host_transform or HostTransform()
        self.num_workers = num_workers
        self.prefetch = prefetch
        self.train = train
        self.seed = seed

    def __len__(self):
        return len(self.batches)

    def _load_batch(self, batch_idx: int, indices) -> dict:
        rng = np.random.RandomState(self.seed * 100003 + batch_idx)
        samples = [
            self.host_transform(self.dataset.load_image(int(i)), rng, self.train)
            for i in indices
        ]
        labels = self.dataset.labels[np.asarray(indices)]
        out = {"label": labels, "index": np.asarray(indices)}
        if samples and isinstance(samples[0], list):
            # multi-crop: group same-shaped crops (SwAV branch)
            n_crops = len(samples[0])
            for c in range(n_crops):
                out[f"crop_{c}"] = np.stack([s[c] for s in samples])
            out["image"] = out["crop_0"]  # global crop doubles as the default view
        else:
            out["image"] = np.stack(samples)
        return out

    def __iter__(self):
        if self.num_workers <= 0:
            for b_idx, indices in enumerate(self.batches):
                yield self._load_batch(b_idx, indices)
            return

        out_q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        sentinel = object()

        def producer():
            with futures.ThreadPoolExecutor(self.num_workers) as pool:
                pending = []
                for b_idx, indices in enumerate(self.batches):
                    pending.append(pool.submit(self._load_batch, b_idx, indices))
                    # bounded in-flight window: queue puts block when full
                    if len(pending) >= self.prefetch:
                        out_q.put(pending.pop(0).result())
                for fut in pending:
                    out_q.put(fut.result())
            out_q.put(sentinel)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        while True:
            item = out_q.get()
            if item is sentinel:
                break
            yield item
        thread.join()
