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

    When the native C++ loader (irw_tpu/native) is available and the host
    pipeline is geometry-only (always true at eval time), decode + crop/
    resize/flip run in the C++ thread pool instead of PIL — augmentation
    draws are identical (HostTransform.plan consumes the rng in __call__'s
    order), and per-sample decode failures fall back to PIL.

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
        native: bool | str = "auto",
        native_fast_scale: bool | None = None,
    ):
        self.dataset = dataset
        self.batches = list(batches)
        self.host_transform = host_transform or HostTransform()
        self.num_workers = num_workers
        self.prefetch = prefetch
        self.train = train
        self.seed = seed
        self.native = native
        # DCT-scaled JPEG decode changes pixels by a few LSB vs PIL:
        # augmentation-grade, so default ON for training only — eval
        # embeddings stay bit-comparable with the PIL path (and with
        # checkpoints/baselines measured through it)
        self.native_fast_scale = (
            train if native_fast_scale is None else native_fast_scale)
        self._native_ok: bool | None = None

    def __len__(self):
        return len(self.batches)

    # ------------------------------------------------------------- native
    def _native_eligible(self) -> bool:
        if self._native_ok is None:
            from irw_tpu.data.base import BaseDataset

            ok = self.native not in (False, "off")
            ok = ok and type(self.dataset).load_image is BaseDataset.load_image
            ok = ok and getattr(self.dataset, "paths", None) is not None
            ok = ok and self.host_transform.native_plannable(self.train)
            if ok:
                from irw_tpu import native as nat

                ok = nat.available()
            self._native_ok = bool(ok)
        return self._native_ok

    def _native_batch(self, indices, rng):
        """Whole-batch native decode; None -> caller redoes the batch via
        PIL with a fresh rng (so the stream matches a pure-PIL run)."""
        from irw_tpu import native as nat

        paths, steps_list, out_size = [], [], None
        for i in indices:
            path = str(self.dataset.paths[int(i)])
            size = nat.image_size(path)
            if size is None or size[0] <= 0 or size[1] <= 0:
                # unreadable header (corrupt/exotic): PIL gives dims — and
                # the corrupt-image fallback (base.py) a black 256x256
                img = self.dataset.load_image(int(i))
                size = (img.width, img.height)
            planned = self.host_transform.plan(size[0], size[1], rng, self.train)
            if planned is None:
                return None
            steps, out_w, out_h = planned
            if out_size is None:
                out_size = (out_w, out_h)
            elif out_size != (out_w, out_h):
                return None  # ragged outputs: PIL path (np.stack fails anyway)
            paths.append(path)
            steps_list.append(steps)
        if out_size is None:
            return None
        # thread accounting: with the prefetching Python pool active
        # (num_workers > 0), up to num_workers batches decode concurrently —
        # one C++ thread per call keeps the total at num_workers instead of
        # num_workers²; the serial iterator gets the full hardware pool
        images, status = nat.load_batch(
            paths,
            [nat.pack_plan(s) for s in steps_list],
            out_size[0],
            out_size[1],
            n_threads=1 if self.num_workers > 0 else 0,
            fast_scale=self.native_fast_scale,
        )
        for j in np.nonzero(status)[0]:
            # CMYK/exotic/corrupt sample: PIL decode (with the base
            # corrupt-image tolerance), then the same geometry plan
            img = self.dataset.load_image(int(indices[int(j)]))
            images[int(j)] = self.host_transform.apply_plan_pil(
                img, steps_list[int(j)])
        return images

    def _load_batch(self, batch_idx: int, indices) -> dict:
        rng = np.random.RandomState(self.seed * 100003 + batch_idx)
        if self._native_eligible():
            native_images = self._native_batch(indices, rng)
            if native_images is not None:
                labels = self.dataset.labels[np.asarray(indices)]
                return {"label": labels, "index": np.asarray(indices),
                        "image": native_images}
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
