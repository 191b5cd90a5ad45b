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
    with training.

    ``hard=True`` switches to a multi-object generator built so ablations
    can *discriminate* (the default pattern saturates recall@10=1.0 and
    flattens the λ sweep — round-3 verdict):

    - **correlated co-occurrence**: labels are drawn scene-conditionally
      (6 scene topics with overlapping class preferences), mimicking VOC's
      person/chair/sofa-style correlations rather than independent picks;
    - **multi-object composition**: every active label contributes a
      *localised* oriented Gabor patch (random position / size / amplitude
      / orientation+frequency jitter) — so embeddings must represent all
      objects, not a single full-field frequency;
    - **distractor textures**: a label-independent low-frequency
      background plus band-pass noise clutter that retrieval must ignore.
    """

    def __init__(self, num_train: int = 5717, num_query: int = 5823,
                 mode: str = "train", seed: int = 0, hard: bool = False,
                 **kw):
        is_query = mode in ("query", "test", "val")
        kw.setdefault("multi_label", True)
        kw.setdefault("num_label_dims", 20)
        kw.setdefault("num_classes", 20)
        kw.pop("num_samples", None)
        n = int(num_query) if is_query else int(num_train)
        sub_seed = seed * 10 + (1 if is_query else 0)
        if not hard:
            super().__init__(num_samples=n, seed=sub_seed, mode=mode, **kw)
            return
        image_size = int(kw.get("image_size", 64))
        num_classes = int(kw["num_classes"])
        rng = np.random.RandomState(sub_seed)
        labels = self._sample_scene_labels(rng, n, num_classes)
        paths = [f"synthetic-hard://{sub_seed}/{i}" for i in range(n)]
        class_id = labels.argmax(axis=1)
        BaseDataset.__init__(self, paths, labels,
                             class_id % max(num_classes // 2, 2), mode)
        self.images = self._render(rng, labels, image_size)

    # -- scene-topic label model ------------------------------------------
    _N_SCENES = 6

    @classmethod
    def _scene_class_probs(cls, num_classes: int) -> np.ndarray:
        """Fixed (deterministic) scene→class preference matrix: each scene
        prefers an overlapping band of ~7 classes, a few 'person'-like
        classes are likely everywhere."""
        srng = np.random.RandomState(12345)
        probs = np.full((cls._N_SCENES, num_classes), 0.02)
        for s in range(cls._N_SCENES):
            start = (s * num_classes) // cls._N_SCENES
            band = [(start + j) % num_classes for j in range(7)]
            probs[s, band] = srng.uniform(0.1, 0.4, len(band))
        probs[:, :2] += 0.15  # ubiquitous classes (VOC's 'person' effect)
        return probs

    @classmethod
    def _sample_scene_labels(cls, rng, n: int, num_classes: int) -> np.ndarray:
        probs = cls._scene_class_probs(num_classes)
        scenes = rng.randint(0, cls._N_SCENES, n)
        draws = rng.rand(n, num_classes) < probs[scenes]
        labels = draws.astype(np.float32)
        # every image has at least one object: force the scene's top class
        empty = labels.sum(1) == 0
        labels[empty, probs[scenes[empty]].argmax(1)] = 1.0
        # cap at 3 objects (drop uniformly) to keep composition legible
        for i in np.nonzero(labels.sum(1) > 3)[0]:
            on = np.nonzero(labels[i])[0]
            off = rng.choice(on, int(labels[i].sum()) - 3, replace=False)
            labels[i, off] = 0.0
        return labels

    # -- renderer ----------------------------------------------------------
    def _render(self, rng, labels: np.ndarray, size: int) -> np.ndarray:
        n, num_classes = labels.shape
        yy, xx = np.mgrid[0:size, 0:size].astype(np.float32)
        # class signature: orientation × frequency grid spans low AND high
        # bands so the wavelet subbands carry complementary evidence
        thetas = np.pi * np.arange(num_classes) / num_classes
        freqs = 2 * np.pi * (2.0 + 2.5 * (np.arange(num_classes) % 5)) / size
        crng = np.random.RandomState(54321)
        colors = crng.dirichlet(np.ones(3), num_classes).astype(np.float32)
        images = np.zeros((n, size, size, 3), np.uint8)
        for i in range(n):
            # distractor background: low-freq illumination + bandpass noise
            th_b = rng.rand() * np.pi
            fb = 2 * np.pi * rng.uniform(0.5, 1.5) / size
            u = xx * np.cos(th_b) + yy * np.sin(th_b)
            img = 0.35 * np.sin(fb * u + rng.rand() * 2 * np.pi)[..., None]
            img = img + 0.2 * rng.randn(size, size, 1)
            img = np.repeat(img, 3, axis=-1).astype(np.float32)
            for c in np.nonzero(labels[i])[0]:
                cx, cy = rng.uniform(0.2, 0.8, 2) * size
                sigma = rng.uniform(0.15, 0.3) * size
                amp = rng.uniform(0.5, 1.0)
                th = thetas[c] + rng.uniform(-0.12, 0.12)
                f = freqs[c] * rng.uniform(0.85, 1.15)
                v = (xx - cx) * np.cos(th) + (yy - cy) * np.sin(th)
                env = np.exp(-((xx - cx) ** 2 + (yy - cy) ** 2)
                             / (2 * sigma ** 2))
                patch = amp * env * np.sin(f * v + rng.rand() * 2 * np.pi)
                img += patch[..., None] * (0.5 + colors[c])
            img *= rng.uniform(0.8, 1.2)  # contrast jitter
            images[i] = np.clip((img * 0.35 + 0.5) * 255, 0, 255).astype(np.uint8)
        return images
