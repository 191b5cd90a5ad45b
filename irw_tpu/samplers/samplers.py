"""Epoch-static batch samplers.

Reference: m_per_class_sampler.py:16 (fixed samples-per-class batches from
``dataset.instance_dict``), hierarchical_sampler.py:16 (batches drawn per
super-label pair), random_sampler.py:7 (shuffled fixed-size batches,
remainder dropped).
"""

from __future__ import annotations

import numpy as np


class SamplerBase:
    def __init__(self, dataset, batch_size: int, seed: int = 0):
        self.dataset = dataset
        self.batch_size = int(batch_size)
        self.seed = seed
        self.batches: list[np.ndarray] = []

    def reshuffle(self, epoch: int = 0):
        raise NotImplementedError

    def __iter__(self):
        return iter(self.batches)

    def __len__(self):
        return len(self.batches)


class RandomSampler(SamplerBase):
    """random_sampler.py:7-36: plain shuffle, fixed batch, drop remainder."""

    def reshuffle(self, epoch: int = 0):
        rng = np.random.RandomState(self.seed + epoch)
        order = rng.permutation(len(self.dataset))
        n_batches = len(order) // self.batch_size
        self.batches = [
            order[i * self.batch_size : (i + 1) * self.batch_size]
            for i in range(n_batches)
        ]
        return self


class MPerClassSampler(SamplerBase):
    """m_per_class_sampler.py:16-73: each batch holds ``samples_per_class``
    instances of batch_size/samples_per_class distinct classes; instances
    resampled with replacement when a class is too small."""

    def __init__(self, dataset, batch_size: int, samples_per_class: int = 4, seed: int = 0, **kw):
        super().__init__(dataset, batch_size, seed)
        assert batch_size % samples_per_class == 0, (batch_size, samples_per_class)
        self.samples_per_class = samples_per_class

    def reshuffle(self, epoch: int = 0):
        rng = np.random.RandomState(self.seed + epoch)
        instance_dict = self.dataset.instance_dict
        classes = list(instance_dict.keys())
        rng.shuffle(classes)
        classes_per_batch = self.batch_size // self.samples_per_class

        # one pass over all classes per epoch, grouped into batches
        batches = []
        for start in range(0, len(classes) - classes_per_batch + 1, classes_per_batch):
            batch = []
            for cls in classes[start : start + classes_per_batch]:
                idxs = np.asarray(instance_dict[cls])
                if len(idxs) >= self.samples_per_class:
                    batch.extend(rng.choice(idxs, self.samples_per_class, replace=False))
                else:
                    batch.extend(rng.choice(idxs, self.samples_per_class, replace=True))
            batches.append(np.asarray(batch))
        self.batches = batches
        return self


class HierarchicalSampler(SamplerBase):
    """hierarchical_sampler.py:16-92: batches drawn within pairs of
    super-labels; ``batches_per_super_pair`` batches for each sampled pair,
    each batch split evenly between the two supers with
    ``samples_per_class`` per class."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        samples_per_class: int = 4,
        batches_per_super_pair: int = 10,
        nb_categories: int = 2,
        seed: int = 0,
        **kw,
    ):
        super().__init__(dataset, batch_size, seed)
        self.samples_per_class = samples_per_class
        self.batches_per_super_pair = batches_per_super_pair
        self.nb_categories = nb_categories

    def reshuffle(self, epoch: int = 0):
        rng = np.random.RandomState(self.seed + epoch)
        super_dict = self.dataset.super_dict  # super → {class → indices}
        supers = list(super_dict.keys())
        if len(supers) < self.nb_categories:
            raise ValueError("not enough super-labels for hierarchical sampling")
        per_super = self.batch_size // self.nb_categories

        batches = []
        pairs = []
        for i in range(len(supers)):
            for j in range(i + 1, len(supers)):
                pairs.append((supers[i], supers[j]))
        rng.shuffle(pairs)
        for pair in pairs:
            for _ in range(self.batches_per_super_pair):
                batch = []
                for sup in pair:
                    class_dict = super_dict[sup]
                    classes = list(class_dict.keys())
                    rng.shuffle(classes)
                    needed = per_super // self.samples_per_class
                    for cls in classes[:needed]:
                        idxs = np.asarray(class_dict[cls])
                        replace = len(idxs) < self.samples_per_class
                        batch.extend(rng.choice(idxs, self.samples_per_class, replace=replace))
                if len(batch) == self.batch_size:
                    batches.append(np.asarray(batch))
        rng.shuffle(batches)
        self.batches = batches
        return self


SAMPLERS = {
    "RandomSampler": RandomSampler,
    "MPerClassSampler": MPerClassSampler,
    "HierarchicalSampler": HierarchicalSampler,
}


def get_sampler(name: str, dataset, **kwargs):
    try:
        return SAMPLERS[name](dataset, **kwargs)
    except KeyError as exc:
        raise ValueError(f"unknown sampler {name!r}; available: {sorted(SAMPLERS)}") from exc
