"""Epoch-static batch samplers.

Reference: m_per_class_sampler.py:16 (class-depleting samples-per-class
batches from ``dataset.instance_dict``), hierarchical_sampler.py:16
(batches drawn per super-label combination), random_sampler.py:7 (shuffled
fixed-size batches, remainder dropped).

Each ``reshuffle(epoch)`` replays the reference's exact sequence of RNG
calls against a ``np.random.RandomState(seed + epoch)`` — so batch
construction is bit-identical to the reference given the same underlying
state (pinned by tests/test_reference_parity.py), while staying
deterministic per (seed, epoch) instead of depending on ambient
``np.random`` global state (the JAX-side determinism convention).
"""

from __future__ import annotations

import itertools

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
    """m_per_class_sampler.py:16-75: class-DEPLETING batches.

    Every class's instance pool is shuffled once per epoch; each sweep over
    the (shuffled) class order takes ``samples_per_class`` instances from
    the first ``batch_size/samples_per_class`` classes that still hold at
    least that many, flushing one batch per sweep, until a sweep cannot
    fill a batch.  So a class with 40 instances feeds up to 10 batches per
    epoch at samples_per_class=4 (cifar10 at batch 40/spc 8 yields ~1250
    batches/epoch, not one batch per class visit), and classes smaller
    than ``samples_per_class`` are never drawn (no replacement).
    """

    def __init__(self, dataset, batch_size: int, samples_per_class: int = 4,
                 seed: int = 0, **kw):
        super().__init__(dataset, batch_size, seed)
        assert samples_per_class > 1, samples_per_class
        assert batch_size % samples_per_class == 0, (batch_size, samples_per_class)
        self.samples_per_class = int(samples_per_class)

    def reshuffle(self, epoch: int = 0):
        rng = np.random.RandomState(self.seed + epoch)
        spc = self.samples_per_class
        classes_per_batch = self.batch_size // spc

        # same rng call order as the reference: shuffle each class pool in
        # dict insertion order, then the class order, then within each
        # flushed batch, then the batch list
        pools: dict = {}
        for cls, idxs in self.dataset.instance_dict.items():
            pool = list(idxs)
            rng.shuffle(pool)
            pools[cls] = pool
        classes = list(pools)
        rng.shuffle(classes)

        batches: list[list[int]] = []
        groups: list[list[int]] = []
        while True:
            for cls in classes:
                if len(pools[cls]) >= spc and len(groups) < classes_per_batch:
                    groups.append(pools[cls][:spc])
                    pools[cls] = pools[cls][spc:]
            if len(groups) != classes_per_batch:
                break
            flat = [i for grp in groups for i in grp]
            rng.shuffle(flat)
            batches.append(flat)
            groups = []

        rng.shuffle(batches)
        self.batches = [np.asarray(b) for b in batches]
        return self


class HierarchicalSampler(SamplerBase):
    """hierarchical_sampler.py:16-95: ``batches_per_super_pair`` batches for
    every ``nb_categories``-sized combination of super-labels, each batch
    split evenly between the supers; ``samples_per_class`` instances per
    class (with replacement iff the class is smaller), or ALL instances of
    a class when ``samples_per_class=0``; classes that would overflow the
    per-super quota are skipped (the reference's ``continue`` fill).

    Deliberate TPU divergence: under-filled batches (possible when a super
    runs out of classes) are dropped with a logged count — the jitted train
    step needs static batch shapes; the reference's ragged batches would
    trigger one XLA recompile per unique size.  Construction order uses
    ``sorted(set(super_labels))`` (the reference iterates ``set(...)``,
    which for its small-int supers is the same ascending order).
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        samples_per_class: int = 4,
        batches_per_super_pair: int = 10,
        nb_categories: int = 2,
        seed: int = 0,
        drop_incomplete: bool = True,
        **kw,
    ):
        super().__init__(dataset, batch_size, seed)
        self.batches_per_super_pair = int(batches_per_super_pair)
        self.nb_categories = int(nb_categories)
        assert self.batch_size % self.nb_categories == 0, (
            f"batch_size should be a multiple of {self.nb_categories}")
        self.sub_batch_len = self.batch_size // self.nb_categories
        samples_per_class = int(samples_per_class)
        if samples_per_class > 0:
            assert self.sub_batch_len % samples_per_class == 0, (
                "batch_size not a multiple of samples_per_class")
            self.samples_per_class: int | None = samples_per_class
        else:
            self.samples_per_class = None  # all instances of each class
        self.drop_incomplete = drop_incomplete
        supers = sorted(set(np.asarray(dataset.super_labels).tolist()))
        if len(supers) < self.nb_categories:
            raise ValueError("not enough super-labels for hierarchical sampling")
        self.super_pairs = list(itertools.combinations(supers, self.nb_categories))

    def reshuffle(self, epoch: int = 0):
        rng = np.random.RandomState(self.seed + epoch)
        super_dict = self.dataset.super_dict  # super → {class → indices}

        batches: list[list[int]] = []
        for combo in self.super_pairs:
            for _ in range(self.batches_per_super_pair):
                batch: list[int] = []
                for sup in combo:
                    sub_batch: list[int] = []
                    class_dict = super_dict[sup]
                    all_classes = list(class_dict)
                    rng.shuffle(all_classes)
                    for cls in all_classes:
                        instances = np.asarray(class_dict[cls])
                        k = self.samples_per_class or len(instances)
                        if len(sub_batch) + k > self.sub_batch_len:
                            continue
                        sub_batch.extend(
                            rng.choice(instances, size=k,
                                       replace=len(instances) < k).tolist())
                    batch.extend(sub_batch)
                rng.shuffle(batch)
                batches.append(batch)
        rng.shuffle(batches)

        if self.drop_incomplete:
            full = [b for b in batches if len(b) == self.batch_size]
            if len(full) != len(batches):
                from irw_tpu.utils import LOGGER

                LOGGER.warning(
                    f"HierarchicalSampler dropped {len(batches) - len(full)} "
                    f"under-filled batches (static-shape jit; the reference "
                    f"keeps ragged batches)")
            batches = full
        self.batches = [np.asarray(b) for b in batches]
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
