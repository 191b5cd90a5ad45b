"""Fast-eval subset (reference: main/engine/batch_map.py:39-62).

The per-batch proxy mAP itself lives in
:func:`irw_tpu.engine.train_step.batch_proxy_map`.
"""

from __future__ import annotations

import numpy as np

from irw_tpu.data.base import subset


def build_fast_eval_subset(dataset, per_class: int = 5, max_classes: int | None = None,
                           seed: int = 0, min_per_class: int = 2):
    """Stratified fixed subset for cheap mid-training eval
    (batch_map.py:39-62): ``per_class`` samples from each eligible class,
    deterministic at a given seed.

    Like the reference: only classes with ≥ ``min_per_class`` members are
    eligible (a singleton would be a lone self-retrieval query that every
    metric mean silently excludes), and class order is SHUFFLED before the
    optional cap (the reference's ``rng.shuffle(eligible_classes)``) — a
    sorted()[:max_classes] cap would deterministically bias the subset to
    the lowest class ids."""
    rng = np.random.RandomState(seed)
    inst = dataset.instance_dict
    classes = sorted(c for c in inst if len(inst[c]) >= min_per_class)
    rng.shuffle(classes)
    if max_classes is not None:
        classes = classes[:max_classes]
    keep = []
    for cls in classes:
        idxs = np.asarray(inst[cls])
        take = min(per_class, len(idxs))
        keep.extend(rng.choice(idxs, take, replace=False).tolist())
    return subset(dataset, sorted(keep), mode="eval")
