"""Cross-validation splits (reference: main/engine/cross_validation_splits.py).

Three protocols, same as the reference:
- ``class_disjoint`` (:10-38): folds partition the CLASS set; val folds see
  unseen classes (the open-set retrieval protocol);
- ``hierarchical`` (:42-78): class-disjoint but stratified by super-label;
- ``closed_set`` (:81-89): plain stratified k-fold over samples.

Returns (train_indices, val_indices) per fold.
"""

from __future__ import annotations

import numpy as np


def _class_folds(classes, n_splits, rng):
    classes = np.asarray(classes)
    rng.shuffle(classes)
    return np.array_split(classes, n_splits)


def class_disjoint_splits(labels, n_splits: int = 4, seed: int = 0):
    labels = np.asarray(labels)
    rng = np.random.RandomState(seed)
    folds = _class_folds(np.unique(labels), n_splits, rng)
    out = []
    for fold in folds:
        val_mask = np.isin(labels, fold)
        out.append((np.where(~val_mask)[0], np.where(val_mask)[0]))
    return out


def hierarchical_splits(labels, super_labels, n_splits: int = 4, seed: int = 0):
    labels = np.asarray(labels)
    super_labels = np.asarray(super_labels)
    rng = np.random.RandomState(seed)
    fold_classes = [[] for _ in range(n_splits)]
    for sup in np.unique(super_labels):
        sup_classes = np.unique(labels[super_labels == sup])
        folds = _class_folds(sup_classes, n_splits, rng)
        order = rng.permutation(n_splits)
        for i, fold in enumerate(folds):
            fold_classes[order[i]].extend(fold.tolist())
    out = []
    for fold in fold_classes:
        val_mask = np.isin(labels, np.asarray(fold))
        out.append((np.where(~val_mask)[0], np.where(val_mask)[0]))
    return out


def closed_set_splits(labels, n_splits: int = 4, seed: int = 0):
    from sklearn.model_selection import StratifiedKFold

    labels = np.asarray(labels)
    if labels.ndim > 1:  # multi-label: stratify on the first active class
        strat = labels.argmax(axis=1)
    else:
        strat = labels
    skf = StratifiedKFold(n_splits=n_splits, shuffle=True, random_state=seed)
    return [(tr, va) for tr, va in skf.split(np.zeros(len(strat)), strat)]


def get_splits(labels, super_labels=None, kind: str = "class_disjoint",
               n_splits: int = 4, seed: int = 0):
    """Dispatcher (cross_validation_splits.py:92-101)."""
    if kind in ("class_disjoint", "open_set"):
        return class_disjoint_splits(labels, n_splits, seed)
    if kind == "hierarchical":
        assert super_labels is not None
        return hierarchical_splits(labels, super_labels, n_splits, seed)
    if kind == "closed_set":
        return closed_set_splits(labels, n_splits, seed)
    raise ValueError(f"unknown split kind {kind!r}")
