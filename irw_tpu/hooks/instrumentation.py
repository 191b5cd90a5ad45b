"""Fixed-batch feature/gradient capture."""

from __future__ import annotations

import os
import re
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from irw_tpu.utils import LOGGER

DEFAULT_TARGET_EPOCHS = (1, 5, 10, 25, 40, 50)  # train_new.py:88-131


def _default_filter(path_tuple, _value) -> bool:
    """Capture ViT block outputs and fusion-head tensors (the reference
    hooked blocks {2,5,10} of each band backbone + the fusion head,
    mbw_dino_hooks.py:28-60)."""
    path = "/".join(str(p) for p in path_tuple)
    return bool(re.search(r"Block_(2|5|10)\b|fusion|Head", path))


def capture_features(model, variables, batch, train: bool = False,
                     filter_fn: Callable | None = None, rngs=None):
    """Forward pass with intermediate capture.  Returns (output, aux,
    intermediates dict path→array)."""
    filter_fn = filter_fn or _default_filter
    out, mods = model.apply(
        variables,
        batch,
        train=train,
        rngs=rngs or {"dropout": jax.random.PRNGKey(0), "band_drop": jax.random.PRNGKey(1)},
        mutable=["intermediates", "batch_stats"],
        capture_intermediates=lambda mdl, _: True,
    )
    output, aux = out if isinstance(out, tuple) else (out, {})
    flat = {}
    inter = mods.get("intermediates", {})
    for path, value in jax.tree_util.tree_leaves_with_path(inter):
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        if filter_fn(tuple(name.split("/")), value):
            flat[name] = value
    return output, aux, flat


def capture_gradients(model, variables, batch, loss_fn, rngs=None):
    """Per-parameter gradients of ``loss_fn(output)`` — the backward-hook
    replacement (the reference dumped module grads; parameter grads carry
    the same signal per block)."""

    def f(params):
        out = model.apply(
            {**variables, "params": params},
            batch,
            train=True,
            rngs=rngs or {"dropout": jax.random.PRNGKey(0), "band_drop": jax.random.PRNGKey(1)},
            mutable=["batch_stats"],
        )[0]
        output = out[0] if isinstance(out, tuple) else out
        return loss_fn(output)

    grads = jax.grad(f)(variables["params"])
    flat = {}
    for path, value in jax.tree_util.tree_leaves_with_path(grads):
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        flat[name] = value
    return flat


class FixedBatchInstrumentor:
    """train_new.py's protocol: snapshot one batch, dump feature/grad
    captures at target epochs."""

    def __init__(self, model, out_dir: str, target_epochs=DEFAULT_TARGET_EPOCHS,
                 filter_fn: Callable | None = None):
        self.model = model
        self.out_dir = out_dir
        self.target_epochs = set(target_epochs)
        self.filter_fn = filter_fn
        self.fixed_batch = None
        os.makedirs(out_dir, exist_ok=True)

    def snapshot_batch(self, batch):
        """Keep the first batch seen (train_new.py:44-59)."""
        if self.fixed_batch is None:
            self.fixed_batch = {k: np.asarray(v) for k, v in batch.items()}
            np.savez(os.path.join(self.out_dir, "fixed_batch.npz"), **self.fixed_batch)

    def maybe_dump(self, epoch: int, variables, device_transform=None, loss_fn=None):
        if epoch not in self.target_epochs or self.fixed_batch is None:
            return None
        x = self.fixed_batch["image"]
        x = device_transform(x) if device_transform else jnp.asarray(x, jnp.float32) / 255.0
        _, aux, feats = capture_features(self.model, variables, x, train=False,
                                         filter_fn=self.filter_fn)
        payload = {f"feat/{k}": np.asarray(v) for k, v in feats.items()}
        for key, value in aux.items():
            if hasattr(value, "shape"):
                payload[f"aux/{key}"] = np.asarray(value)
        if loss_fn is not None:
            grads = capture_gradients(self.model, variables, x, loss_fn)
            payload.update({f"grad/{k}": np.asarray(v) for k, v in grads.items()})
        path = os.path.join(self.out_dir, f"analysis_epoch_{epoch}.npz")
        np.savez(path, **payload)
        LOGGER.info(f"instrumentation dump: {path} ({len(payload)} tensors)")
        return path
