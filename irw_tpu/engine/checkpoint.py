"""Orbax checkpoint/resume (reference: main/engine/chepoint.py).

Saved per epoch as ``weights/rolling`` (+ ``epoch_N`` at the save cadence):
the FULL train state (params, BN stats, every optimizer state, loss
params/states, XBM buffers, PRNG key, counters) plus the resolved config
dict and the best score — everything the reference stuffed into
rolling.ckpt (:8-62), with the PRNG key replacing the RNG-state blobs.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp

from irw_tpu.utils import LOGGER


def _ckpt_dir(log_dir: str) -> str:
    return os.path.join(os.path.abspath(log_dir), "weights")


def save_checkpoint(
    log_dir: str,
    state,
    config: dict,
    epoch: int,
    score: float | None = None,
    best_score: float | None = None,
    save_model_every: int | None = None,
):
    """Write weights/rolling every call; weights/epoch_N at the cadence
    (chepoint.py:57-62)."""
    base = _ckpt_dir(log_dir)
    payload = {
        "state": jax.device_get(state),
        "meta": {
            "config": config,
            "epoch": int(epoch),
            "score": None if score is None else float(score),
            "best_score": None if best_score is None else float(best_score),
        },
    }
    with ocp.PyTreeCheckpointer() as ckptr:
        path = os.path.join(base, "rolling")
        ckptr.save(path, payload, force=True)
        if save_model_every and epoch % save_model_every == 0:
            ckptr.save(os.path.join(base, f"epoch_{epoch}"), payload, force=True)
    LOGGER.info(f"checkpoint written: {path} (epoch {epoch})")


def load_checkpoint(log_dir: str, template=None):
    """Restore the rolling checkpoint; returns (state, meta) or None if no
    checkpoint exists (the maybe_resume probe,
    single_experiment_runner.py:58-68)."""
    path = os.path.join(_ckpt_dir(log_dir), "rolling")
    if not os.path.exists(path):
        return None
    with ocp.PyTreeCheckpointer() as ckptr:
        if template is not None:
            restored = ckptr.restore(
                path, args=ocp.args.PyTreeRestore(item={"state": template, "meta": None})
            )
        else:
            restored = ckptr.restore(path)
    LOGGER.info(f"checkpoint restored from {path}")
    return restored["state"], restored["meta"]
