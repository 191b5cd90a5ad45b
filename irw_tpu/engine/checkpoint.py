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


_ASYNC_CKPTR: ocp.AsyncCheckpointer | None = None


def _async_checkpointer() -> ocp.AsyncCheckpointer:
    global _ASYNC_CKPTR
    if _ASYNC_CKPTR is None:
        _ASYNC_CKPTR = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
    return _ASYNC_CKPTR


def wait_for_checkpoints() -> None:
    """Block until every in-flight async save has committed to disk."""
    if _ASYNC_CKPTR is not None:
        _ASYNC_CKPTR.wait_until_finished()


def save_checkpoint(
    log_dir: str,
    state,
    config: dict,
    epoch: int,
    score: float | None = None,
    best_score: float | None = None,
    save_model_every: int | None = None,
    async_save: bool = False,
):
    """Write weights/rolling every call; weights/epoch_N at the cadence
    (chepoint.py:57-62).

    async_save=True commits the disk write on a background thread (orbax
    AsyncCheckpointer) so the epoch loop resumes immediately after the
    device→host fetch; at most one save is in flight (the next call waits
    first), and load_checkpoint barriers on in-flight saves, so readers
    never observe a half-written rolling checkpoint."""
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
    path = os.path.join(base, "rolling")
    epoch_path = (os.path.join(base, f"epoch_{epoch}")
                  if save_model_every and epoch % save_model_every == 0 else None)
    if async_save:
        ckptr = _async_checkpointer()
        ckptr.wait_until_finished()
        ckptr.save(path, payload, force=True)
        if epoch_path:
            ckptr.wait_until_finished()
            ckptr.save(epoch_path, payload, force=True)
    else:
        with ocp.PyTreeCheckpointer() as ckptr:
            ckptr.save(path, payload, force=True)
            if epoch_path:
                ckptr.save(epoch_path, payload, force=True)
    LOGGER.info(f"checkpoint written: {path} (epoch {epoch}"
                + (", async" if async_save else "") + ")")


def load_checkpoint(log_dir: str, template=None):
    """Restore the rolling checkpoint; returns (state, meta) or None if no
    checkpoint exists (the maybe_resume probe,
    single_experiment_runner.py:58-68)."""
    wait_for_checkpoints()  # never read a half-written async save
    path = os.path.join(_ckpt_dir(log_dir), "rolling")
    if not os.path.exists(path):
        return None
    with ocp.PyTreeCheckpointer() as ckptr:
        if template is not None:
            # orbax needs a structurally-matching template for every
            # subtree; meta's config dict has arbitrary shape, so recover
            # it from a raw restore first and graft it into the template
            raw = ckptr.restore(path)
            restored = ckptr.restore(
                path,
                args=ocp.args.PyTreeRestore(
                    item={"state": template, "meta": raw["meta"]}),
            )
        else:
            restored = ckptr.restore(path)
    LOGGER.info(f"checkpoint restored from {path}")
    return restored["state"], restored["meta"]
