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


def finalize_checkpoints(log_dir: str) -> None:
    """End-of-training barrier: commit the in-flight async save AND promote
    ``rolling.next`` → ``rolling``.  ``wait_for_checkpoints`` alone leaves
    the final save parked at ``rolling.next`` (promotion normally happens
    on the NEXT save/load), so a finished run would have no
    ``weights/rolling`` until something reads it — offline tools that
    stat the path (not via load_checkpoint) would miss it."""
    wait_for_checkpoints()
    _promote_rolling(_ckpt_dir(log_dir))


def _promote_rolling(base: str) -> None:
    """Promote a committed ``rolling.next`` async save to ``rolling``.

    Async saves never touch ``rolling`` directly: orbax's ``force=True``
    deletes the destination synchronously BEFORE the async write commits,
    so a crash mid-write would destroy the only good checkpoint (the
    crash-window bug tests/test_engine.py::test_async_checkpoint_crash_window
    guards).  Instead the async writer targets ``rolling.next`` (itself
    committed atomically by orbax via tmp-dir + rename) and this promotion
    runs the two-rename dance; every intermediate crash state leaves at
    least one complete checkpoint for ``load_checkpoint``'s fallback scan.
    """
    import shutil

    nxt = os.path.join(base, "rolling.next")
    cur = os.path.join(base, "rolling")
    old = os.path.join(base, "rolling.old")
    if not os.path.exists(nxt):
        return
    if os.path.exists(old):
        shutil.rmtree(old)
    if os.path.exists(cur):
        os.rename(cur, old)
    os.rename(nxt, cur)
    if os.path.exists(old):
        shutil.rmtree(old)


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
        _promote_rolling(base)  # commit the previous async save first
        # write to rolling.next, NOT rolling: force=True would delete the
        # last good checkpoint before the async write commits (crash window)
        ckptr.save(path + ".next", payload, force=True)
        if epoch_path:
            ckptr.wait_until_finished()
            _promote_rolling(base)
            ckptr.save(epoch_path, payload, force=True)
    else:
        import shutil

        # a stale rolling.next (crashed async run) must not shadow this
        # newer synchronous save at the next load's promotion scan
        nxt = path + ".next"
        if os.path.exists(nxt):
            shutil.rmtree(nxt)
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
    base = _ckpt_dir(log_dir)
    _promote_rolling(base)  # adopt a committed rolling.next if one exists
    path = os.path.join(base, "rolling")
    if not os.path.exists(path):
        # crash between the promotion renames: fall back to the displaced
        # previous save
        old = os.path.join(base, "rolling.old")
        if os.path.exists(old):
            os.rename(old, path)
        else:
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
