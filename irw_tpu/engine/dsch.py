"""DSCH training loop (reference: main/engine/DSCH/, ~2,230 LoC vendored
"Deep Semantic-Consistent Hashing" trainer reached from run.py:148-213).

The reference DSCH loop differs from the main loop in four ways, all
reproduced here:

1. tanh-α continuation stepped per epoch (``net.set_alpha``,
   DSCH/train.py:27 → here the α schedule drives ``state.model_alpha``);
2. validation = top-k Hamming mAP between a query and a database split
   (DSCH/_utils.py mean_average_precision / validate_smart);
3. EarlyStopping on the validation metric with patience;
4. best-model restoration at the end.

Everything else (jitted step, losses, checkpoints) is shared with the main
engine — the reference instead vendored a parallel implementation.
"""

from __future__ import annotations

import os
import time
from collections import deque

import jax
import jax.numpy as jnp
import numpy as np

from irw_tpu.engine.checkpoint import finalize_checkpoints, save_checkpoint
from irw_tpu.engine.evaluate import evaluate
from irw_tpu.engine.train import MetricsLogger, _build_hyper
from irw_tpu.engine.train_step import build_train_step
from irw_tpu.data.loader import EpochLoader
from irw_tpu.utils import DictAverage, LOGGER, format_time


class EarlyStopping:
    """Patience-based stopping on a maximised metric (DSCH/_utils.py)."""

    def __init__(self, patience: int = 10, min_delta: float = 0.0):
        self.patience = patience
        self.min_delta = min_delta
        self.best = -float("inf")
        self.bad_epochs = 0
        self.should_stop = False

    def update(self, value: float) -> bool:
        if value > self.best + self.min_delta:
            self.best = value
            self.bad_epochs = 0
        else:
            self.bad_epochs += 1
            if self.bad_epochs >= self.patience:
                self.should_stop = True
        return self.should_stop


def dsch_alpha(epoch: int, gamma: float = 0.005, power: float = 0.5, step_size: int = 1):
    """DSCH α continuation: α_e = (1 + γ·⌊e/step⌋)^p — sharpening tanh
    toward sign over training (DSCH network.py set_alpha protocol)."""
    return float((1.0 + gamma * (epoch // step_size)) ** power)


def train_dsch(
    model,
    state,
    losses,
    optimizer_entries,
    loss_tx,
    train_dataset,
    sampler,
    eval_datasets: dict,
    host_transform,
    device_transform,
    config: dict,
    log_dir: str,
):
    """DSCH-protocol training: per-epoch α continuation + early stopping on
    validation Hamming mAP@topk."""
    exp = dict(config.get("experience", config))
    dsch_cfg = dict(exp.get("dsch") or {})
    max_iter = exp.get("max_iter", 50)
    step_per_epoch = exp.get("step_per_epoch", None)
    eval_freq = exp.get("train_eval_freq", 1)
    top_k = dsch_cfg.get("topk", (exp.get("evaluation") or {}).get("top_k", 5000))
    patience = dsch_cfg.get("patience", 10)
    alpha_gamma = dsch_cfg.get("alpha_gamma", 0.005)
    alpha_power = dsch_cfg.get("alpha_power", 0.5)
    num_workers = exp.get("num_workers", 8)
    eval_bs = exp.get("eval_bs", 256)

    logger = MetricsLogger(log_dir)
    stopper = EarlyStopping(patience=patience)

    step_fn = jax.jit(
        build_train_step(
            model,
            losses,
            optimizer_entries,
            loss_tx,
            device_transform=device_transform,
            clip_grad=exp.get("clip_grad"),
            proxy_map_metric="hamming",
        ),
        donate_argnums=(0,),
    )

    def apply_eval(variables, x):
        return model.apply(variables, x, train=False)

    best_state = None
    best_score = -float("inf")
    metrics_by_split: dict = {}
    best_metrics: dict = {}
    global_step = int(jax.device_get(state.step))  # one fetch, then host-side

    for epoch in range(int(jax.device_get(state.epoch)) + 1, max_iter + 1):
        t0 = time.time()
        state = state.replace(
            epoch=jnp.int32(epoch),
            model_alpha=jnp.float32(dsch_alpha(epoch, alpha_gamma, alpha_power)),
        )
        sampler.reshuffle(epoch)
        batches = sampler.batches[:step_per_epoch] if step_per_epoch else sampler.batches
        loader = EpochLoader(train_dataset, batches, host_transform,
                             num_workers=num_workers, train=True, seed=epoch)
        meters = DictAverage()
        # host-side step counter + 2-deep in-flight metric window: fetching
        # per step would block on each step's completion and serialize
        # dispatch (same fix as engine/train.py)
        inflight: deque = deque()
        for batch in loader:
            hyper = _build_hyper(optimizer_entries, epoch, global_step, 0, None,
                                  ortho_scale=exp.get("ortho_scale"))
            global_step += 1
            state, metrics = step_fn(state, batch, hyper)
            inflight.append(metrics)
            if len(inflight) > 2:
                fetched = jax.device_get(inflight.popleft())
                meters.update({k: float(v) for k, v in fetched.items()})
        while inflight:
            fetched = jax.device_get(inflight.popleft())
            meters.update({k: float(v) for k, v in fetched.items()})
        train_metrics = dict(meters.avg)
        train_metrics["model_alpha"] = dsch_alpha(epoch, alpha_gamma, alpha_power)
        logger.log(epoch, train_metrics, prefix="train/")
        LOGGER.info(
            f"[dsch] epoch {epoch}/{max_iter} α={dsch_alpha(epoch, alpha_gamma, alpha_power):.3f} "
            f"loss={meters.avg.get('total_loss', float('nan')):.4f} "
            f"[{format_time(time.time() - t0)}]"
        )

        if epoch % eval_freq == 0 or epoch == max_iter:
            variables = {"params": state.params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            for split, datasets in eval_datasets.items():
                results = evaluate(
                    apply_eval, variables, datasets, host_transform, device_transform,
                    batch_size=eval_bs, num_workers=num_workers,
                    top_k=top_k, distance_metric="hamming",
                )
                metrics_by_split[split] = results
                logger.log(epoch, results, prefix=f"{split}/")
            score = metrics_by_split.get("test", {}).get("map_level0", 0.0)
            LOGGER.info(f"[dsch] val mAP@{top_k} = {score:.4f} (best {max(best_score, score):.4f})")
            if score > best_score:
                best_score = score
                best_state = jax.device_get(state)
                best_metrics = {k: dict(v) for k, v in metrics_by_split.items()}
            save_checkpoint(log_dir, state, dict(config), epoch, score=score,
                            best_score=best_score,
                            async_save=bool(exp.get("async_checkpoint", True)))
            if stopper.update(score):
                LOGGER.info(f"[dsch] early stop at epoch {epoch} (patience {patience})")
                break

    finalize_checkpoints(log_dir)  # commit + promote the final async save
    if best_state is not None:
        # best-model restoration (DSCH/train.py): the returned metrics must
        # describe the restored best model, not the last (possibly worse) epoch
        state = jax.tree_util.tree_map(jnp.asarray, best_state)
        metrics_by_split = best_metrics
    return state, metrics_by_split
