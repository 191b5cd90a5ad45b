"""Construction root (reference: run.py:20-236).

Builds everything from the composed config — transforms, datasets (with
optional k-fold splits), sampler, model, losses, optimizers, XBM — then
initialises or restores the train state and hands off to the engine's
epoch loop.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax

import irw_tpu
from irw_tpu.config import Config
from irw_tpu.data.base import subset
from irw_tpu.engine.checkpoint import load_checkpoint
from irw_tpu.engine.splits import get_splits
from irw_tpu.engine.train import train as engine_train
from irw_tpu.getter import Getter, init_train_state
from irw_tpu.utils import LOGGER


def run(config, base_config=None, checkpoint_dir=None, splits=None):
    from irw_tpu.utils import enable_compile_cache

    enable_compile_cache()
    if isinstance(config, dict) and not isinstance(config, Config):
        config = Config(config)
    exp = config.experience
    log_dir = os.path.join(
        os.path.expanduser(exp.get("log_dir", "experiments")),
        str(exp.get("experiment_name", "default")),
    )
    os.makedirs(log_dir, exist_ok=True)
    seed = int(exp.get("seed", 333))

    getter = Getter()
    (host_train, device_train), (host_test, device_test) = getter.get_transform(
        config.get("transform", {})
    )

    train_ds, eval_datasets = getter.get_dataset(config.dataset)

    # dataset.num_classes: null -> infer from the built dataset (the
    # ImageFolder path has no a-priori class count) and reconcile loss
    # kwargs that carry a class count — reference presets always declare it
    # explicitly, so this only fires for inferred datasets
    if config.dataset.get("num_classes") is None:
        labels = train_ds.labels
        inferred = (int(labels.shape[1]) if getattr(labels, "ndim", 1) > 1
                    else int(labels.max()) + 1)
        config.dataset["num_classes"] = inferred
        for entry in config.get("loss") or []:
            kwargs = entry.get("kwargs")
            if kwargs and kwargs.get("num_classes") not in (None, inferred):
                LOGGER.info(
                    f"loss {entry.get('name')}: num_classes "
                    f"{kwargs['num_classes']} -> {inferred} (inferred from dataset)")
                kwargs["num_classes"] = inferred

    # k-fold split support (run.py:72-84)
    kfold = exp.get("kfold", None)
    if kfold and kfold.get("use_kfold"):
        folds = get_splits(
            train_ds.labels,
            train_ds.super_labels,
            kind=kfold.get("kind", "class_disjoint"),
            n_splits=int(kfold.get("n_splits", 4)),
            seed=seed,
        )
        fold_idx = int(kfold.get("fold", 0))
        tr_idx, va_idx = folds[fold_idx]
        eval_datasets = dict(eval_datasets)
        eval_datasets["val"] = subset(train_ds, va_idx, mode="eval")
        train_ds = subset(train_ds, tr_idx, mode="train")

    sampler_cfg = config.dataset.get("sampler", {"name": "RandomSampler", "kwargs": {"batch_size": 32}})
    sampler = getter.get_sampler(train_ds, sampler_cfg)
    sampler.seed = seed
    sampler.reshuffle(0)

    model = getter.get_model(config.model)
    losses = getter.get_loss(config.get("loss", []))
    loss_tx = getter.get_loss_optimizer(config.get("loss", []))

    # one sample batch fixes all shapes
    first_batch_idx = sampler.batches[0]
    rng = np.random.RandomState(seed)
    sample_images = np.stack(
        [host_train(train_ds.load_image(int(i)), rng, True) for i in first_batch_idx]
    )
    sample_batch = {
        "image": sample_images,
        "label": train_ds.labels[np.asarray(first_batch_idx)],
        "index": np.asarray(first_batch_idx),
    }

    x = device_train(sample_batch["image"])
    variables = model.init(
        {
            "params": jax.random.PRNGKey(seed),
            "dropout": jax.random.PRNGKey(seed + 1),
            "band_drop": jax.random.PRNGKey(seed + 2),
        },
        x,
        train=True,
    )
    # frozen param groups: the model's own (frozen backbones) + the config's
    # freeze_batch_norm / freeze_pos_embedding flags (reference
    # main/utils/freeze_batch_norm.py, freeze_pos_embedding.py, applied in
    # run.py's model setup)
    from irw_tpu.utils.freezing import (
        combine, freeze_batch_norm_params, freeze_pos_embedding,
    )

    frozen_collections = tuple(getattr(model, "frozen_param_collections", ()) or ())
    if config.model.get("freeze_batch_norm"):
        frozen_collections = combine(frozen_collections, freeze_batch_norm_params())
    if config.model.get("freeze_pos_embedding"):
        frozen_collections = combine(frozen_collections, freeze_pos_embedding())

    optimizer_entries = getter.get_optimizer(
        variables["params"],
        config.get("optimizer", [{"name": "AdamW", "params": None, "kwargs": {"lr": 1e-4}}]),
        frozen_collections=frozen_collections,
    )

    # embedding dim for XBM from a forward pass
    xbm = None
    memory_cfg = config.get("memory")
    if memory_cfg:
        out = model.apply(variables, x, train=False)
        emb = out[0] if isinstance(out, tuple) else out
        label_shape = train_ds.labels.shape[1:] if train_ds.labels.ndim > 1 else ()
        xbm = getter.get_memory(memory_cfg, int(emb.shape[-1]), label_shape)

    state = init_train_state(
        model, losses, optimizer_entries, loss_tx, sample_batch,
        device_transform=device_train, xbm=xbm, seed=seed,
    )

    # resume (run.py:101-119,140-142)
    resumed = False
    if exp.get("resume") or exp.get("maybe_resume"):
        restored = load_checkpoint(log_dir, template=jax.device_get(state))
        if restored is not None:
            restored_state, meta = restored
            state = jax.tree_util.tree_map(jnp.asarray, restored_state)
            from irw_tpu.engine.train_state import TrainState

            if not isinstance(state, TrainState):
                state = TrainState(**restored_state)
            LOGGER.info(f"resumed from epoch {meta['epoch']}")
            resumed = True

    # A crashed attempt that died before its first rolling save (or a plain
    # re-run under the same experiment name) leaves a stale metrics.jsonl;
    # MetricsLogger appends, so a fresh start would log duplicate steps and
    # corrupt aggregation.  The reference never hit this because Hydra makes
    # a fresh run dir per attempt (hydra.run.dir timestamping); our fixed
    # experiment names reuse dirs, so rotate the stale file aside instead.
    if not resumed:
        stale = os.path.join(log_dir, "metrics.jsonl")
        if os.path.exists(stale):
            os.replace(stale, stale + ".stale")
            LOGGER.info("rotated stale metrics.jsonl from a previous attempt")

    config_dict = config.to_dict() if hasattr(config, "to_dict") else dict(config)

    # instrumented training (reference run.py:144-146 → train_new):
    # hooks_configs.active attaches the fixed-batch instrumentor
    instrumentor = None
    hooks_cfg = exp.get("hooks_configs") or {}
    if hooks_cfg.get("active"):
        from irw_tpu.hooks import FixedBatchInstrumentor

        instrumentor = FixedBatchInstrumentor(
            model,
            os.path.join(log_dir, "instrumentation"),
            target_epochs=tuple(hooks_cfg.get("target_epochs", (1, 5, 10, 25, 40, 50))),
        )

    if exp.get("dsch_train"):
        # DSCH protocol: α continuation + early stopping (run.py:148-213)
        from irw_tpu.engine.dsch import train_dsch

        state, metrics = train_dsch(
            model, state, losses, optimizer_entries, loss_tx, train_ds, sampler,
            eval_datasets, host_train, device_train, config_dict, log_dir,
        )
        return metrics

    state, metrics = engine_train(
        model,
        state,
        losses,
        optimizer_entries,
        loss_tx,
        train_ds,
        sampler,
        eval_datasets,
        host_train,
        device_train,
        config_dict,
        log_dir,
        xbm=xbm,
        instrumentor=instrumentor,
    )
    return metrics
