"""Object factory (reference: main/getter.py ``Getter``).

Same responsibilities — transforms, datasets, samplers, model, losses,
optimizers, XBM memory — but against explicit registries instead of
``getattr``-on-module, plus the state initialisation that replaces the
reference's implicit torch module state.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax

from irw_tpu.data.registry import QUERY_GALLERY_DATASETS, get_dataset
from irw_tpu.engine.optimizers import build_optimizers
from irw_tpu.engine.train_state import TrainState
from irw_tpu.engine.xbm import XBM
from irw_tpu.losses import build_losses
from irw_tpu.models import get_model
from irw_tpu.samplers import get_sampler
from irw_tpu.transforms import build_transforms
from irw_tpu.utils import LOGGER


class Getter:
    """Build every training object from the composed config."""

    def get_transform(self, transform_config):
        """transform config: {train: {...}, test: {...}} ordered name→kwargs
        (getter.py:25-35)."""
        train_cfg = transform_config.get("train") if transform_config else None
        test_cfg = transform_config.get("test") if transform_config else None
        return build_transforms(train_cfg or {}), build_transforms(test_cfg or {})

    def get_dataset(self, dataset_config):
        """Returns (train_dataset, eval_datasets dict) — eval side includes
        'test' (query/gallery dict for the hashing/InShop families,
        getter.py:168-233)."""
        name = dataset_config["name"]
        kwargs = dict(dataset_config.get("kwargs") or {})
        kwargs.pop("mode", None)
        train_ds = get_dataset(name, mode="train", **kwargs)
        if name in QUERY_GALLERY_DATASETS:
            test = {
                "query": get_dataset(name, mode="query", **kwargs),
                "gallery": get_dataset(name, mode="gallery", **kwargs),
            }
        else:
            try:
                test = get_dataset(name, mode="test", **kwargs)
            except Exception:
                test = train_ds
        # optional distractor gallery augmentation (evaluate.py:101-135)
        distractor_cfg = dataset_config.get("distractor")
        if distractor_cfg:
            if not isinstance(test, dict):
                test = {"query": test, "gallery": test}
            test["distractor"] = get_dataset(
                distractor_cfg["name"],
                mode=distractor_cfg.get("mode", "gallery"),
                **dict(distractor_cfg.get("kwargs") or {}),
            )
        return train_ds, {"test": test}

    def get_sampler(self, dataset, sampler_config):
        name = sampler_config["name"]
        kwargs = dict(sampler_config.get("kwargs") or {})
        return get_sampler(name, dataset, **kwargs)

    def get_model(self, model_config):
        name = model_config["name"]
        kwargs = dict(model_config.get("kwargs") or {})
        LOGGER.info(f"building model {name} ({kwargs})")
        return get_model(name, **kwargs)

    def get_loss(self, loss_config):
        return build_losses(loss_config)

    def get_optimizer(self, params, optimizer_config, frozen_collections=()):
        return build_optimizers(
            list(optimizer_config), params, frozen_collections=frozen_collections
        )

    def get_loss_optimizer(self, loss_config):
        """Per-loss internal optimizers (the reference gave each proxy loss
        its own AdamW with its own hyperparams, hash_loss.py:29-31): one
        ``optax.multi_transform`` over the loss-params tree, keyed by loss
        index, honoring each entry's nested ``kwargs.optimizer`` config."""

        def make_tx(opt_cfg):
            kw = dict((opt_cfg or {}).get("kwargs") or {})
            # reference arcface.yaml keys lr/weight_decay at the top level
            for k in ("lr", "weight_decay", "momentum"):
                if k not in kw and (opt_cfg or {}).get(k) is not None:
                    kw[k] = opt_cfg[k]
            lr = kw.pop("lr", 1e-4)
            wd = kw.pop("weight_decay", 1e-4)
            name = (opt_cfg or {}).get("name", "AdamW")
            if name == "Adam":
                return optax.adam(lr)
            if name == "SGD":
                return optax.sgd(lr, momentum=kw.get("momentum"))
            return optax.adamw(lr, weight_decay=wd)

        entries = list(loss_config or [])
        transforms = {
            str(idx): make_tx((entry.get("kwargs") or {}).get("optimizer"))
            for idx, entry in enumerate(entries)
        }
        if not transforms:
            return optax.adamw(1e-4, weight_decay=1e-4)

        def label_tree(loss_params):
            # loss_params: {loss idx -> param subtree}; label every leaf
            # under idx with idx
            return {
                key: jax.tree_util.tree_map(lambda _: key, sub)
                for key, sub in loss_params.items()
            }

        return optax.multi_transform(transforms, label_tree)

    def get_memory(self, memory_config, embedding_dim: int, label_shape=()):
        """Reference memory presets (config/memory/*.yaml) keep ``weight`` and
        ``activate_after`` at the top level with {size, unique} in kwargs;
        ``name: null`` / ``size: null`` means no memory."""
        if not memory_config or not memory_config.get("name", "XBM"):
            return None
        kwargs = dict(memory_config.get("kwargs") or memory_config)
        kwargs.pop("name", None)
        if kwargs.get("size") in (None, 0):
            return None
        return XBM(
            size=int(kwargs["size"]),
            embedding_dim=embedding_dim,
            label_shape=tuple(label_shape),
            unique=bool(kwargs.get("unique", True)),
            weight=float(kwargs.get("weight",
                                    memory_config.get("weight", 1.0) or 1.0)),
            activate_after=int(kwargs.get(
                "activate_after", memory_config.get("activate_after", 0) or 0)),
        )


def init_train_state(
    model,
    losses,
    optimizer_entries,
    loss_tx,
    sample_batch,
    device_transform=None,
    xbm: XBM | None = None,
    seed: int = 0,
) -> TrainState:
    """Initialise params + every optimizer/loss/XBM state from one sample
    batch (shape source of truth)."""
    rng = jax.random.PRNGKey(seed)
    p_rng, d_rng, b_rng, l_rng, state_rng = jax.random.split(rng, 5)

    images = jnp.asarray(sample_batch["image"])
    x = device_transform(images) if device_transform else images.astype(jnp.float32) / 255.0
    # jitted init: eager init dispatches per-op (slow on remote TPU)
    variables = jax.jit(lambda r, inp: model.init(r, inp, train=True))(
        {"params": p_rng, "dropout": d_rng, "band_drop": b_rng}, x
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    opt_states = {}
    for entry in optimizer_entries:
        target = params if entry.target is None else params[entry.target]
        opt_states[entry.name] = entry.tx.init(target)

    loss_params, loss_states = {}, {}
    for idx, (loss, _) in enumerate(losses):
        l_rng, sub = jax.random.split(l_rng)
        loss_params[str(idx)] = loss.init_params(sub)
        loss_states[str(idx)] = loss.init_state()
    loss_opt_state = loss_tx.init(loss_params)

    labels = np.asarray(sample_batch["label"])
    xbm_state = None
    if xbm is not None:
        xbm_state = xbm.init()

    return TrainState(
        params=params,
        batch_stats=batch_stats,
        opt_states=opt_states,
        loss_params=loss_params,
        loss_opt_state=loss_opt_state,
        loss_states=loss_states,
        xbm=xbm_state,
        rng=state_rng,
        step=jnp.int32(0),
        epoch=jnp.int32(0),
        model_alpha=jnp.float32(1.0),
    )
