"""Config-driven optimizers + schedulers on optax.

Reference: ``Getter.get_optimizer`` / ``get_scheduler`` (getter.py:37-152).
The config is a LIST of entries::

    - name: AdamW
      params: <top-level param subtree name, or null for everything>
      kwargs: {lr, weight_decay, ...}
      bias_kwargs: {...}          # overrides for biases / 1-D params
      modules: [{name: conv1, kwargs: {lr: ...}}]   # per-module groups
      scheduler_on_epoch: {name: CosineAnnealingLR, kwargs: {...}}
      scheduler_on_step:  {name: warmcos, kwargs: {...}}
      scheduler_on_val:   {name: ReduceLROnPlateau, kwargs: {...}, key: map}

Design: every group's learning rate is an ``inject_hyperparams`` leaf in
the optimizer state; the engine recomputes group LRs host-side each
epoch/step from the torch-semantics schedule functions below and feeds them
into the jitted step as plain scalars — no recompilation, exact scheduler
semantics, and ReduceLROnPlateau (on_val) stays a host decision like the
reference's ``schedulers["on_val"]`` (train.py:168-180).

Warm-up gating (base_update.py:372-375): entries other than
``warm_up_key`` are *skipped entirely* (moments untouched) while
``epoch < warm_up`` — implemented with a boolean gate around the update.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

# ---------------------------------------------------------------------------
# torch-semantics LR schedules: fn(counter) -> multiplicative factor
# ---------------------------------------------------------------------------


def _cosine(T_max, eta_min=0.0, base_lr=1.0, **_):
    def f(t):
        return (eta_min + (base_lr - eta_min) * (1 + math.cos(math.pi * min(t, T_max) / T_max)) / 2) / base_lr

    return f


def _multistep(milestones, gamma=0.1, **_):
    milestones = sorted(milestones)

    def f(t):
        return gamma ** sum(1 for m in milestones if t >= m)

    return f


def _step(step_size, gamma=0.1, **_):
    def f(t):
        return gamma ** (t // step_size)

    return f


def _exponential(gamma, **_):
    def f(t):
        return gamma**t

    return f


def _linear(start_factor=1.0 / 3, end_factor=1.0, total_iters=5, **_):
    def f(t):
        if t >= total_iters:
            return end_factor
        return start_factor + (end_factor - start_factor) * t / total_iters

    return f


def _warmcos(total_steps, warmup_steps=100, **_):
    """getter.py:129-141: min(linear warmup, cosine)."""

    def f(t):
        return min((t + 1) / warmup_steps, (1 + math.cos(math.pi * t / total_steps)) / 2)

    return f


def _constant(**_):
    return lambda t: 1.0


def _onecycle(max_lr, epochs=100, steps_per_epoch=100, pct_start=0.3,
              div_factor=25.0, final_div_factor=1e4, base_lr=1.0,
              total_steps=None, **_):
    """torch OneCycleLR (anneal_strategy='cos'): cosine ramp from
    max_lr/div_factor up to max_lr over pct_start of the run, then cosine
    anneal down to initial/final_div_factor.  Returned as a scale relative
    to the optimizer's base lr."""
    total = int(total_steps or (epochs * steps_per_epoch))
    initial = max_lr / div_factor
    minimum = initial / final_div_factor
    up = max(int(pct_start * total), 1)

    def interp(a, b, frac):
        return b + (a - b) * (1 + math.cos(math.pi * frac)) / 2

    def f(t):
        t = min(t, total)
        if t < up:
            lr = interp(initial, max_lr, t / up)
        else:
            lr = interp(max_lr, minimum, (t - up) / max(total - up, 1))
        return lr / base_lr

    return f


def make_schedule(config: dict, base_lr: float = 1.0) -> Callable[[int], float]:
    name = config["name"]
    kwargs = dict(config.get("kwargs") or {})
    if name == "CosineAnnealingLR":
        return _cosine(base_lr=base_lr, **kwargs)
    if name == "MultiStepLR":
        kwargs.pop("last_epoch", None)
        return _multistep(**kwargs)
    if name == "StepLR":
        return _step(**kwargs)
    if name == "ExponentialLR":
        return _exponential(**kwargs)
    if name == "LinearLR":
        return _linear(**kwargs)
    if name == "warmcos":
        return _warmcos(**kwargs)
    if name == "ConstantLR":
        return _constant()
    if name == "OneCycleLR":
        # steps_per_epoch may arrive as an unresolved/absent interpolation
        kwargs.setdefault("steps_per_epoch", 100)
        kwargs.pop("last_epoch", None)
        return _onecycle(base_lr=base_lr, **kwargs)
    if name == "SequentialLR":
        # getter.py:143-146: piecewise schedules switched at milestones
        subs = [make_schedule(s, base_lr) for s in kwargs["schedulers"]]
        milestones = list(kwargs["milestones"])

        def f(t):
            idx, offset = 0, 0
            for i, m in enumerate(milestones):
                if t >= m:
                    idx, offset = i + 1, m
            return subs[idx](t - offset)

        return f
    raise ValueError(f"unknown scheduler {name!r}")


class ReduceOnPlateau:
    """Host-side plateau scheduler for scheduler_on_val (keyed on an eval
    metric, train.py:168-180)."""

    def __init__(self, mode="max", factor=0.1, patience=10, key="map", **_):
        self.mode, self.factor, self.patience, self.key = mode, factor, patience, key
        self.best = None
        self.bad = 0
        self.scale = 1.0

    def update(self, value: float) -> float:
        better = self.best is None or (
            value > self.best if self.mode == "max" else value < self.best
        )
        if better:
            self.best, self.bad = value, 0
        else:
            self.bad += 1
            if self.bad > self.patience:
                self.scale *= self.factor
                self.bad = 0
        return self.scale


# ---------------------------------------------------------------------------
# optimizer construction
# ---------------------------------------------------------------------------

_OPTAX = {
    "Adam": optax.adam,
    "AdamW": optax.adamw,
    "SGD": optax.sgd,
    "RMSprop": optax.rmsprop,
    "Adagrad": optax.adagrad,
    "LARS": optax.lars,
    "Lamb": optax.lamb,
}


def _base_tx(name: str, kwargs: dict):
    """Only learning_rate is an injected (state-resident) hyperparameter;
    everything else is closed over statically."""
    kwargs = dict(kwargs)
    lr = kwargs.pop("lr", kwargs.pop("learning_rate", 1e-3))
    if name in ("Adam", "AdamW"):
        wd = kwargs.pop("weight_decay", 0.0 if name == "Adam" else 1e-2)
        betas = kwargs.pop("betas", (0.9, 0.999))
        eps = kwargs.pop("eps", 1e-8)

        if name == "Adam":
            # torch Adam couples L2 decay into the gradient (before the
            # moment updates) — NOT adamw's decoupled decay
            def factory(learning_rate):
                return optax.chain(
                    optax.add_decayed_weights(wd),
                    optax.adam(learning_rate, b1=betas[0], b2=betas[1], eps=eps),
                )
        else:
            def factory(learning_rate):
                return optax.adamw(
                    learning_rate, b1=betas[0], b2=betas[1], eps=eps, weight_decay=wd
                )

    elif name == "SGD":
        momentum = kwargs.pop("momentum", 0.0)
        wd = kwargs.pop("weight_decay", 0.0)
        nesterov = kwargs.pop("nesterov", False)

        def factory(learning_rate):
            return optax.chain(
                optax.add_decayed_weights(wd),
                optax.sgd(
                    learning_rate,
                    momentum=momentum if momentum else None,
                    nesterov=nesterov,
                ),
            )

    else:
        ctor = _OPTAX.get(name)
        if ctor is None:
            raise ValueError(f"unknown optimizer {name!r}; available: {sorted(_OPTAX)}")

        def factory(learning_rate):
            return ctor(learning_rate, **kwargs)

    return optax.inject_hyperparams(factory)(learning_rate=lr), lr


def _label_tree(params, modules_cfg: list, frozen_collections=()):
    """Leaf → group label: 'frozen' for frozen-collection params (excluded
    from optimization entirely — the reference's requires_grad=False,
    getter.py:53-56 skips them), '<module>' for params whose path contains a
    configured module name, else 'bias' for 1-D/bias leaves, else 'weight'
    (the reference's split_weight_bias + specific-modules logic)."""
    module_names = [m["name"] for m in modules_cfg]

    def label(path, leaf):
        path_str = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        for frozen in frozen_collections:
            if frozen in path_str:
                return "frozen"
        for mod in module_names:
            if mod in path_str:
                return mod
        if leaf.ndim <= 1 or "bias" in path_str:
            return "bias"
        return "weight"

    return jax.tree_util.tree_map_with_path(label, params)


@dataclass
class OptimizerEntry:
    name: str  # config entry target key ('net' or a submodule name)
    tx: optax.GradientTransformation
    target: str | None  # param subtree (None = all)
    group_base_lr: dict = field(default_factory=dict)  # label → base lr
    epoch_schedule: Callable | None = None
    step_schedule: Callable | None = None
    plateau: ReduceOnPlateau | None = None

    def group_lrs(self, epoch: int, step: int, val_scale: float = 1.0) -> dict:
        factor = 1.0
        if self.epoch_schedule is not None:
            # torch on_epoch semantics: scheduler.step() fires AFTER each
            # epoch (reference train.py:88-89), so epoch E trains at
            # f(E-1) — epoch 1 at the base LR, CosineAnnealing reaching
            # eta_min only after the last epoch, MultiStep milestones
            # dropping the LR the epoch AFTER the milestone
            factor *= self.epoch_schedule(max(epoch - 1, 0))
        if self.step_schedule is not None:
            factor *= self.step_schedule(step)
        if self.plateau is not None:
            factor *= self.plateau.scale
        return {label: base * factor * val_scale for label, base in self.group_base_lr.items()}


def build_optimizers(opt_config: list, params, frozen_collections=()) -> list[OptimizerEntry]:
    """Build one OptimizerEntry per config entry (getter.py:37-126).

    ``frozen_collections``: param-path substrings (e.g. a frozen backbone's
    module name) whose leaves get ``optax.set_to_zero`` — no moments are
    allocated or updated for them."""
    entries = []
    for cfg in opt_config:
        cfg = dict(cfg)
        name = cfg["name"]
        target = cfg.get("params")
        kwargs = dict(cfg.get("kwargs") or {})
        bias_kwargs = {**kwargs, **(cfg.get("bias_kwargs") or {})}
        modules_cfg = list(cfg.get("modules") or [])

        target_params = params if target is None else params[target]
        labels = _label_tree(target_params, modules_cfg, frozen_collections)

        transforms, base_lrs = {}, {}
        tx_w, lr_w = _base_tx(name, kwargs)
        transforms["weight"] = tx_w
        base_lrs["weight"] = lr_w
        tx_b, lr_b = _base_tx(name, bias_kwargs)
        transforms["bias"] = tx_b
        base_lrs["bias"] = lr_b
        for mod in modules_cfg:
            mod_kwargs = {**kwargs, **(mod.get("kwargs") or {})}
            tx_m, lr_m = _base_tx(name, mod_kwargs)
            transforms[mod["name"]] = tx_m
            base_lrs[mod["name"]] = lr_m
        if frozen_collections:
            transforms["frozen"] = optax.set_to_zero()

        tx = optax.multi_transform(transforms, labels)

        entry = OptimizerEntry(
            name=target or "net",
            tx=tx,
            target=target,
            group_base_lr=base_lrs,
        )
        if cfg.get("scheduler_on_epoch"):
            entry.epoch_schedule = make_schedule(cfg["scheduler_on_epoch"], lr_w)
        if cfg.get("scheduler_on_step"):
            entry.step_schedule = make_schedule(cfg["scheduler_on_step"], lr_w)
        if cfg.get("scheduler_on_val"):
            sval = cfg["scheduler_on_val"]
            entry.plateau = ReduceOnPlateau(key=sval.get("key", "map"), **(sval.get("kwargs") or {}))
        entries.append(entry)
    return entries


def set_group_lrs(opt_state, lrs: dict):
    """Write per-group learning rates into a multi_transform/
    inject_hyperparams optimizer state (functionally)."""

    def rewrite(masked, label):
        if label not in lrs:  # e.g. the 'frozen' set_to_zero group
            return masked
        inject = masked.inner_state  # MaskedState wraps InjectHyperparamsState
        hp = dict(inject.hyperparams)
        hp["learning_rate"] = jnp.asarray(lrs[label], dtype=jnp.float32)
        return masked._replace(inner_state=inject._replace(hyperparams=hp))

    inner = {k: rewrite(v, k) for k, v in opt_state.inner_states.items()}
    return opt_state._replace(inner_states=inner)
