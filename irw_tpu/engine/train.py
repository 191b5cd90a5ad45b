"""Epoch loop (reference: main/engine/train.py).

Per epoch: advance loss/α schedules, reshuffle the sampler, run the jitted
step over the loader (capped by ``step_per_epoch``), periodic eval with
best-score tracking + plateau (on_val) schedulers, fast-eval subset,
TensorBoard/JSONL scalars, rolling checkpoint every epoch.

The RNG snapshot/restore the reference wrapped around eval
(train.py:105-140) is unnecessary: eval never touches the train PRNG key.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from irw_tpu.engine.batch_map import build_fast_eval_subset
from irw_tpu.engine.checkpoint import finalize_checkpoints, save_checkpoint
from irw_tpu.engine.evaluate import evaluate
from irw_tpu.engine.train_step import build_train_step
from irw_tpu.data.loader import EpochLoader
from irw_tpu.utils import DictAverage, LOGGER, format_time


class MetricsLogger:
    """JSONL scalars (+ TensorBoard when torch is importable)."""

    def __init__(self, log_dir: str):
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, "metrics.jsonl")
        self.tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter

            self.tb = SummaryWriter(os.path.join(log_dir, "tb"))
        except Exception:
            pass

    def log(self, step: int, scalars: dict, prefix: str = ""):
        record = {"step": int(step)}
        for key, value in scalars.items():
            if isinstance(value, (int, float, np.floating, np.integer)) or (
                hasattr(value, "ndim") and getattr(value, "ndim", 1) == 0
            ):
                name = f"{prefix}{key}"
                record[name] = float(value)
                if self.tb is not None:
                    self.tb.add_scalar(name, float(value), step)
        with open(self.path, "a") as f:
            f.write(json.dumps(record) + "\n")


def _alpha_schedule(epoch: int, cfg: dict) -> float:
    """Model tanh(α·x) continuation (ResNet50Mod.epoch_step / DSCH
    set_alpha): α_e = (1 + gamma·e)^power."""
    gamma = cfg.get("alpha_gamma", 1.0)
    power = cfg.get("alpha_power", 0.5)
    return float((1.0 + gamma * epoch) ** power)


def _apply_loss_epoch_updates(losses, state):
    new_states = dict(state.loss_states)
    for idx, (loss, _) in enumerate(losses):
        key = str(idx)
        if new_states.get(key):
            new_states[key] = loss.epoch_update(new_states[key])
    return state.replace(loss_states=new_states)


def _build_hyper(optimizer_entries, epoch, step, warm_up, warm_up_key,
                 ortho_scale=None):
    lrs, active = {}, {}
    for entry in optimizer_entries:
        lrs[entry.name] = {
            k: jnp.float32(v) for k, v in entry.group_lrs(epoch, step).items()
        }
        in_warmup = epoch < warm_up
        active[entry.name] = jnp.asarray(
            (not in_warmup) or (warm_up_key is not None and entry.name == warm_up_key)
        )
    hyper = {"lrs": lrs, "active": active}
    if ortho_scale is not None:
        # runtime λ for the fusion ortho penalty (experience.ortho_scale):
        # an array input, so λ sweeps share one compiled step
        hyper["ortho_scale"] = jnp.float32(ortho_scale)
    return hyper


def train(
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
    xbm=None,
    eval_fn=None,
    instrumentor=None,
):
    """Run the full training.  ``eval_datasets``: split name → dataset (or
    {'query','gallery'} dict).  Returns (state, metrics_by_split)."""
    exp = dict(config.get("experience", config))
    max_iter = exp.get("max_iter", 50)
    step_per_epoch = exp.get("step_per_epoch", None)
    # per-split eval cadence (reference train.py:94-101): each split has its
    # own freq; -1 disables that split entirely (even at max_iter)
    default_eval_freq = exp.get("train_eval_freq", exp.get("eval_freq", 5))

    def _split_eval_freq(split: str):
        return exp.get(f"{split}_eval_freq", default_eval_freq)

    def _should_eval(freq, epoch) -> bool:
        try:
            freq = int(freq)
        except (TypeError, ValueError):
            return False
        return freq > 0 and (epoch % freq == 0 or epoch == max_iter)
    eval_bs = exp.get("eval_bs", 256)
    principal_metric = exp.get("principal_metric", "map_level0")
    eval_split = exp.get("eval_split", "test")
    warm_up = exp.get("warm_up", 0)
    warm_up_key = exp.get("warm_up_key", None)
    clip_grad = exp.get("clip_grad", None)
    sub_batch = exp.get("sub_batch", None)
    num_workers = exp.get("num_workers", 8)
    top_k = (exp.get("evaluation") or {}).get("top_k", exp.get("top_k"))
    distance_metric = (exp.get("evaluation") or {}).get(
        "distance_metric", exp.get("distance_metric", "cosine")
    )
    fast_eval = exp.get("with_fast_eval", False)
    save_model_every = exp.get("save_model", None)
    profile_epoch = exp.get("profile_epoch", None)  # jax.profiler trace target

    logger = MetricsLogger(log_dir)
    frozen = tuple(getattr(model, "frozen_param_collections", ()) or ())
    # config-level freezing flags (reference freeze_batch_norm.py /
    # freeze_pos_embedding.py, toggled per model preset)
    model_cfg = dict(config.get("model") or {})
    if model_cfg.get("freeze_batch_norm") or model_cfg.get("freeze_pos_embedding"):
        from irw_tpu.utils.freezing import (
            combine, freeze_batch_norm_params, freeze_pos_embedding,
        )

        if model_cfg.get("freeze_batch_norm"):
            frozen = combine(frozen, freeze_batch_norm_params())
        if model_cfg.get("freeze_pos_embedding"):
            frozen = combine(frozen, freeze_pos_embedding())

    # mesh parallelism: with >1 device, shard every batch over the "data"
    # axis (XLA inserts the gradient psums); `experience.model_parallel` > 1
    # additionally splits attention heads / MLP hidden over a "model" axis
    # (Megatron-style specs, parallel/tp.py); `experience.band_parallel` > 1
    # shards the vmapped subband-branch stack over a "band" axis
    # (parallel/band.py: branch compute stays band-local, one all_gather at
    # the fusion head) — params, Adam moments and the matching activations
    # get sharded, the rest replicated
    mesh = None
    pp_apply = None
    if exp.get("use_mesh", True) and jax.device_count() > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from irw_tpu.parallel import (
            make_mesh,
            make_mesh_3d,
            mesh_shardings,
            validate_band_divisibility,
            validate_tp_divisibility,
        )

        n_dev = jax.device_count()
        mp = int(exp.get("model_parallel", 1) or 1)
        bp = int(exp.get("band_parallel", 1) or 1)
        pp = int(exp.get("pipeline_parallel", 1) or 1)
        if pp > 1:
            # GPipe pipeline stage axis (parallel/pp.py) — exclusive of
            # band/tensor parallelism (single-ViT models are pp's use case;
            # multi-branch models scale by band/tp first)
            if mp > 1 or bp > 1:
                LOGGER.warning(
                    "pipeline_parallel is exclusive of band/model parallelism"
                    " — ignoring band_parallel/model_parallel")
                mp = bp = 1
            if n_dev % pp:
                LOGGER.warning(
                    f"pipeline_parallel={pp} does not divide {n_dev} devices"
                    " — falling back to data parallelism")
                pp = 1
        if pp > 1:
            from irw_tpu.parallel import pp_apply_fn
            from irw_tpu.parallel.mesh import make_mesh_2d

            pp_mesh = make_mesh_2d(model_parallel=pp,
                                   axis_names=("data", "stage"))
            try:
                pp_apply = pp_apply_fn(
                    model, mesh=pp_mesh,
                    n_microbatches=int(exp.get("pp_microbatches", 4) or 4),
                    data_axis="data" if pp_mesh.shape["data"] > 1 else None,
                    # statically-known batch divisibility validated at
                    # construction → the fallback below, not a trace failure
                    batch_size=getattr(sampler, "batch_size", None),
                )
                mesh = pp_mesh
                LOGGER.info(
                    f"training over {n_dev} devices: "
                    f"data={pp_mesh.shape['data']} × stage={pp} (pipeline)")
            except NotImplementedError as exc:
                LOGGER.warning(f"pipeline parallelism disabled: {exc}")
                pp = 1
        if (mp > 1 or bp > 1) and n_dev % (mp * bp):
            LOGGER.warning(
                f"band_parallel×model_parallel={bp}×{mp} does not divide "
                f"{n_dev} devices — falling back to pure data parallelism")
            mp = bp = 1
        if mp > 1 or bp > 1:
            # validate the two axes independently: a model without a band
            # stack must not cost the user their (valid) tensor parallelism
            mesh = make_mesh_3d(band_parallel=bp, model_parallel=mp)
            if mp > 1:
                try:
                    validate_tp_divisibility(state.params, mesh)
                except ValueError as exc:
                    LOGGER.warning(f"tensor parallelism disabled: {exc}")
                    mp = 1
            if bp > 1:
                try:
                    validate_band_divisibility(state.params, mesh)
                except ValueError as exc:
                    LOGGER.warning(f"band parallelism disabled: {exc}")
                    bp = 1
            mesh = (make_mesh_3d(band_parallel=bp, model_parallel=mp)
                    if mp > 1 or bp > 1 else None)
        if mesh is None:
            mesh = make_mesh()
        repl = NamedSharding(mesh, P())  # used for hyperparams each step
        if mp > 1 or bp > 1:
            state = jax.device_put(
                state,
                mesh_shardings(state, mesh,
                               band_axis="band" if bp > 1 else None,
                               model_axis="model" if mp > 1 else None))
            LOGGER.info(
                f"training over {n_dev} devices: data={mesh.shape['data']}"
                + (f" × band={bp}" if bp > 1 else "")
                + (f" × model={mp} (tensor parallel)" if mp > 1 else ""))
        else:
            # replicated params (correct for dp AND for pp, whose stage
            # slicing happens inside pp_apply_fn, not in the param layout)
            state = jax.device_put(state, NamedSharding(mesh, P()))
            if pp <= 1:
                LOGGER.info(f"training data-parallel over {n_dev} devices")
        # register the mesh for the VMEM attention kernel: Mosaic custom
        # calls cannot be partitioned by GSPMD/Shardy, so the kernel runs
        # inside a jax.shard_map over this mesh (batch over "data", heads
        # over "model" under tensor parallelism, and the vmapped band dim
        # over "band" via nn.vmap(spmd_axis_name) in BandedViT).  Pipeline
        # stages keep the stock XLA attention — pp slices the block stack
        # itself (ops/vmem_attention.py docstrings).
        from irw_tpu.ops.vmem_attention import set_attention_mesh

        set_attention_mesh(
            mesh,
            batch_axes=("data",),
            head_axes=("model",) if mp > 1 else (),
            band_axes=("band",) if bp > 1 else (),
            band_fallback=(pp > 1),
        )
    try:
        adaptive = bool(exp.get("adaptive_weights", False)) or any(
            entry.get("weight") == "adaptative" for entry in (config.get("loss") or [])
        )

        def make_step(xbm_active: bool):
            step_fn = build_train_step(
                model,
                losses,
                optimizer_entries,
                loss_tx,
                xbm=xbm,
                device_transform=device_transform,
                clip_grad=clip_grad,
                sub_batch=sub_batch,
                proxy_map_metric="hamming" if distance_metric == "hamming" else "cosine",
                frozen_collections=frozen,
                xbm_active=xbm_active,
                adaptive_weights=adaptive,
                adaptive_head_key=exp.get("adaptive_head_key", "HashHead"),
                apply_fn=pp_apply,
            )
            return jax.jit(step_fn, donate_argnums=(0,))

        xbm_activate_after = getattr(xbm, "activate_after", 0) if xbm is not None else 0
        jitted = {}

        def eval_variables(current):
            variables = {"params": current.params}
            if current.batch_stats:
                variables["batch_stats"] = current.batch_stats
            return variables

        def apply_eval(variables, x):
            return model.apply(variables, x, train=False)

        run_eval = eval_fn or (
            lambda current, datasets: evaluate(
                apply_eval,
                eval_variables(current),
                datasets,
                host_transform,
                device_transform,
                batch_size=eval_bs,
                num_workers=num_workers,
                top_k=top_k,
                distance_metric=distance_metric,
            )
        )

        fast_subset = None
        if fast_eval:
            fast_subset = build_fast_eval_subset(train_dataset, per_class=5)

        best_score = -float("inf")
        metrics_by_split: dict[str, dict] = {}
        start_epoch = int(jax.device_get(state.epoch))
        # host-side mirror of state.step: fetching it from the device every
        # batch would block on the previous step and serialize async dispatch
        global_step = int(jax.device_get(state.step))

        for epoch in range(start_epoch + 1, max_iter + 1):
            t0 = time.time()
            # reference hook timing (base_update.py:409-414): crit.epoch_step()
            # and net.epoch_step(e) fire at the END of epoch e, so epoch E runs
            # with E-1 accumulated schedule steps and α = f(E-1) (epoch 1 runs
            # the init values: QuantizationLoss weight 0, tanh α = 1.0).
            # Applying the update at the START of every epoch EXCEPT the first
            # is the same sequence, but survives checkpoint-resume (the saved
            # loss_states already carry their end-of-epoch updates).
            if epoch > 1:
                state = _apply_loss_epoch_updates(losses, state)
            state = state.replace(
                epoch=jnp.int32(epoch),
                model_alpha=jnp.float32(_alpha_schedule(epoch - 1, exp)),
            )

            sampler.reshuffle(epoch)
            batches = sampler.batches
            if step_per_epoch:
                # exactly N batches.  Deliberate divergence: the reference's
                # `if i > step_per_epoch: break` (base_update.py:344-345)
                # processes indices 0..N inclusive = N+1 batches — an
                # off-by-one artifact, not replicated (like the ll_only
                # NameError and the maphashing dead accumulator)
                batches = batches[:step_per_epoch]
            loader = EpochLoader(
                train_dataset,
                batches,
                host_transform,
                num_workers=num_workers,
                train=True,
                seed=exp.get("seed", 0) + epoch,
            )

            # reference gate is INCLUSIVE: `epoch >= config.memory.activate_after`
            # (base_update.py:77,89,96); inserts happen every epoch regardless
            xbm_on = xbm is not None and epoch >= xbm_activate_after
            if xbm_on not in jitted:
                jitted[xbm_on] = make_step(xbm_on)
            step_fn = jitted[xbm_on]

            # TPU profiler trace for one epoch on demand (the reference only had
            # wall-clock phase timing, train.py:199-208; this gives real traces)
            profiling = profile_epoch is not None and epoch == profile_epoch
            if profiling:
                jax.profiler.start_trace(os.path.join(log_dir, "profile"))

            meters = DictAverage()
            data_time = step_time = 0.0  # phase timing (reference train.py:199-208)
            # Device-side metric accumulation: fetching each step's metrics
            # costs one host↔device roundtrip per step, which on a
            # high-latency link (the axon tunnel) dominates the step itself
            # (measured 0.77 s/step wall vs 0.35 s device).  Instead the scalar
            # metrics are summed on device with tiny async adds and fetched
            # ONCE per epoch — dispatch never blocks on the tunnel.
            metric_sums = None
            n_metric_steps = 0
            t_mark = time.time()
            for batch in loader:
                data_time += time.time() - t_mark
                if instrumentor is not None:
                    instrumentor.snapshot_batch(batch)
                hyper = _build_hyper(optimizer_entries, epoch, global_step,
                                     warm_up, warm_up_key,
                                     ortho_scale=exp.get("ortho_scale"))
                global_step += 1
                if mesh is not None:
                    from irw_tpu.parallel import shard_train_batch

                    batch = shard_train_batch(batch, mesh)
                    hyper = jax.device_put(hyper, repl)
                t_step = time.time()
                state, metrics = step_fn(state, batch, hyper)
                metric_sums = (metrics if metric_sums is None else
                               jax.tree_util.tree_map(jnp.add, metric_sums, metrics))
                n_metric_steps += 1
                step_time += time.time() - t_step
                t_mark = time.time()
            if metric_sums is not None:
                fetched = jax.device_get(metric_sums)
                meters.update({k: float(v) / n_metric_steps
                               for k, v in fetched.items()})

            if profiling:
                jax.block_until_ready(state.params)
                jax.profiler.stop_trace()
                LOGGER.info(f"profiler trace written to {os.path.join(log_dir, 'profile')}")

            epoch_metrics = meters.avg
            lr_now = optimizer_entries[0].group_lrs(epoch, global_step)
            epoch_metrics["lr"] = next(iter(lr_now.values()))
            epoch_metrics["data_seconds"] = data_time
            epoch_metrics["step_seconds"] = step_time
            logger.log(epoch, epoch_metrics, prefix="train/")
            LOGGER.info(
                f"epoch {epoch}/{max_iter} "
                f"loss={epoch_metrics.get('total_loss', float('nan')):.4f} "
                f"batch_map={epoch_metrics.get('batch_map', 0.0):.4f} "
                f"[{format_time(time.time() - t0)} | data {data_time:.1f}s step {step_time:.1f}s]"
            )

            if instrumentor is not None:
                # train_new's fixed-batch replay dumps (train_new.py:88-131)
                instrumentor.maybe_dump(epoch, eval_variables(state), device_transform)

            score = None
            evaluated = []
            for split, datasets in eval_datasets.items():
                if not _should_eval(_split_eval_freq(split), epoch):
                    continue
                results = run_eval(state, datasets)
                metrics_by_split[split] = results
                evaluated.append(split)
                logger.log(epoch, results, prefix=f"{split}/")
                LOGGER.info(f"  eval[{split}]: " + ", ".join(
                    f"{k}={v:.4f}" for k, v in sorted(results.items())
                    if isinstance(v, float) and "recall" not in k
                ))
            if eval_split in evaluated:
                split_metrics = metrics_by_split.get(eval_split, {})
                score = split_metrics.get(principal_metric)
                for entry in optimizer_entries:
                    if entry.plateau is not None:
                        # each plateau scheduler tracks ITS configured key
                        # (reference train.py:179-180 sch.step(metrics[split][key]))
                        tracked = split_metrics.get(
                            getattr(entry.plateau, "key", None) or principal_metric,
                            score,
                        )
                        if tracked is not None:
                            entry.plateau.update(tracked)
                if score is not None and score > best_score:
                    best_score = score
            if not evaluated and fast_subset is not None:
                results = run_eval(state, fast_subset)
                logger.log(epoch, results, prefix="fast_eval/")

            # ``checkpoint_freq``: rolling-save cadence (default 1 = the
            # reference's every-epoch rolling.ckpt, chepoint.py:57).  The save
            # synchronously fetches the full ~1 GB train state device→host —
            # ~60 s over the axon dev tunnel — so long studies on the dev
            # tunnel set 5 (aligned with eval_freq); the final epoch always
            # saves so finished-run guards see max_iter.
            ckpt_freq = max(int(exp.get("checkpoint_freq", 1) or 1), 1)
            if epoch % ckpt_freq == 0 or epoch == max_iter:
                save_checkpoint(
                    log_dir,
                    state,
                    config if isinstance(config, dict) else dict(config),
                    epoch,
                    score=score,
                    best_score=best_score if best_score > -float("inf") else None,
                    save_model_every=save_model_every,
                    async_save=bool(exp.get("async_checkpoint", True)),
                )

        # commit the final rolling save AND promote rolling.next -> rolling
        finalize_checkpoints(log_dir)
    finally:
        # un-register the process-global attention mesh on EVERY exit
        # path (failed step, eval/checkpoint error, KeyboardInterrupt —
        # not just the clean return): offline eval / a second experiment
        # in this process must not stay pinned to THIS run's mesh (the
        # kernel raises on shapes that don't divide a stale mesh)
        from irw_tpu.ops.vmem_attention import clear_attention_mesh

        clear_attention_mesh()
    return state, metrics_by_split
