"""The jitted optimization step (reference: main/engine/base_update.py).

One ``step(state, batch, hyper)`` call does what
``_batch_optimization`` + the optimizer block (:326-414) did:

- device transform (normalise + DWT/SWT — the work the reference burned
  CPU loader workers on);
- forward with explicit dropout/band-drop PRNGs;
- XBM insert + memory-aware loss contexts (:75-113);
- weighted loss sum + the fusion head's ortho aux (:130-137);
- one backward over (params, loss_params);
- global-norm grad clipping (:363-369);
- per-entry optimizer updates with warm-up gating (:372-375) and host-fed
  per-group LRs (scheduler values);
- loss-optimizer update (the reference's ``crit.step()``, :380-390) and
  per-loss ``step_update`` schedules;
- batch proxy mAP metric (batch_map.py:9-36).

Micro-batching: ``sub_batch`` wraps the backbone forward in
``jax.checkpoint`` + ``lax.scan`` over micro-batches — mathematically the
reference's GradCache two-pass scheme (:151-293) but expressed as
rematerialisation, so replay-RNG bookkeeping (:12-31) is unnecessary.

Hyper inputs (host-computed, passed as arrays → no recompilation):
``lrs`` per optimizer entry/group and the per-entry warm-up ``active``
flags.  XBM activation is a build-time flag (the loop rebuilds the step
once at the activation epoch).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
import optax

from irw_tpu.engine.optimizers import OptimizerEntry, set_group_lrs
from irw_tpu.engine.train_state import TrainState
from irw_tpu.engine.xbm import XBM
from irw_tpu.losses.base import LossContext, LossKind
from irw_tpu.utils.label_matrix import create_label_matrix


def _l2n(x):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)


def batch_proxy_map(embeddings, labels, metric: str = "cosine"):
    """Training-time self-retrieval mAP over the batch (batch_map.py:9-36):
    rank the batch against itself (self dropped), exact AP."""
    if metric == "hamming":
        sims = jnp.sign(embeddings) @ jnp.sign(embeddings).T
    else:
        e = _l2n(embeddings)
        sims = e @ e.T
    b = sims.shape[0]
    eye = jnp.eye(b, dtype=sims.dtype)
    sims = sims - 1e9 * eye
    rel = create_label_matrix(labels) * (1.0 - eye)
    order = jnp.argsort(-sims, axis=1)
    ranked_rel = jnp.take_along_axis(rel, order, axis=1)
    ranks = jnp.arange(1, b + 1, dtype=sims.dtype)
    cum = jnp.cumsum(ranked_rel, axis=1)
    ap = jnp.sum((cum / ranks) * ranked_rel, axis=1) / jnp.maximum(rel.sum(1), 1.0)
    valid = rel.sum(1) > 0
    return jnp.sum(jnp.where(valid, ap, 0.0)) / jnp.maximum(valid.sum(), 1.0)


def build_train_step(
    model,
    losses: Sequence[tuple],  # [(loss, weight)]
    optimizer_entries: Sequence[OptimizerEntry],
    loss_tx: optax.GradientTransformation,
    xbm: XBM | None = None,
    device_transform: Callable | None = None,
    clip_grad: float | None = None,
    sub_batch: int | None = None,
    proxy_map_metric: str = "cosine",
    frozen_collections: Sequence[str] = (),
    xbm_active: bool = False,
    adaptive_weights: bool = False,
    adaptive_head_key: str = "HashHead",
    apply_fn: Callable | None = None,
):
    """Returns ``step(state, batch, hyper) -> (state, metrics)`` ready for
    jit/pjit.  ``batch``: image (B,H,W,3)/(B,S,h,w,3) float or uint8,
    label, index."""

    losses = list(losses)

    # does the model take the continuation alpha? (ResNetHashingAlpha /
    # ResNet50Mod — resnet_ce.py:81, :180)
    import inspect

    takes_alpha = "alpha" in inspect.signature(model.__call__).parameters

    def forward(params, batch_stats, rng, images, alpha):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        r1, r2 = jax.random.split(rng)
        kwargs = {"train": True}
        if takes_alpha:
            kwargs["alpha"] = alpha
        out, new_vars = (apply_fn or model.apply)(
            variables,
            images,
            rngs={"dropout": r1, "band_drop": r2},
            mutable=["batch_stats"],
            **kwargs,
        )
        output, aux = out if isinstance(out, tuple) else (out, {})
        return output, aux, new_vars.get("batch_stats", {})

    def forward_microbatched(params, batch_stats, rng, images, alpha):
        """remat+scan micro-batching: embeddings of all micro-batches with
        activations rematerialised in backward (GradCache equivalent,
        base_update.py:151-293).

        Reference-faithful semantics:
        - ragged tails are carried as one extra (smaller) micro-batch; a
          tail of exactly 1 sample is merged into the previous chunk
          (``_split_into_microbatches``, base_update.py:34-49);
        - scalar aux outputs (the fusion ortho loss) are size-weighted
          averaged across micro-batches (base_update.py:272-283) — exact
          for parameter-only ortho terms, a weighted average otherwise;
        - batch-dim'd aux tensors are re-concatenated in batch order.
        """
        b = images.shape[0]
        sb = min(int(sub_batch), b)
        if sb >= b:
            return forward(params, batch_stats, rng, images, alpha)

        n_full, tail = divmod(b, sb)
        # merge a size-1 tail into the last chunk; otherwise the tail is its
        # own (smaller) micro-batch processed after the uniform scan
        n_scan = n_full - 1 if tail == 1 else n_full
        rest = b - n_scan * sb  # size of the final non-uniform chunk (0 if none)
        rngs = jax.random.split(rng, n_scan + (1 if rest else 0))

        rematted = jax.checkpoint(lambda p, bs, r, im: forward(p, bs, r, im, alpha))

        scan_imgs = images[: n_scan * sb].reshape((n_scan, sb) + images.shape[1:])

        def body(carry_bs, inp):
            r, im = inp
            out, aux, new_bs = rematted(params, carry_bs, r, im)
            return new_bs, (out, aux)

        new_bs, (outs, auxs) = jax.lax.scan(
            body, batch_stats, (rngs[:n_scan], scan_imgs)
        )

        tail_out = tail_aux = None
        if rest:
            tail_out, tail_aux, new_bs = rematted(
                params, new_bs, rngs[-1], images[n_scan * sb :]
            )

        def merge_out(stacked, tail_val):
            flat = stacked.reshape((n_scan * sb,) + stacked.shape[2:])
            if tail_val is not None:
                flat = jnp.concatenate([flat, tail_val], axis=0)
            return flat

        if rest:
            output = jax.tree_util.tree_map(merge_out, outs, tail_out)
        else:
            output = jax.tree_util.tree_map(lambda s: merge_out(s, None), outs)

        def merge_aux(stacked, tail_val):
            """stacked: (n_scan, ...) per-chunk values; tail_val: tail chunk's."""
            if stacked.ndim == 1:  # per-chunk scalar → size-weighted average
                s = jnp.sum(stacked) * sb
                if tail_val is not None:
                    s = s + tail_val * rest
                return s / b
            if stacked.ndim >= 2 and stacked.shape[1] == sb:
                flat = stacked.reshape((n_scan * sb,) + stacked.shape[2:])
                if tail_val is not None:
                    flat = jnp.concatenate([flat, tail_val], axis=0)
                return flat
            return stacked[-1] if tail_val is None else tail_val

        aux = {
            k: merge_aux(v, None if tail_aux is None else tail_aux.get(k))
            for k, v in auxs.items()
        }
        aux.setdefault("ortho_loss", jnp.float32(0.0))
        return output, aux, new_bs

    use_xbm = xbm is not None and xbm_active  # static: engine rebuilds the
    # step once when the memory activates (activate_after)
    if use_xbm and not any(
        l.kind == LossKind.SCORES or getattr(l, "accepts_refs", False)
        for l, _ in losses
    ):
        from irw_tpu.utils import LOGGER

        LOGGER.warning(
            "XBM memory is configured but no loss consumes it "
            f"({[type(l).__name__ for l, _ in losses]} are neither "
            "score-based nor ref-aware) — the memory term is inert"
        )

    def compute_losses(output, aux, labels, xbm_state, loss_params, loss_states,
                       ortho_scale=None):
        is_branches = isinstance(output, (list, tuple))
        emb = None if is_branches else output

        ref_emb = ref_labels = mem_valid = None
        if use_xbm and emb is not None:
            mem_emb, mem_labels, mem_valid = xbm.contents(xbm_state)
            mem_emb = jax.lax.stop_gradient(mem_emb)
            # invalid slots: zero embedding + inert label; SCORES losses get
            # the validity mask applied in score space (far-negative scores)
            # so empty slots don't act as mid-ranked negatives
            ref_emb = mem_emb * mem_valid[:, None]
            if mem_labels.ndim == 1:
                ref_labels = jnp.where(mem_valid, mem_labels, -1)
            else:
                ref_labels = mem_labels * mem_valid[:, None]

        ctx_base = LossContext(labels=labels, train=True)
        total = jnp.float32(0.0)
        new_states = {}
        parts = {}
        # individual loss terms with 'adaptative'-mode pre-scales (memory
        # terms keep their xbm weight even under adaptive re-weighting,
        # base_update.py:109-112)
        vec_terms = []
        for idx, (loss, weight) in enumerate(losses):
            key = str(idx)
            # --- batch term (always; base_update.py:83-94) ---
            if loss.kind == LossKind.BRANCHES:
                ctx = dataclasses.replace(ctx_base, branches=list(output))
            elif loss.kind == LossKind.LOGITS:
                logits = output if not is_branches else output[-1]
                ctx = dataclasses.replace(ctx_base, embeddings=logits)
            elif loss.kind == LossKind.SCORES:
                # RAW dot products like the reference (base_update.py:93
                # scores = torch.mm(di, di.t())) — nets that L2-normalize
                # their output (RetrievalNet) yield cosine automatically;
                # normalizing here would silently rescale the similarity
                # space for non-normalized (hashing) outputs
                ctx = dataclasses.replace(
                    ctx_base,
                    scores=emb @ emb.T,
                    label_matrix=create_label_matrix(labels),
                    embeddings=emb,
                )
            else:  # EMBEDDINGS
                ctx = dataclasses.replace(
                    ctx_base,
                    embeddings=emb if emb is not None else output[0],
                )
            value, new_state = loss(ctx, loss_params.get(key), loss_states.get(key))
            value = jnp.asarray(value)
            if value.ndim > 0:
                value = value.mean()
            total = total + weight * value
            parts[f"loss_{idx}_{type(loss).__name__}"] = value
            vec_terms.append(value)
            new_states[key] = new_state

            # --- memory term (base_update.py:88-97, 106-113): separate loss
            # vs the XBM contents, scaled by weight * memory.weight.
            # EMBEDDINGS kind: only for ref-aware losses (accepts_refs) —
            # for the rest a "memory" call would ignore ref_embeddings and
            # exactly duplicate the batch term, silently rescaling the loss
            # by (1 + weight·xbm.weight); the reference would TypeError on
            # the extra positional args instead ---
            mem_kinds = ((LossKind.SCORES, LossKind.EMBEDDINGS)
                         if getattr(loss, "accepts_refs", False)
                         else (LossKind.SCORES,))
            if ref_emb is not None and loss.kind in mem_kinds:
                if loss.kind == LossKind.SCORES:
                    mem_scores = emb @ ref_emb.T  # raw, base_update.py:78
                    # push invalid slots far below any real score
                    mem_scores = jnp.where(mem_valid[None, :], mem_scores,
                                           -1e9)
                    mctx = dataclasses.replace(
                        ctx_base,
                        scores=mem_scores,
                        label_matrix=create_label_matrix(labels, ref_labels),
                        embeddings=emb,
                    )
                else:
                    mctx = dataclasses.replace(
                        ctx_base,
                        embeddings=emb,
                        ref_embeddings=ref_emb,
                        ref_labels=ref_labels,
                    )
                mem_value, _ = loss(mctx, loss_params.get(key), loss_states.get(key))
                mem_value = jnp.asarray(mem_value)
                if mem_value.ndim > 0:
                    mem_value = mem_value.mean()
                total = total + weight * xbm.weight * mem_value
                parts[f"loss_{idx}_memory_{type(loss).__name__}"] = mem_value
                vec_terms.append(xbm.weight * mem_value)

        ortho = aux.get("ortho_loss", jnp.float32(0.0))
        # the UNscaled constraint violation (pre-ortho_weight AND
        # pre-ortho_scale, emitted by the fusion head): observable at λ=0
        # too, so λ ablations can read the dose-response in constraint space
        # even when the task metric is insensitive (hard-CPU λ study, r4).
        # Heads without a raw term fall back to the (scaled) ortho_loss.
        parts["ortho_raw"] = aux.get("ortho_raw", ortho)
        if ortho_scale is not None:
            # runtime λ (experience.ortho_scale, fed through ``hyper`` as an
            # array): multiplies the fusion head's ortho penalty WITHOUT
            # baking the value into the compiled program — λ sweeps then
            # share one XLA compilation instead of paying ~30 min per value
            ortho = ortho * ortho_scale
        total = total + ortho
        parts["ortho_loss"] = ortho
        vec = jnp.stack(vec_terms + [ortho])
        return total, (parts, new_states, vec)

    def step(state: TrainState, batch: dict, hyper: dict):
        rng, step_rng = jax.random.split(state.rng)
        images = batch["image"]
        if device_transform is not None:
            images = device_transform(images)
        elif images.dtype == jnp.uint8:
            images = images.astype(jnp.float32) / 255.0
        labels = batch["label"]
        indices = batch.get("index")

        fwd = forward_microbatched if sub_batch else forward

        def loss_fn(params, loss_params):
            output, aux, new_bs = fwd(
                params, state.batch_stats, step_rng, images, state.model_alpha
            )
            # XBM insert BEFORE building refs (memory.py:51-60 inserts then
            # returns the full memory including the current batch)
            xbm_state = state.xbm
            emb_for_mem = output if not isinstance(output, (list, tuple)) else output[0]
            if xbm is not None:
                xbm_state = xbm.update(
                    state.xbm, jax.lax.stop_gradient(emb_for_mem), labels, indices
                )
            total, (parts, new_loss_states, vec) = compute_losses(
                output, aux, labels, xbm_state, loss_params, state.loss_states,
                ortho_scale=hyper.get("ortho_scale"),
            )
            return total, (parts, new_loss_states, new_bs, xbm_state, emb_for_mem, vec)

        if not adaptive_weights:
            (total, (parts, new_loss_states, new_bs, new_xbm, emb, _vec)), grads = (
                jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)(
                    state.params, state.loss_params
                )
            )
            param_grads, loss_grads = grads
        else:
            # 'adaptative' re-weighting (base_update.py:115-128): per-loss
            # gradients via one forward + N pullbacks; each loss is scaled
            # by mean(head-grad-norms)/its own head-grad-norm, and the final
            # gradient is the weighted sum of the per-loss gradients.
            # The per-term vector comes pre-scaled from compute_losses
            # (memory terms carry their xbm weight, base_update.py:109-112).
            def loss_vec_fn(params, loss_params):
                total_unused, aux_out = loss_fn(params, loss_params)
                return aux_out[5], aux_out

            vec, vjp_fn, (parts, new_loss_states, new_bs, new_xbm, emb, _vec) = jax.vjp(
                loss_vec_fn, state.params, state.loss_params, has_aux=True
            )
            n_vec = vec.shape[0]
            per_loss = [vjp_fn(jax.nn.one_hot(i, n_vec)) for i in range(n_vec)]

            def head_norm(g):
                # resolve the head scope at trace time: the reference used
                # net.fc.parameters() which always exists (base_update.py:
                # 118) — if the configured key matches nothing, fall back
                # through common head names rather than silently degrading
                # every weight to 1.0 (sqrt(eps)/sqrt(eps))
                names = ["/".join(str(getattr(p, "key", p)) for p in path)
                         for path, _ in jax.tree_util.tree_leaves_with_path(g)]
                key = adaptive_head_key
                if not any(key in n for n in names):
                    for cand in ("HashHead", "hash_fc", "fc", "head",
                                 "projection"):
                        if any(cand in n for n in names):
                            key = cand
                            break
                    else:
                        key = ""  # match everything: global grad norm
                leaves = []
                for path, leaf in jax.tree_util.tree_leaves_with_path(g):
                    name = "/".join(str(getattr(p, "key", p)) for p in path)
                    if key in name:
                        leaves.append(jnp.sum(leaf**2))
                return jnp.sqrt(sum(leaves) + 1e-12)

            norms = jnp.stack([head_norm(g[0]) for g in per_loss[:-1]])
            weights = jax.lax.stop_gradient(norms.mean() / (norms + 1e-12))
            weights = jnp.concatenate([weights, jnp.ones((1,))])  # ortho unweighted
            param_grads = jax.tree_util.tree_map(
                lambda *gs: sum(w * g for w, g in zip(weights, gs)),
                *[g[0] for g in per_loss],
            )
            loss_grads = jax.tree_util.tree_map(
                lambda *gs: sum(w * g for w, g in zip(weights, gs)),
                *[g[1] for g in per_loss],
            )
            total = jnp.sum(vec * weights)
            for i in range(n_vec - 1):
                parts[f"adaptive_weight_{i}"] = weights[i]

        # zero out frozen collections (frozen backbones — getter builds this
        # from model.frozen_param_collections)
        if frozen_collections:
            def zero_frozen(path, g):
                path_str = "/".join(str(getattr(p, "key", p)) for p in path)
                if any(fc in path_str for fc in frozen_collections):
                    return jnp.zeros_like(g)
                return g

            param_grads = jax.tree_util.tree_map_with_path(zero_frozen, param_grads)

        grad_norm = optax.global_norm(param_grads)
        if clip_grad:
            scale = jnp.minimum(1.0, clip_grad / (grad_norm + 1e-6))
            param_grads = jax.tree_util.tree_map(lambda g: g * scale, param_grads)

        # per-entry optimizer updates with warm-up gating
        new_params = state.params
        new_opt_states = dict(state.opt_states)
        for entry in optimizer_entries:
            opt_state = set_group_lrs(state.opt_states[entry.name], hyper["lrs"][entry.name])
            if entry.target is None:
                sub_params, sub_grads = new_params, param_grads
            else:
                sub_params, sub_grads = new_params[entry.target], param_grads[entry.target]
            updates, updated_opt = entry.tx.update(sub_grads, opt_state, sub_params)
            active = hyper["active"][entry.name]
            updates = jax.tree_util.tree_map(
                lambda u: jnp.where(active, u, jnp.zeros_like(u)), updates
            )
            updated_opt = jax.tree_util.tree_map(
                lambda new, old: jnp.where(active, new, old), updated_opt, opt_state
            )
            applied = optax.apply_updates(sub_params, updates)
            if entry.target is None:
                new_params = applied
            else:
                new_params = {**new_params, entry.target: applied}
            new_opt_states[entry.name] = updated_opt

        # loss-internal optimizer (crit.step())
        new_loss_params = state.loss_params
        new_loss_opt = state.loss_opt_state
        if len(jax.tree_util.tree_leaves(state.loss_params)) > 0:
            l_updates, new_loss_opt = loss_tx.update(
                loss_grads, state.loss_opt_state, state.loss_params
            )
            new_loss_params = optax.apply_updates(state.loss_params, l_updates)

        # per-batch loss schedules (HashNet continuation counter)
        stepped_states = {}
        for idx, (loss, _) in enumerate(losses):
            key = str(idx)
            stepped_states[key] = loss.step_update(new_loss_states.get(key) or {})

        metrics = {
            "total_loss": total,
            "grad_norm": grad_norm,
            "batch_map": batch_proxy_map(emb, labels, proxy_map_metric)
            if emb is not None and emb.ndim == 2
            else jnp.float32(0.0),
            **parts,
        }

        new_state = dataclasses.replace(
            state,
            params=new_params,
            batch_stats=new_bs,
            opt_states=new_opt_states,
            loss_params=new_loss_params,
            loss_opt_state=new_loss_opt,
            loss_states=stepped_states,
            xbm=new_xbm,
            rng=rng,
            step=state.step + 1,
        )
        return new_state, metrics

    return step
