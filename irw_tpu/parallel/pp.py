"""Pipeline parallelism: GPipe-style microbatching over a ``stage`` mesh axis.

Completes the mesh menu (data × band × model × stage): the scanned ViT
block stack is split into S contiguous stage groups, each stage's
parameters live on its own mesh shard, and microbatches flow through a
``shard_map``-ed tick loop — stage i computes microbatch m while stage
i+1 computes m-1, activations hop stages over ``ppermute`` (ICI
neighbours).  The pipeline "bubble" is the classic (S-1)/(M+S-1) idle
fraction, so use n_microbatches >> n_stages.

The backward pass falls out of jax.grad: ``ppermute``'s transpose is the
reverse permutation, so the cotangents flow backwards through the same
schedule without any hand-written reverse pipeline.

For the 4-branch flagship, band parallelism (parallel/band.py) is the
better first axis — pp is the scale-out path for single backbones that
outgrow a chip even under tensor parallelism.  The reference has no
counterpart (single-process DataParallel only, run.py:132-134).

References: the public "How to Scale Your Model" pipelining recipe
(jax-ml.github.io/scaling-book) — mesh + shard_map + collective-permute
ticks; re-derived here for the scanned flax ViT layout.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def gpipe(stage_fn, stage_params, x_microbatches, *, mesh: Mesh,
          axis_name: str = "stage", data_axis: str | None = None):
    """Run ``stage_fn(local_params, x) -> y`` (same shape) as an S-stage
    pipeline over ``mesh``'s ``axis_name``.

    stage_params: pytree with leading axis S (stage i's slice lands on
    shard i); x_microbatches: (M, mb, ...) — outputs are (M, mb, ...),
    replicated across the axis.

    ``data_axis`` composes dp×pp: the per-microbatch sample dim is sharded
    over that mesh axis (each data shard runs its own pipeline over the
    stage axis; no cross-data communication is introduced).
    """
    n_stages = mesh.shape[axis_name]
    n_micro = x_microbatches.shape[0]

    def pipelined(params, x_mb):
        stage = jax.lax.axis_index(axis_name)
        local = jax.tree_util.tree_map(lambda p: p[0], params)  # my slice
        sample_shape = x_mb.shape[1:]
        n_ticks = n_micro + n_stages - 1
        perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]

        def tick(carry, t):
            received, out_buf = carry
            # stage 0 ingests microbatch t; later stages consume what the
            # previous stage sent last tick
            x_t = jax.lax.dynamic_index_in_dim(
                x_mb, jnp.clip(t, 0, n_micro - 1), 0, keepdims=False)
            inp = jnp.where(stage == 0, x_t, received)
            out = stage_fn(local, inp)
            # the last stage finishes microbatch t-(S-1) this tick
            done = t - (n_stages - 1)
            write = jnp.clip(done, 0, n_micro - 1)
            cur = jax.lax.dynamic_index_in_dim(out_buf, write, 0,
                                               keepdims=False)
            fresh = jnp.where((done >= 0) & (stage == n_stages - 1), out, cur)
            out_buf = jax.lax.dynamic_update_index_in_dim(
                out_buf, fresh, write, 0)
            received = jax.lax.ppermute(out, axis_name, perm)
            return (received, out_buf), None

        init = (jnp.zeros(sample_shape, x_mb.dtype),
                jnp.zeros((n_micro, *sample_shape), x_mb.dtype))
        # the loop writes stage-varying (and, under dp×pp, data-varying)
        # values into the carry: mark the initial zeros accordingly
        # (shard_map vma typing — the scan carry type must be stable)
        varying = (axis_name,) + ((data_axis,) if data_axis else ())
        init = jax.lax.pcast(init, varying, to="varying")
        (_, out_buf), _ = jax.lax.scan(tick, init, jnp.arange(n_ticks))
        # replicate the last stage's results to every shard
        out_buf = jnp.where(stage == n_stages - 1, out_buf, 0)
        return jax.lax.psum(out_buf, axis_name)

    stage_spec = jax.tree_util.tree_map(lambda _: P(axis_name), stage_params)
    x_spec = P(None, data_axis) if data_axis else P()
    return jax.shard_map(
        pipelined, mesh=mesh,
        in_specs=(stage_spec, x_spec), out_specs=x_spec,
    )(stage_params, x_microbatches)


def split_stages(block_params, n_stages: int):
    """(depth, ...) scanned-block leaves -> (S, depth/S, ...)."""

    def split(p):
        depth = p.shape[0]
        if depth % n_stages:
            raise ValueError(
                f"depth {depth} not divisible by {n_stages} pipeline stages")
        return p.reshape(n_stages, depth // n_stages, *p.shape[1:])

    return jax.tree_util.tree_map(split, block_params)


def pp_vit_forward(vit, variables, x, *, mesh: Mesh, n_microbatches: int,
                   axis_name: str = "stage", train: bool = False,
                   data_axis: str | None = None):
    """ViT forward with the block stack pipelined over ``mesh``.

    Mirrors VisionTransformer.__call__ (models/vit.py) for the scanned,
    prompt-less, single-domain configuration; equality with the plain
    forward is asserted by tests/test_sharding.py.  Returns cls embeddings.

    ``train=True`` is supported for dropout-free ViTs (the DINOv2 configs —
    dropout 0.0): block compute is then train/eval-identical, and the
    backward pass pipelines through the same schedule because
    ``ppermute``'s transpose is the reverse permutation (gradients verified
    against the non-pp step in tests/test_sharding.py).
    """
    if train and vit.dropout:
        raise NotImplementedError(
            "pp train forward requires dropout=0 (deterministic blocks)")
    from irw_tpu.models.vit import (
        Block,
        DomainLayerNorm,
        PatchEmbed,
        block_kwargs,
        regroup_block_params,
    )

    assert vit.scan_blocks, "pipeline parallelism needs the scanned layout"
    assert vit.num_prompts == 0, "pp path: prompt tokens not supported"
    assert vit.num_domains <= 1, "pp path: single-domain only (domain=None)"
    params = variables["params"]
    b = x.shape[0]
    if b % n_microbatches:
        raise ValueError(f"batch {b} not divisible by {n_microbatches} microbatches")

    # ---- embed (replicated; small) — vit.py:252-260
    tokens = PatchEmbed(vit.embed_dim, vit.patch_size, dtype=vit.dtype).apply(
        {"params": params["PatchEmbed_0"]}, x)
    cls = jnp.broadcast_to(params["cls_token"], (b, 1, vit.embed_dim))
    tokens = jnp.concatenate([cls, tokens], 1) + params["pos_embed"]

    # ---- pipelined block stack (block_kwargs: the same construction the
    # model's own forward uses — new Block flags cannot desync this path)
    block = Block(**block_kwargs(vit))
    # grouped remat-scan checkpoints (scan_group>1) flatten losslessly to
    # the per-block stack the stage split consumes
    blocks_tree = regroup_block_params(params["blocks"], 1)
    stage_params = split_stages(blocks_tree["Block_0"], mesh.shape[axis_name])

    def stage_fn(p_stage, toks):
        def body(toks, p_block):
            return block.apply({"params": p_block}, toks, False, None), None

        toks, _ = jax.lax.scan(body, toks, p_stage)
        return toks

    mb = tokens.reshape(n_microbatches, b // n_microbatches, *tokens.shape[1:])
    tokens = gpipe(stage_fn, stage_params, mb, mesh=mesh, axis_name=axis_name,
                   data_axis=data_axis).reshape(tokens.shape)

    # ---- head — vit.py:333-336
    tokens = DomainLayerNorm(vit.num_domains, dtype=vit.dtype).apply(
        {"params": params["norm"]}, tokens, None)
    return tokens[:, 0]


def pp_apply_fn(model, *, mesh: Mesh, n_microbatches: int,
                axis_name: str = "stage", data_axis: str | None = None,
                batch_size: int | None = None):
    """``model.apply``-compatible pipelined apply for single-ViT hashing
    models (DINOHashBaseline — the pp use case: one backbone that outgrows
    a chip; the 4-branch flagship scales by band parallelism first, see
    module docstring).

    The returned callable matches the contract the engine's train step
    expects from ``model.apply`` (train_step.py ``forward``): it takes the
    full ``variables`` tree, returns ``((output, aux), mutated_vars)`` and
    honors ``mutable=["batch_stats"]`` for the hash head's BatchNorm.
    Plugged in via ``build_train_step(..., apply_fn=...)`` so losses,
    optimizers and XBM are untouched.
    """
    from irw_tpu.models.baselines import DINOHashBaseline
    from irw_tpu.models.vit import make_vit

    if not isinstance(model, DINOHashBaseline):
        raise NotImplementedError(
            "pipeline parallelism is integrated for single-ViT hashing "
            f"models (DINOHashBaseline); got {type(model).__name__}. "
            "Multi-branch models: use band/tensor parallelism "
            "(experience.band_parallel / model_parallel).")
    vit = make_vit(model.backbone, **(model.vit_kwargs or {}))
    # validate everything statically known NOW, as NotImplementedError: the
    # engine's graceful fallback to data parallelism catches exactly that at
    # construction (engine/train.py) — a trace-time raise would instead kill
    # the run at the first batch
    n_stages = mesh.shape[axis_name]
    problems = []
    if not vit.scan_blocks:
        problems.append("requires the scanned block layout (scan_blocks)")
    if vit.num_prompts:
        problems.append("prompt tokens not supported")
    if vit.num_domains > 1:
        problems.append("single-domain only")
    if vit.dropout and not model.frozen_backbone:
        problems.append(
            f"train forward requires dropout=0 (got {vit.dropout})")
    if vit.quant_int8 and not model.frozen_backbone:
        # the stage body runs blocks with train=False (deterministic
        # schedule), which would silently bypass Block's serving-only guard
        # and train through the zero-gradient int8 round()
        problems.append("quant_int8 is a serving-only path (unfrozen "
                        "backbone would train through round()'s zero grad)")
    if vit.depth % n_stages:
        problems.append(
            f"depth {vit.depth} not divisible by {n_stages} stages")
    if batch_size is not None:
        # statically known at engine construction (the sampler's fixed
        # batch size): fail HERE so the engine falls back to dp instead of
        # dying at the first batch's trace
        if batch_size % n_microbatches:
            problems.append(f"batch {batch_size} not divisible by "
                            f"{n_microbatches} microbatches")
        elif data_axis and (batch_size // n_microbatches) % mesh.shape[data_axis]:
            problems.append(
                f"microbatch {batch_size // n_microbatches} not divisible "
                f"by the {mesh.shape[data_axis]}-wide data axis")
    if problems:
        raise NotImplementedError("pp path: " + "; ".join(problems))

    def apply(variables, images, *, rngs=None, mutable=(), train=True,
              **kwargs):
        params = variables["params"]
        cls = pp_vit_forward(
            vit, {"params": params["VisionTransformer_0"]}, images,
            mesh=mesh, n_microbatches=n_microbatches, axis_name=axis_name,
            data_axis=data_axis, train=train and not model.frozen_backbone)
        if model.frozen_backbone:
            cls = jax.lax.stop_gradient(cls)
        # head + binarize tail: delegate to the model itself (single source
        # of truth — a future head/binarize change cannot desync the pp path)
        out, new_vars = model.apply(variables, cls, train,
                                    method="head_out",
                                    mutable=["batch_stats"])
        return out, new_vars

    return apply
