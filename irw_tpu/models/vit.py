"""DINOv2-style Vision Transformer in flax.

Reference: the torch.hub dinov2 backbones used by every DINO-family model
(net.py:222-273, multi_dino_attention.py:398, 457, 495) and by
PromptedSharedDinoHashing's manual block loop with injected prompt tokens
(multi_dino_attention.py:564-598).

Architecture matches DINOv2: patch embed (14×14 default), prepended CLS
token, learned position embeddings, pre-norm blocks with LayerScale, GELU
MLP, final LayerNorm; ``__call__`` returns the normalised CLS token (the
``x_norm_clstoken`` every reference model consumes).

Extras the TPU build makes first-class:
- ``num_prompts`` + a ``prompts`` argument: visual-prompt tokens inserted
  after CLS (PromptedSharedDinoHashing semantics);
- ``num_domains``: per-domain LayerNorm parameters selected by a ``domain``
  input (MultiDomainLayerNorm, multi_dino_attention.py:601-639) — instead of
  chunking the batch, each sample carries a domain id, so it works under any
  sharding;
- ``return_attention``: aux dict carries the last block's attention map for
  the instrumentation CLI (attention.py).

Pretrained DINOv2 weights can be converted once with
``tools/convert_torch_weights.py``; training from scratch also works (the
reference's studies mostly freeze the backbone, so conversion is only needed
for accuracy parity with pretrained runs).
"""

from __future__ import annotations

import math
from functools import partial

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from irw_tpu.models.layers import Mlp, trunc_normal_init


class PatchEmbed(nn.Module):
    embed_dim: int
    patch_size: int = 14
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # (B, H, W, C) → (B, N, D)
        x = nn.Conv(
            self.embed_dim,
            (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            padding="VALID",
            dtype=self.dtype,
        )(x)
        b, h, w, d = x.shape
        return x.reshape(b, h * w, d)


class DomainLayerNorm(nn.Module):
    """LayerNorm with per-domain scale/offset selected by a domain id
    (the MultiDomainLayerNorm equivalent)."""

    num_domains: int
    dtype: jnp.dtype = jnp.float32
    fused: bool = False  # stat-free custom-VJP LayerNorm (ops/fused_ln.py)

    @nn.compact
    def __call__(self, x, domain=None):
        if self.num_domains <= 1 or domain is None:
            if self.fused:
                from irw_tpu.ops.fused_ln import FusedLayerNorm

                # explicit name keeps the param path identical to the
                # anonymous nn.LayerNorm child it replaces
                return FusedLayerNorm(dtype=self.dtype, name="LayerNorm_0")(x)
            return nn.LayerNorm(dtype=self.dtype)(x)
        dim = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (self.num_domains, dim))
        bias = self.param("bias", nn.initializers.zeros, (self.num_domains, dim))
        mean = x.mean(axis=-1, keepdims=True)
        var = ((x - mean) ** 2).mean(axis=-1, keepdims=True)
        y = (x - mean) * jnp.reciprocal(jnp.sqrt(var + 1e-6))
        s = scale[domain][:, None, :]  # (B, 1, D)
        b = bias[domain][:, None, :]
        return y * s + b


class _Proj(nn.Module):
    """Parameter holder shaped exactly like flax DenseGeneral's leaves, so a
    fused-QKV attention keeps the MultiHeadDotProductAttention param tree
    (query/key/value/out × kernel/bias) — converted torch weights and the
    tensor-parallel specs (parallel/tp.py) apply unchanged.  in_axis/out_axis
    reproduce DenseGeneral's fan computation (fan-in = the flattened input
    dims, e.g. D for a (D, H, hd) kernel — NOT the default trailing-axes
    convention, which would inflate init variance by D/H)."""

    shape: tuple  # kernel shape, e.g. (D, H, hd)
    bias_shape: tuple
    in_axis: tuple = (0,)
    out_axis: tuple = (1, 2)

    @nn.compact
    def __call__(self):
        init = nn.initializers.variance_scaling(
            1.0, "fan_in", "truncated_normal",
            in_axis=self.in_axis, out_axis=self.out_axis)
        kernel = self.param("kernel", init, self.shape)
        bias = self.param("bias", nn.initializers.zeros, self.bias_shape)
        return kernel, bias


class FusedMHA(nn.Module):
    """Self-attention with one fused QKV matmul (param-tree identical to
    flax MultiHeadDotProductAttention, outputs bit-exact).

    MEASURED SLOWER on v5e than the default path and kept opt-in only:
    846 vs 1597 img/s flagship inference, 251 vs 309 img/s unfrozen
    training.  XLA already co-schedules the three (D, D) projections; the
    manual kernel concat materialises (D, 3D) weights per step and forces a
    worse layout on the split.  Same conclusion as flash attention at seq
    257 (BASELINE.md) — the compiler's fusion wins at these shapes.
    """

    num_heads: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, y, train: bool = False):
        b, n, d = y.shape
        h = self.num_heads
        hd = d // h
        qk, qb = _Proj((d, h, hd), (h, hd), name="query")()
        kk, kb = _Proj((d, h, hd), (h, hd), name="key")()
        vk, vb = _Proj((d, h, hd), (h, hd), name="value")()
        ok, ob = _Proj((h, hd, d), (d,), in_axis=(0, 1), out_axis=(2,),
                       name="out")()
        w_qkv = jnp.concatenate(
            [t.reshape(d, h * hd) for t in (qk, kk, vk)], axis=1
        ).astype(self.dtype)
        b_qkv = jnp.concatenate([t.reshape(h * hd) for t in (qb, kb, vb)])
        qkv = (y.astype(self.dtype) @ w_qkv + b_qkv.astype(self.dtype))
        qkv = qkv.reshape(b, n, 3, h, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        scores = jnp.einsum("bqhd,bkhd->bhqk", q / math.sqrt(hd), k)
        weights = jax.nn.softmax(scores, axis=-1)
        if self.dropout > 0.0:
            weights = nn.Dropout(self.dropout, deterministic=not train)(weights)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", weights, v).reshape(b, n, h * hd)
        return ctx @ ok.reshape(h * hd, d).astype(self.dtype) + ob.astype(self.dtype)


class QuantMHA(nn.Module):
    """Self-attention with int8 dynamically-quantized projections
    (ops/quant.py): q/k/v/out matmuls run on the MXU's int8 path (2× bf16
    peak on v5e); the attention core (QKᵀ, softmax, AV) stays in the float
    compute dtype where it is VPU/layout-bound.  Param tree is identical to
    flax MultiHeadDotProductAttention (via the same ``_Proj`` holders as
    FusedMHA), so converted checkpoints and TP specs apply unchanged.
    Serving only — the quantizer's round() has zero gradient.

    Unlike FusedMHA the three projections stay SEPARATE matmuls: the fused
    concat measured slower (see FusedMHA note) and nothing about int8
    changes that layout argument.
    """

    num_heads: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, y, train: bool = False):
        from irw_tpu.ops.quant import quant_dense_apply

        b, n, d = y.shape
        h = self.num_heads
        hd = d // h
        qk, qb = _Proj((d, h, hd), (h, hd), name="query")()
        kk, kb = _Proj((d, h, hd), (h, hd), name="key")()
        vk, vb = _Proj((d, h, hd), (h, hd), name="value")()
        ok, ob = _Proj((h, hd, d), (d,), in_axis=(0, 1), out_axis=(2,),
                       name="out")()
        y = y.astype(self.dtype)

        def proj(kern, bias):
            out = quant_dense_apply(y, kern.reshape(d, h * hd),
                                    bias.reshape(h * hd),
                                    out_dtype=self.dtype)
            return out.reshape(b, n, h, hd)

        q, k, v = proj(qk, qb), proj(kk, kb), proj(vk, vb)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q / math.sqrt(hd), k)
        weights = jax.nn.softmax(scores, axis=-1)
        if self.dropout > 0.0:
            weights = nn.Dropout(self.dropout, deterministic=not train)(weights)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", weights, v).reshape(b, n, h * hd)
        return quant_dense_apply(ctx, ok.reshape(h * hd, d), ob,
                                 out_dtype=self.dtype)


class SplitCLSMHA(nn.Module):
    """Self-attention in lane-aligned blocks for ViT's N = 256 + 1 tokens.

    At seq 257 the (B, H, N, N) score/softmax/AV tensors pad 257→384 lanes
    on the TPU (+49% attention work — the round-1/2 BASELINE.md note).
    Splitting the CLS token off leaves a (256, 256) core that tiles the
    MXU/VPU exactly, plus rank-1 row/column corrections folded back through
    a streamed (two-block) softmax.  Param tree matches flax
    MultiHeadDotProductAttention bit-for-bit; outputs match to float
    reassociation tolerance (exact when dropout = 0).
    """

    num_heads: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, y, train: bool = False):
        b, n, d = y.shape
        h = self.num_heads
        hd = d // h
        dg = partial(nn.DenseGeneral, features=(h, hd), axis=-1,
                     dtype=self.dtype)
        q = dg(name="query")(y) / math.sqrt(hd)
        k = dg(name="key")(y)
        v = dg(name="value")(y)
        # (B, N, H, hd) → (B, H, N, hd)
        q, k, v = (jnp.swapaxes(t, 1, 2) for t in (q, k, v))
        qc, qp = q[:, :, :1], q[:, :, 1:]
        kc, kp = k[:, :, :1], k[:, :, 1:]
        vc, vp = v[:, :, :1], v[:, :, 1:]

        def softmax_blocks(s_core, s_extra):
            """softmax over concat([s_extra, s_core], -1) without forming
            the unaligned concat; returns (w_extra, w_core)."""
            m = jnp.maximum(jnp.max(s_core, axis=-1, keepdims=True),
                            jnp.max(s_extra, axis=-1, keepdims=True))
            e_core = jnp.exp(s_core - m)
            e_extra = jnp.exp(s_extra - m)
            denom = (jnp.sum(e_core, axis=-1, keepdims=True)
                     + jnp.sum(e_extra, axis=-1, keepdims=True))
            return e_extra / denom, e_core / denom

        # patch rows: scores vs [CLS | patches]
        s_pp = jnp.einsum("bhqd,bhkd->bhqk", qp, kp)      # (B,H,256,256)
        s_pc = jnp.einsum("bhqd,bhkd->bhqk", qp, kc)      # (B,H,256,1)
        w_pc, w_pp = softmax_blocks(s_pp, s_pc)
        # CLS row: scores vs [CLS | patches]
        s_cp = jnp.einsum("bhqd,bhkd->bhqk", qc, kp)      # (B,H,1,256)
        s_cc = jnp.einsum("bhqd,bhkd->bhqk", qc, kc)      # (B,H,1,1)
        w_cc, w_cp = softmax_blocks(s_cp, s_cc)

        if self.dropout > 0.0 and train:
            drop = nn.Dropout(self.dropout, deterministic=False)
            w_pp, w_pc, w_cp, w_cc = (drop(w) for w in (w_pp, w_pc, w_cp, w_cc))

        out_p = (jnp.einsum("bhqk,bhkd->bhqd", w_pp, vp) + w_pc * vc)
        out_c = (jnp.einsum("bhqk,bhkd->bhqd", w_cp, vp) + w_cc * vc)
        ctx = jnp.concatenate([out_c, out_p], axis=2)      # (B,H,N,hd)
        ctx = jnp.swapaxes(ctx, 1, 2)                      # (B,N,H,hd)
        return nn.DenseGeneral(features=d, axis=(-2, -1), dtype=self.dtype,
                               name="out")(ctx)


def _flash_mha(y, num_heads: int, dtype, name: str):
    """Multi-head self-attention through the Pallas flash-attention kernel
    (jax.experimental.pallas.ops.tpu.flash_attention): no materialised
    (N, N) attention matrix.  Sequence is padded to a lane multiple and the
    padding masked off via segment ids."""
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        SegmentIds,
        flash_attention,
    )

    b, n, d = y.shape
    hd = d // num_heads
    qkv = nn.DenseGeneral((3, num_heads, hd), axis=-1, dtype=dtype, name=f"{name}_qkv")(y)
    q, k, v = qkv[..., 0, :, :], qkv[..., 1, :, :], qkv[..., 2, :, :]
    # (B, N, H, hd) → (B, H, N, hd)
    q, k, v = (jnp.swapaxes(t, 1, 2) for t in (q, k, v))
    pad = (-n) % 128
    if pad:
        widths = ((0, 0), (0, 0), (0, pad), (0, 0))
        q, k, v = (jnp.pad(t, widths) for t in (q, k, v))
        seg = jnp.concatenate(
            [jnp.ones((b, n), jnp.int32), jnp.full((b, pad), 2, jnp.int32)], axis=1
        )
        segment_ids = SegmentIds(q=seg, kv=seg)
    else:
        segment_ids = None
    out = flash_attention(q, k, v, segment_ids=segment_ids, sm_scale=1.0 / hd**0.5)
    out = jnp.swapaxes(out[:, :, :n, :], 1, 2).reshape(b, n, d)
    return nn.Dense(d, dtype=dtype, name=f"{name}_out")(out)


def _tagged_attention_fn(query, key, value, bias=None, mask=None,
                         broadcast_dropout=True, dropout_rng=None,
                         dropout_rate=0.0, deterministic=False, dtype=None,
                         precision=None, module=None, **_unused):
    """flax dot_product_attention with the softmax output tagged
    ``attn_probs`` (jax.ad_checkpoint.checkpoint_name), so a remat policy
    can pin the probabilities resident and skip the QKᵀ+softmax recompute
    in backward.  Numerically identical to the stock attention."""
    from flax.linen.attention import dot_product_attention_weights
    from jax.ad_checkpoint import checkpoint_name

    weights = dot_product_attention_weights(
        query, key, bias, mask, broadcast_dropout=broadcast_dropout,
        dropout_rng=dropout_rng, dropout_rate=dropout_rate,
        deterministic=deterministic, dtype=dtype, precision=precision,
        module=module)
    weights = checkpoint_name(weights, "attn_probs")
    return jnp.einsum("...hqk,...khd->...qhd", weights, value,
                      precision=precision)


class Block(nn.Module):
    num_heads: int
    mlp_ratio: float = 4.0
    dropout: float = 0.0
    layerscale_init: float = 1e-5
    num_domains: int = 1
    use_flash: bool = False
    fused_qkv: bool = False  # single fused QKV matmul (param-tree identical)
    split_cls: bool = False  # lane-aligned CLS-split attention (same params)
    vmem_attn: bool = False  # VMEM-resident fused attention kernel (same
    # params; ops/vmem_attention.py — no HBM-materialised (N,N) tensors)
    exact_gelu: bool = False  # erf GELU for converted-torch-weight parity
    tag_attn_probs: bool = False  # name-tag softmax output for remat policies
    quant_int8: bool = False  # int8 MXU matmuls for qkv/out/mlp (serving only)
    ln_fused: bool = False  # stat-free custom-VJP LayerNorm (ops/fused_ln.py)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, domain=None):
        if self.quant_int8 and train:
            raise ValueError("quant_int8 is a serving-only path: the int8 "
                             "quantizer's round() has zero gradient")
        dim = x.shape[-1]
        y = DomainLayerNorm(self.num_domains, dtype=self.dtype,
                            fused=self.ln_fused, name="norm1")(x, domain)
        if self.quant_int8:
            attn_out = QuantMHA(self.num_heads, dropout=self.dropout,
                                dtype=self.dtype, name="attn")(y, train=train)
        elif self.use_flash:
            attn_out = _flash_mha(y, self.num_heads, self.dtype, name="attn")
        elif self.split_cls:
            attn_out = SplitCLSMHA(self.num_heads, dropout=self.dropout,
                                   dtype=self.dtype, name="attn")(y, train=train)
        elif self.fused_qkv:
            attn_out = FusedMHA(self.num_heads, dropout=self.dropout,
                                dtype=self.dtype, name="attn")(y, train=train)
        else:
            attention_fn = None
            if self.vmem_attn:
                # VMEM-resident fused kernel behind the stock projections:
                # identical param tree, no (N, N) tensor in HBM.  Falls back
                # to flax attention internally when dropout is active.
                from irw_tpu.ops.vmem_attention import vmem_attention_fn
                attention_fn = vmem_attention_fn
            elif self.tag_attn_probs:
                attention_fn = _tagged_attention_fn
            attn = nn.MultiHeadDotProductAttention(
                num_heads=self.num_heads,
                dropout_rate=self.dropout,
                deterministic=not train,
                dtype=self.dtype,
                name="attn",
                **({"attention_fn": attention_fn} if attention_fn else {}),
            )
            attn_out = attn(y, y)
        # LayerScale params live in f32 but multiply in the compute dtype:
        # otherwise the residual stream silently upcasts to f32 and the
        # scanned-block saved carry doubles its bytes — profiled as
        # f32[12,4,48,257,384] ≈ 9.1 GB of backward HBM reads
        # (benchmarks/profile_train.py, round 3)
        ls1 = self.param("ls1", nn.initializers.constant(self.layerscale_init),
                         (dim,)).astype(self.dtype)
        x = x + attn_out * ls1
        y = DomainLayerNorm(self.num_domains, dtype=self.dtype,
                            fused=self.ln_fused, name="norm2")(x, domain)
        mlp_out = Mlp(int(dim * self.mlp_ratio), dim, self.dropout,
                      exact_gelu=self.exact_gelu, quant_int8=self.quant_int8,
                      dtype=self.dtype)(y, train=train)
        ls2 = self.param("ls2", nn.initializers.constant(self.layerscale_init),
                         (dim,)).astype(self.dtype)
        x = x + mlp_out * ls2
        return x


def block_kwargs(vit: "VisionTransformer") -> dict:
    """Block construction kwargs for a VisionTransformer's configuration —
    the SINGLE source of truth, shared by ``VisionTransformer.__call__``
    and the pipeline-parallel forward (parallel/pp.py), so a new Block
    flag cannot silently desync the pp path from the model's own forward."""
    return dict(
        num_heads=vit.num_heads,
        mlp_ratio=vit.mlp_ratio,
        dropout=vit.dropout,
        num_domains=vit.num_domains,
        use_flash=vit.use_flash,
        fused_qkv=vit.fused_qkv,
        split_cls=vit.split_cls,
        vmem_attn=vit.vmem_attn,
        exact_gelu=vit.exact_gelu,
        quant_int8=vit.quant_int8,
        ln_fused=vit.ln_fused,
        # name-tag the softmax output only when a *_attn policy will
        # pin it — the name barrier is free numerically but can change
        # XLA fusion decisions, so don't tag unconditionally
        tag_attn_probs=bool(vit.remat_policy)
        and "attn" in str(vit.remat_policy),
        dtype=vit.dtype,
    )


class VisionTransformer(nn.Module):
    """DINOv2-flavoured ViT; returns (cls_token, aux)."""

    embed_dim: int = 384
    depth: int = 12
    num_heads: int = 6
    patch_size: int = 14
    mlp_ratio: float = 4.0
    dropout: float = 0.0
    num_prompts: int = 0
    num_domains: int = 1
    img_size: int = 224
    scan_blocks: bool = False  # nn.scan over depth: one block in the HLO
    remat_blocks: bool = False  # jax.checkpoint each scanned block: backward
    # recomputes block internals instead of storing depth× activations —
    # required to fit unfrozen training of the 4-branch flagship in HBM
    remat_policy: Optional[str] = None  # selective checkpointing under
    # remat_blocks: "dots" saves every matmul output (backward recomputes
    # only the cheap elementwise chain — LN/GELU/softmax — instead of the
    # whole block), "nothing" is classic full remat.  None = full remat.
    scan_group: int = 1  # blocks per remat group (grouped / "sqrt" remat):
    # the outer scan runs depth/scan_group steps over a group of scan_group
    # blocks, so the persistent scanned-carry stack shrinks from depth to
    # depth/scan_group entries — the round-4 post-vmem profile measured that
    # stack (bf16[12,4,B,257,384], written forward + re-read per layer in
    # backward) as the dominant copy class.  Cost: backward re-runs each
    # group's forward once, materialising the k−1 inner carries transiently
    # instead of persistently.  Param layout becomes (G, k, …) under
    # blocks/inner/… — ``regroup_block_params`` converts to/from the flat
    # (depth, …) blocks/… layout for checkpoints and the torch converter.
    use_flash: bool = False  # Pallas flash attention (TPU only)
    fused_qkv: bool = False  # fuse q/k/v into one matmul (same param tree)
    split_cls: bool = False  # lane-aligned CLS-split attention (same param tree)
    vmem_attn: bool = False  # VMEM-resident fused attention kernel (same
    # param tree; interpret-mode on CPU — see ops/vmem_attention.py)
    exact_gelu: bool = False  # erf GELU (torch parity); default tanh approx
    quant_int8: bool = False  # int8 MXU serving path (same param tree)
    ln_fused: bool = False  # stat-free custom-VJP LayerNorm (ops/fused_ln.py):
    # same param tree/semantics as nn.LayerNorm; backward recomputes the f32
    # stats inside its own fusion instead of letting XLA spill them (the
    # round-4 profiler's f32[bands,B,N] copy class)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x,
        train: bool = False,
        domain=None,
        prompts: Optional[jnp.ndarray] = None,
        return_features: bool = False,
    ):
        b = x.shape[0]
        tokens = PatchEmbed(self.embed_dim, self.patch_size, dtype=self.dtype)(x)
        num_patches = tokens.shape[1]
        cls = self.param("cls_token", trunc_normal_init, (1, 1, self.embed_dim))
        pos = self.param(
            "pos_embed", trunc_normal_init, (1, num_patches + 1, self.embed_dim)
        )
        tokens = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, self.embed_dim)), tokens], 1)
        tokens = tokens + pos

        if self.num_prompts > 0:
            if prompts is None:
                prompts = self.param(
                    "prompts", trunc_normal_init, (1, self.num_prompts, self.embed_dim)
                )
                prompts = jnp.broadcast_to(prompts, (b, self.num_prompts, self.embed_dim))
            # insert prompt tokens after CLS (multi_dino_attention.py:578-581)
            tokens = jnp.concatenate([tokens[:, :1], prompts, tokens[:, 1:]], axis=1)

        # keep the residual stream in the compute dtype: the f32 cls/pos
        # params upcast the tokens otherwise, and every scanned block then
        # saves an f32 carry (2× backward HBM traffic — see Block.ls note)
        tokens = tokens.astype(self.dtype)

        features = []
        block_kw = block_kwargs(self)
        if self.scan_blocks and not return_features:
            # collapse the depth into one lax.scan'd block: HLO holds one
            # block body instead of `depth` copies — compile time drops by
            # ~the depth factor (essential for the big flagship graphs)
            class BlockStep(nn.Module):
                @nn.compact
                def __call__(self, carry, _):
                    toks, dom = carry
                    toks = Block(**block_kw)(toks, train, dom)
                    return (toks, dom), None

            remat_wrap = None
            if self.remat_blocks:
                # save only the carry between blocks; recompute attn/mlp
                # internals in backward (trades ~⅓ extra FLOPs for ~depth×
                # less activation memory).  A remat_policy narrows what is
                # recomputed: "dots" keeps matmul outputs resident so the
                # backward re-runs only the elementwise chain.
                policies = {
                    None: None,
                    "nothing": jax.checkpoint_policies.nothing_saveable,
                    "dots": jax.checkpoint_policies.dots_saveable,
                    "dots_no_batch":
                        jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
                    # dots_no_batch + pin the tagged GELU output (layers.py
                    # "mlp_act"): skips the transcendental recompute in
                    # backward for ~150 MB/block of residents
                    "dots_no_batch_gelu":
                        jax.checkpoint_policies.save_from_both_policies(
                            jax.checkpoint_policies
                            .dots_with_no_batch_dims_saveable,
                            jax.checkpoint_policies.save_only_these_names(
                                "mlp_act")),
                    # save ALL residuals (zero recompute) — only fits small
                    # batches; lets the batch-vs-recompute tradeoff be swept
                    "everything": jax.checkpoint_policies.everything_saveable,
                    # dots_no_batch + pin the tagged softmax probabilities
                    # ((B,H,257,257) per block): backward skips the QKᵀ +
                    # softmax recompute at the cost of keeping the probs
                    # resident — the round-2 verdict's "remat policy that
                    # saves attention probs" experiment
                    "dots_no_batch_attn":
                        jax.checkpoint_policies.save_from_both_policies(
                            jax.checkpoint_policies
                            .dots_with_no_batch_dims_saveable,
                            jax.checkpoint_policies.save_only_these_names(
                                "attn_probs")),
                    # pin both the GELU output and the attention probs
                    "dots_no_batch_gelu_attn":
                        jax.checkpoint_policies.save_from_both_policies(
                            jax.checkpoint_policies
                            .dots_with_no_batch_dims_saveable,
                            jax.checkpoint_policies.save_only_these_names(
                                "mlp_act", "attn_probs")),
                }
                if self.remat_policy not in policies:
                    raise ValueError(
                        f"unknown remat_policy {self.remat_policy!r}; "
                        f"one of {sorted(k for k in policies if k)}")
                remat_wrap = partial(nn.remat, prevent_cse=False,
                                     policy=policies[self.remat_policy])

            if self.scan_group > 1:
                if self.depth % self.scan_group:
                    raise ValueError(
                        f"scan_group={self.scan_group} must divide "
                        f"depth={self.depth}")
                k = self.scan_group
                # NESTED remat (true "sqrt" schedule): the inner blocks are
                # remat'd too, so the outer (group) recompute materialises
                # only the k inter-block carries — not every block internal.
                # Without the inner remat the group recompute saves all k
                # blocks' attn/MLP activations for the inner backward, which
                # measured far WORSE than per-block remat (264 vs 417 img/s
                # @b48 on v5e — more HBM traffic, not less).
                inner_cls = remat_wrap(BlockStep) if remat_wrap else BlockStep

                class GroupStep(nn.Module):
                    """k consecutive blocks as one scan step: the outer remat
                    boundary saves one persistent carry per GROUP, not per
                    block — grouped a.k.a. sqrt-remat."""

                    @nn.compact
                    def __call__(self, carry, _):
                        inner = nn.scan(
                            inner_cls,
                            variable_axes={"params": 0},
                            split_rngs={"params": True, "dropout": True},
                            length=k,
                        )(name="inner")
                        carry, _ = inner(carry, None)
                        return carry, None

                step_cls = GroupStep
                scan_length = self.depth // k
            else:
                step_cls = BlockStep
                scan_length = self.depth
            if remat_wrap is not None:
                step_cls = remat_wrap(step_cls)
            stack = nn.scan(
                step_cls,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                length=scan_length,
            )(name="blocks")
            (tokens, _), _ = stack((tokens, domain), None)
        else:
            for _ in range(self.depth):
                tokens = Block(**block_kw)(tokens, train=train, domain=domain)
                features.append(tokens)

        tokens = DomainLayerNorm(self.num_domains, dtype=self.dtype,
                                 fused=self.ln_fused, name="norm")(
            tokens, domain
        )
        cls_out = tokens[:, 0]
        aux = {}
        if return_features:
            aux["block_tokens"] = features
            aux["patch_tokens"] = tokens[:, 1 + self.num_prompts :]
        return cls_out, aux


def vit_small(**kw) -> VisionTransformer:
    kw.setdefault("embed_dim", 384)
    kw.setdefault("depth", 12)
    kw.setdefault("num_heads", 6)
    return VisionTransformer(**kw)


def vit_base(**kw) -> VisionTransformer:
    kw.setdefault("embed_dim", 768)
    kw.setdefault("depth", 12)
    kw.setdefault("num_heads", 12)
    return VisionTransformer(**kw)


VIT_DIMS = {
    "dinov2_vits14": 384,
    "dinov2_vitb14": 768,
    "dinov3_vits16": 384,
    "dinov3_vitb16": 768,
    "vit_small": 384,
    "vit_base": 768,
    "deit_small": 384,
    "deit_base": 768,
    "vit_tiny": 64,
    "test_tiny": 64,
}


def vit_config(name: str, **kw) -> dict:
    """Constructor kwargs for a named ViT variant (usable both directly and
    through linen transforms like nn.vmap)."""
    if name in ("dinov2_vits14", "vit_small", "deit_small"):
        base = dict(embed_dim=384, depth=12, num_heads=6, scan_blocks=True)
    elif name in ("dinov2_vitb14", "vit_base", "deit_base"):
        base = dict(embed_dim=768, depth=12, num_heads=12, scan_blocks=True)
    elif name.startswith("dinov3_vits"):
        # DINOv3 ViT-S/16 (net.py:275-296 hub load; same trunk shape,
        # patch 16) — weights come via the offline converter
        base = dict(embed_dim=384, depth=12, num_heads=6, patch_size=16,
                    scan_blocks=True)
    elif name.startswith("dinov3_vitb"):
        base = dict(embed_dim=768, depth=12, num_heads=12, patch_size=16,
                    scan_blocks=True)
    elif name in ("vit_tiny", "test_tiny"):
        # a tiny variant for tests/benches of the surrounding machinery
        base = dict(embed_dim=64, depth=2, num_heads=2, patch_size=8)
    else:
        raise ValueError(f"unknown ViT variant {name!r}")
    base.update(kw)
    return base


def make_vit(name: str, **kw) -> VisionTransformer:
    return VisionTransformer(**vit_config(name, **kw))


def regroup_block_params(blocks: dict, scan_group: int) -> dict:
    """Convert a scanned-ViT ``blocks`` param subtree between the flat layout
    (``{"Block_0": …}`` with a leading ``depth`` axis) and the grouped layout
    (``{"inner": {"Block_0": …}}`` with leading ``(depth/k, k)`` axes) that
    ``scan_group=k`` produces.  Returns the layout matching ``scan_group``;
    accepts either layout as input.  Flat block ``d`` maps to grouped
    ``[d // k, d % k]`` (outer scan is the major axis), so checkpoints and
    converted torch weights move between layouts losslessly."""
    grouped_in = "inner" in blocks
    if scan_group <= 1:
        if not grouped_in:
            return blocks
        return jax.tree_util.tree_map(
            lambda x: x.reshape((-1,) + x.shape[2:]), blocks["inner"])
    if grouped_in:
        inner = blocks["inner"]
        k = jax.tree_util.tree_leaves(inner)[0].shape[1]
        if k != scan_group:
            flat = jax.tree_util.tree_map(
                lambda x: x.reshape((-1,) + x.shape[2:]), inner)
            return regroup_block_params(flat, scan_group)
        return blocks
    return {"inner": jax.tree_util.tree_map(
        lambda x: x.reshape(
            (x.shape[0] // scan_group, scan_group) + x.shape[1:]),
        blocks)}
