"""VMEM-resident fused multi-head attention for short sequences.

Motivation (round-4 profiler evidence, benchmarks/profile_train.py): the
unfrozen flagship train step is *movement-bound* — 23.1% of device op time
is copy/layout, dominated by the materialised per-layer attention tensors
``(bands·B, heads, N, N)``.  Stock XLA must round-trip QKᵀ and the softmax
output through HBM because MXU outputs cannot be producer-fused into the
next matmul; at N = 257 that is ~152 MB per tensor per layer.  But the
whole per-(batch, head) attention problem is tiny — Q/K/V are (257, 64),
the score matrix is (257, 257) f32 ≈ 264 KB — so it fits in VMEM with room
to spare.  This kernel therefore computes softmax(QKᵀ·scale)·V for a block
of batch rows entirely on-chip: the only HBM traffic is Q, K, V in and the
context out, i.e. the same bytes the projections already move.

This is NOT flash attention (jax.experimental.pallas.ops.tpu.flash_attention
measured 2.3× *slower* here — its block-128 online-softmax tiling targets
long sequences and pads 257 → 384 lanes, BASELINE.md round 2/3).  At short
N no online softmax is needed: one block holds the full key axis, so the
softmax is exact, single-pass, and unpadded (blocks are exactly N long;
Mosaic masks the ragged sublane tiles internally).

Backward is a custom VJP that recomputes the probabilities in VMEM
(FlashAttention-style recompute, arXiv:2205.14135 §3.1) and emits dQ/dK/dV
in one kernel — again no (N, N) tensor ever reaches HBM, which also makes
the op remat-friendly: under ``remat_policy="nothing"`` the re-forward is
the same VMEM-resident kernel.

Layout contract: the public API takes ``(…, N, H, hd)`` — what flax's
``MultiHeadDotProductAttention`` projections produce — and transposes to
``(B, H, N, hd)`` for the kernel, because Mosaic requires the block's minor
two dims to be tile-divisible or whole: heads must ride a leading grid dim,
not a minor-dim slice.  The transpose is O(B·N·D) — the same bytes the
projections already move, ~50× smaller than the (N, N) traffic removed —
and XLA's layout assignment can often fold it into adjacent ops.

Reference: the attention math matches main/models/multi_dino_attention.py's
torch ``nn.MultiheadAttention`` blocks (SURVEY §3.4) and flax's
``dot_product_attention`` (the default path in irw_tpu/models/vit.py).
"""

from __future__ import annotations

import functools
import math
import typing

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


class AttentionMeshCtx(typing.NamedTuple):
    """Multi-device execution contract for the kernel (see
    ``set_attention_mesh``): which mesh axes shard the flattened batch dim
    and the head dim of the kernel's (B, H, N, hd) layout, and which mesh
    axis (if any) shards the *vmapped* band dim above the kernel."""

    mesh: typing.Any                 # jax.sharding.Mesh
    batch_axes: tuple                # mesh axes sharding the batch dim
    head_axes: tuple                 # mesh axes sharding the head dim
    band_fallback: bool              # force the stock-attention fallback
    band_axes: tuple = ()            # mesh axes sharding the vmapped band dim

    @property
    def n_batch_shards(self) -> int:
        return math.prod(self.mesh.shape[a] for a in self.batch_axes) or 1

    @property
    def n_head_shards(self) -> int:
        return math.prod(self.mesh.shape[a] for a in self.head_axes) or 1


_MESH_CTX: AttentionMeshCtx | None = None


def set_attention_mesh(mesh, batch_axes=("data",), head_axes=(),
                       band_fallback=False, band_axes=()) -> None:
    """Declare the device mesh the VMEM attention kernel runs under.

    Mosaic custom calls are opaque to GSPMD/Shardy — a multi-device
    jit+NamedSharding program containing a bare ``pallas_call`` fails to
    compile with "Please wrap the call in a shard_map"
    (jax/_src/tpu_custom_call.py:339-352).  The engine therefore registers
    its mesh here (irw_tpu/engine/train.py), and ``fused_attention`` wraps
    the kernel in ``jax.shard_map`` over it: the batch dim sharded over
    ``batch_axes`` (data parallelism), the head dim over ``head_axes``
    (Megatron tensor parallelism — heads are embarrassingly parallel in
    attention), N and hd device-local.  ``shard_map`` composes with
    ``vmap`` (the band-vmapped flagship) and ``jax.checkpoint`` (remat).

    ``band_axes=("band",)`` makes the kernel RIDE band parallelism: the
    band dim of the flagship is a *vmapped* dim (irw_tpu/models/multi_dino.py
    ``BandedViT``) sharded over "band", and a naive ``vmap`` of the
    shard_map region would treat it as replicated — an all-gather of every
    band's activations per layer.  Instead ``BandedViT`` reads
    ``band_spmd_axis()`` and lifts with ``nn.vmap(spmd_axis_name="band")``:
    vmap's shard_map batching rule then inserts "band" into the region's
    in/out specs, so each device's kernel invocation sees only its LOCAL
    bands folded into the Pallas grid — band-local, collective-free
    (verified zero all-gathers in the compiled module,
    tests/test_vmem_attention.py).

    ``band_fallback=True`` forces the stock flax attention instead — kept
    for pipeline parallelism, which slices the block stack itself.

    The context is read at TRACE time: register the mesh before the first
    call of any jitted function that reaches the kernel (already-traced
    programs are not retraced on a context change).  The engine registers
    it before building its jitted train step.
    """
    global _MESH_CTX
    _MESH_CTX = AttentionMeshCtx(mesh, tuple(batch_axes), tuple(head_axes),
                                 bool(band_fallback), tuple(band_axes))


def band_spmd_axis() -> str | None:
    """The mesh axis name the band-vmapped module stack should pass as
    ``nn.vmap(spmd_axis_name=...)`` so the kernel's shard_map region shards
    the band dim instead of gathering it — or None when no mesh context is
    registered / band parallelism is off (plain ``nn.vmap``)."""
    ctx = _MESH_CTX
    if ctx is None or ctx.band_fallback or not ctx.band_axes:
        return None
    return ctx.band_axes[0]


def clear_attention_mesh() -> None:
    global _MESH_CTX
    _MESH_CTX = None


def attention_mesh() -> AttentionMeshCtx | None:
    return _MESH_CTX


def _pick_block(b: int, cap: int) -> int:
    """Largest power-of-two batch block ≤ cap that divides b (so no grid
    cell ever overruns the batch axis — keeps the kernel mask-free)."""
    for cand in (cap, cap // 2, cap // 4, cap // 8, 4, 2, 1):
        if cand >= 1 and b % cand == 0:
            return cand
    return 1


def _dotg(a, b, dims):
    return jax.lax.dot_general(a, b, dims, preferred_element_type=jnp.float32)


# dimension_numbers, all batched over the leading bb axis:
_QK = (((2,), (2,)), ((0,), (0,)))   # (bb,N,hd)·(bb,N,hd) → (bb,Nq,Nk)
_PV = (((2,), (1,)), ((0,), (0,)))   # (bb,Nq,Nk)·(bb,Nk,hd) → (bb,Nq,hd)
_TQ = (((1,), (1,)), ((0,), (0,)))   # contract the q axis


def _softmax_f32(s):
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    return e / jnp.sum(e, axis=-1, keepdims=True)


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, scale):
    q = q_ref[:, 0]
    k = k_ref[:, 0]
    v = v_ref[:, 0]
    s = _dotg(q, k, _QK) * scale                      # (bb,Nq,Nk) f32
    p = _softmax_f32(s).astype(q.dtype)
    o = _dotg(p, v, _PV)                              # f32 accumulate
    o_ref[:, 0] = o.astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, g_ref, dq_ref, dk_ref, dv_ref, *, scale):
    q = q_ref[:, 0]
    k = k_ref[:, 0]
    v = v_ref[:, 0]
    g = g_ref[:, 0]
    s = _dotg(q, k, _QK) * scale
    p = _softmax_f32(s)                               # (bb,Nq,Nk) f32
    pc = p.astype(q.dtype)
    dv = _dotg(pc, g, _TQ)                            # (bb,Nk,hd)
    dp = _dotg(g, v, _QK)                             # (bb,Nq,Nk) f32
    t = jnp.sum(dp * p, axis=-1, keepdims=True)
    ds = (p * (dp - t) * scale).astype(q.dtype)
    dq = _dotg(ds, k, _PV)                            # (bb,Nq,hd)
    dk = _dotg(ds, q, _TQ)                            # (bb,Nk,hd)
    dq_ref[:, 0] = dq.astype(dq_ref.dtype)
    dk_ref[:, 0] = dk.astype(dk_ref.dtype)
    dv_ref[:, 0] = dv.astype(dv_ref.dtype)


def _head_spec(bb, n, hd):
    # layout (B, H, N, hd): heads ride a LEADING dim so the block's minor
    # two dims (N, hd) equal the array's — Mosaic requires the last two
    # block dims be tile-divisible or whole (grid_blockspec constraint)
    return pl.BlockSpec((bb, 1, n, hd), lambda b, h: (b, h, 0, 0),
                        memory_space=pltpu.VMEM)


def _fwd_call(q, k, v, scale, interpret, block_b):
    b, h, n, hd = q.shape
    bb = _pick_block(b, block_b)
    spec = _head_spec(bb, n, hd)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale),
        grid=(b // bb, h),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * n * n * hd,
            bytes_accessed=4 * b * n * h * hd * q.dtype.itemsize,
            transcendentals=b * h * n * n,
        ),
    )(q, k, v)


def _bwd_call(q, k, v, g, scale, interpret, block_b):
    b, h, n, hd = q.shape
    bb = _pick_block(b, block_b)
    spec = _head_spec(bb, n, hd)
    shape = jax.ShapeDtypeStruct(q.shape, q.dtype)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale),
        grid=(b // bb, h),
        in_specs=[spec, spec, spec, spec],
        out_specs=(spec, spec, spec),
        out_shape=(shape, shape, shape),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=10 * b * h * n * n * hd,
            bytes_accessed=7 * b * n * h * hd * q.dtype.itemsize,
            transcendentals=b * h * n * n,
        ),
    )(q, k, v, g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _core(scale, interpret, block_b_fwd, block_b_bwd, q, k, v):
    return _fwd_call(q, k, v, scale, interpret, block_b_fwd)


def _core_fwd(scale, interpret, block_b_fwd, block_b_bwd, q, k, v):
    return _fwd_call(q, k, v, scale, interpret, block_b_fwd), (q, k, v)


def _core_bwd(scale, interpret, block_b_fwd, block_b_bwd, res, g):
    q, k, v = res
    return _bwd_call(q, k, v, g, scale, interpret, block_b_bwd)


_core.defvjp(_core_fwd, _core_bwd)


def _auto_block(n: int, live_planes: int, cap: int) -> int:
    """Largest power-of-two batch block whose live f32 (bb, N, N) temporaries
    fit a 12 MB scoped-VMEM budget (Mosaic's stack limit is 16 MB).  At the
    flagship N = 257 this resolves to the tuned fwd 8 / bwd 4; at longer
    sequences (e.g. N = 577 for 336² inputs) it shrinks instead of OOMing
    at compile time."""
    budget = 12 * 1024 * 1024
    bb = max(1, budget // (live_planes * n * n * 4))
    p = 1
    while p * 2 <= min(bb, cap):
        p *= 2
    return p


def fused_attention(q, k, v, *, scale=None, interpret=None,
                    block_b_fwd=None, block_b_bwd=None):
    """softmax(q·kᵀ·scale)·v per head, VMEM-resident, differentiable.

    q, k, v: ``(..., N, H, hd)`` with identical leading batch dims (self-
    attention shapes).  ``scale`` defaults to 1/√hd.  The (N, N) score and
    probability tensors live only in VMEM; the batch block defaults scale
    with N so the scoped stack stays under Mosaic's 16 MB limit (at N = 257
    the f32 score block is ``8·N²·4`` ≈ 2.1 MB and the defaults are the
    measured-fastest fwd 8 / bwd 4).
    """
    if interpret is None:
        interpret = _interpret_default()
    *lead, n, h, hd = q.shape
    if block_b_fwd is None:
        # forward holds ~3 live (bb, N, N) f32 planes (scores, exp, probs)
        block_b_fwd = _auto_block(n, live_planes=3, cap=8)
    if block_b_bwd is None:
        # backward holds ~5 (scores, probs, dp, ds, plus a cast copy)
        block_b_bwd = _auto_block(n, live_planes=5, cap=4)
    if scale is None:
        scale = 1.0 / (hd ** 0.5)
    b = 1
    for d in lead:
        b *= d
    # kernel layout is (B, H, N, hd): the head-gather transpose is left to
    # XLA's layout assignment (it typically folds into the projection's
    # output or the kernel's DMA; measured in benchmarks/vmem_attn_micro.py)
    qf, kf, vf = (jnp.moveaxis(t.reshape(b, n, h, hd), 1, 2)
                  for t in (q, k, v))
    core = functools.partial(_core, float(scale), bool(interpret),
                             int(block_b_fwd), int(block_b_bwd))
    ctx = _MESH_CTX
    if ctx is not None and not ctx.band_fallback:
        # multi-device: run the Mosaic kernel per-shard under shard_map —
        # GSPMD/Shardy cannot partition the custom call itself (see
        # set_attention_mesh).  Per-head attention is embarrassingly
        # parallel over batch AND heads, so the region needs no collectives.
        from jax.sharding import PartitionSpec as P

        if b % ctx.n_batch_shards or h % ctx.n_head_shards:
            raise ValueError(
                f"fused_attention under mesh {dict(ctx.mesh.shape)}: batch "
                f"{b} must divide {ctx.batch_axes}={ctx.n_batch_shards} and "
                f"heads {h} must divide {ctx.head_axes}={ctx.n_head_shards} "
                "(vmem_attention_fn falls back to flax attention instead)")
        spec = P(tuple(ctx.batch_axes) or None, tuple(ctx.head_axes) or None,
                 None, None)
        core = jax.shard_map(core, mesh=ctx.mesh, in_specs=(spec, spec, spec),
                             out_specs=spec, check_vma=False)
    out = core(qf, kf, vf)
    return jnp.moveaxis(out, 1, 2).reshape(*lead, n, h, hd)


def vmem_attention_fn(query, key, value, bias=None, mask=None,
                      dropout_rng=None, dropout_rate=0.0, deterministic=False,
                      dtype=None, precision=None):
    """Drop-in ``attention_fn`` for flax ``MultiHeadDotProductAttention``.

    Uses the fused VMEM kernel whenever the call is plain self-attention
    (no bias/mask, no active dropout); otherwise falls back to flax's
    ``dot_product_attention`` so correctness never depends on the kernel's
    supported surface.  flax passes q *unscaled* and applies 1/√depth inside
    its weights einsum — the kernel applies the same scale.
    """
    needs_fallback = (
        bias is not None
        or mask is not None
        or (dropout_rate > 0.0 and not deterministic)
        or query.shape != key.shape
    )
    if not needs_fallback:
        ctx = _MESH_CTX
        if ctx is None:
            # multi-device TPU without a registered mesh: GSPMD cannot
            # partition the Mosaic call (set_attention_mesh docstring) —
            # a sharded jit would fail to compile, so use flax attention.
            # The engine registers its mesh; outside it, single-chip keeps
            # the kernel and multi-chip keeps correctness.
            needs_fallback = (jax.default_backend() == "tpu"
                              and jax.device_count() > 1)
        elif ctx.band_fallback:
            needs_fallback = True
        else:
            *lead, _n, h, _hd = query.shape
            b = math.prod(lead)
            needs_fallback = bool(b % ctx.n_batch_shards
                                  or h % ctx.n_head_shards)
    if needs_fallback:
        from flax.linen.attention import dot_product_attention

        return dot_product_attention(
            query, key, value, bias=bias, mask=mask, dropout_rng=dropout_rng,
            dropout_rate=dropout_rate, deterministic=deterministic,
            dtype=dtype, precision=precision)
    if dtype is not None:
        query, key, value = (t.astype(dtype) for t in (query, key, value))
    return fused_attention(query, key, value)
