"""Micro-benchmark: fusing the QKV projections INTO the VMEM attention
kernel (x -> context in one Pallas call, Q/K/V never materialised in HBM)
vs the production segment (XLA projections + the vmem attention kernel).

Motivation: after the round-4 vmem-attn kernel removed the (N, N) HBM
traffic, the per-layer attention segment still writes Q, K, V to HBM
(3 x (B*bands, N, D) bf16 ~ 113 MB at the flagship shape) and reads them
back in the kernel.  A kernel whose grid is batch-only can load the x
block once, compute all-head Q/K/V with full-lane (D, H*hd) matmuls in
VMEM, then loop heads with 64-lane slices for the per-head attention.
The open question this micro answers is whether Mosaic's lane-slice
relayouts (hd=64 is half a lane tile) eat the saved HBM traffic.

One JSON line out.  fwd first; the bwd only matters if fwd wins.
"""

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                os.pardir)))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from irw_tpu.ops.vmem_attention import fused_attention
from irw_tpu.utils.chip_lock import acquire_chip_lock


def _dotg(a, b, dims):
    return jax.lax.dot_general(a, b, dims, preferred_element_type=jnp.float32)


_QK = (((2,), (2,)), ((0,), (0,)))
_PV = (((2,), (1,)), ((0,), (0,)))
_PROJ = (((2,), (0,)), ((), ()))     # (bb,N,D)·(D,HD) → (bb,N,HD)


def _qkv_attn_kernel(x_ref, wq_ref, wk_ref, wv_ref, bq_ref, bk_ref, bv_ref,
                     o_ref, *, scale, heads):
    x = x_ref[:]                                   # (bb, N, D) bf16
    dt = x.dtype
    q = (_dotg(x, wq_ref[:], _PROJ) + bq_ref[:]).astype(dt)   # (bb,N,H*hd)
    k = (_dotg(x, wk_ref[:], _PROJ) + bk_ref[:]).astype(dt)
    v = (_dotg(x, wv_ref[:], _PROJ) + bv_ref[:]).astype(dt)
    hd = q.shape[-1] // heads
    outs = []
    for h in range(heads):
        sl = slice(h * hd, (h + 1) * hd)
        s = _dotg(q[:, :, sl], k[:, :, sl], _QK) * scale      # (bb,N,N) f32
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(dt)
        outs.append(_dotg(p, v[:, :, sl], _PV).astype(dt))    # (bb,N,hd)
    o_ref[:] = jnp.concatenate(outs, axis=-1)


def fused_qkv_attention(x, wq, wk, wv, bq, bk, bv, *, heads, block_b=4,
                        interpret=None):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, n, d = x.shape
    hdall = wq.shape[-1]
    bb = block_b
    while b % bb:
        bb //= 2
    scale = 1.0 / ((hdall // heads) ** 0.5)
    xspec = pl.BlockSpec((bb, n, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    wspec = pl.BlockSpec((d, hdall), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((hdall,), lambda i: (0,), memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((bb, n, hdall), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_qkv_attn_kernel, scale=scale, heads=heads),
        grid=(b // bb,),
        in_specs=[xspec, wspec, wspec, wspec, bspec, bspec, bspec],
        out_specs=ospec,
        out_shape=jax.ShapeDtypeStruct((b, n, hdall), x.dtype),
        interpret=interpret,
    )(x, wq, wk, wv, bq, bk, bv)


def ref_segment(x, wq, wk, wv, bq, bk, bv, *, heads, vmem=True):
    """The production segment: XLA projections + attention (vmem kernel or
    XLA einsum), matching flax MultiHeadDotProductAttention numerics."""
    b, n, d = x.shape
    hd = wq.shape[-1] // heads
    q = (x @ wq + bq).reshape(b, n, heads, hd)
    k = (x @ wk + bk).reshape(b, n, heads, hd)
    v = (x @ wv + bv).reshape(b, n, heads, hd)
    if vmem:
        o = fused_attention(q, k, v)
    else:
        s = jnp.einsum("bqhd,bkhd->bhqk", q / np.sqrt(hd).astype(q.dtype), k)
        p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(q.dtype)
        o = jnp.einsum("bhqk,bkhd->bqhd", p, v)
    return o.reshape(b, n, heads * hd)


def timed(fn, args, iters):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0][0, 0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0][0, 0])
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=192)
    ap.add_argument("--n", type=int, default=257)
    ap.add_argument("--heads", type=int, default=6)
    ap.add_argument("--d", type=int, default=384)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--block-b", type=int, default=4)
    ap.add_argument("--bwd", action="store_true",
                    help="also time fwd+bwd (autodiff through the kernel "
                         "via interpret-differentiable ops is NOT wired; "
                         "bwd here only times the reference segments)")
    args = ap.parse_args()

    acquire_chip_lock()
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(args.b, args.n, args.d), jnp.bfloat16)
    wq, wk, wv = (jnp.asarray(rng.randn(args.d, args.d) / np.sqrt(args.d),
                              jnp.bfloat16) for _ in range(3))
    bq, bk, bv = (jnp.asarray(rng.randn(args.d) * 0.01, jnp.bfloat16)
                  for _ in range(3))
    heads = args.heads

    fused = jax.jit(functools.partial(fused_qkv_attention, heads=heads,
                                      block_b=args.block_b))
    prod = jax.jit(functools.partial(ref_segment, heads=heads, vmem=True))
    stock = jax.jit(functools.partial(ref_segment, heads=heads, vmem=False))

    a = (x, wq, wk, wv, bq, bk, bv)
    of, op = fused(*a), prod(*a)
    diff = float(jnp.abs(of.astype(jnp.float32) - op.astype(jnp.float32)).max())

    res = {
        "shape": [args.b, args.n, heads, args.d // heads],
        "block_b": args.block_b,
        "fwd_maxdiff_vs_prod": diff,
        "fusedqkv_fwd_ms": timed(fused, a, args.iters) * 1e3,
        "prod_fwd_ms": timed(prod, a, args.iters) * 1e3,
        "stock_fwd_ms": timed(stock, a, args.iters) * 1e3,
    }
    print(json.dumps(res))


if __name__ == "__main__":
    main()
