"""Micro-benchmark: VMEM-resident fused attention vs the stock XLA einsum
attention, at the flagship shape (bands*B=192, N=257, H=6, hd=64, bf16).

Times fwd and fwd+bwd with a host fetch per iter batch (block_until_ready
does not sync through the axon tunnel — CLAUDE.md).  One JSON line out.
"""

import argparse
import json
import os
import sys
import time

# python benchmarks/vmem_attn_micro.py puts benchmarks/ at sys.path[0];
# the irw_tpu imports need the repo root (same fix as infer_sweep.py)
sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                os.pardir)))

import jax
import jax.numpy as jnp
import numpy as np

from irw_tpu.utils.chip_lock import acquire_chip_lock
from irw_tpu.ops.vmem_attention import fused_attention


def ref_attention(q, k, v):
    hd = q.shape[-1]
    s = jnp.einsum("...qhd,...khd->...hqk", q / jnp.sqrt(hd).astype(q.dtype), k)
    p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("...hqk,...khd->...qhd", p, v)


def timed(fn, args, iters):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0][0, 0])  # sync via fetch
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0][0, 0])
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=192)
    ap.add_argument("--n", type=int, default=257)
    ap.add_argument("--h", type=int, default=6)
    ap.add_argument("--hd", type=int, default=64)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--bb-fwd", type=int, default=8)
    ap.add_argument("--bb-bwd", type=int, default=4)
    args = ap.parse_args()

    acquire_chip_lock()
    rng = np.random.RandomState(0)
    shape = (args.b, args.n, args.h, args.hd)
    q, k, v = (jnp.asarray(rng.randn(*shape), jnp.bfloat16) for _ in range(3))
    cot = jnp.asarray(rng.randn(*shape), jnp.bfloat16)

    fused = jax.jit(lambda q, k, v: fused_attention(
        q, k, v, block_b_fwd=args.bb_fwd, block_b_bwd=args.bb_bwd))
    ref = jax.jit(ref_attention)

    # correctness on-device first
    of, orf = fused(q, k, v), ref(q, k, v)
    diff = float(jnp.abs(of.astype(jnp.float32) - orf.astype(jnp.float32)).max())

    def g_fused(q, k, v):
        return jax.grad(lambda q, k, v: jnp.sum(
            fused_attention(q, k, v, block_b_fwd=args.bb_fwd,
                            block_b_bwd=args.bb_bwd).astype(jnp.float32)
            * cot.astype(jnp.float32)), (0, 1, 2))(q, k, v)

    def g_ref(q, k, v):
        return jax.grad(lambda q, k, v: jnp.sum(
            ref_attention(q, k, v).astype(jnp.float32)
            * cot.astype(jnp.float32)), (0, 1, 2))(q, k, v)

    g_fused_j, g_ref_j = jax.jit(g_fused), jax.jit(g_ref)
    gf, gr = g_fused_j(q, k, v), g_ref_j(q, k, v)
    gdiff = max(float(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)).max())
                for a, b in zip(gf, gr))

    res = {
        "shape": list(shape),
        "fwd_maxdiff": diff,
        "grad_maxdiff": gdiff,
        "fused_fwd_ms": timed(fused, (q, k, v), args.iters) * 1e3,
        "ref_fwd_ms": timed(ref, (q, k, v), args.iters) * 1e3,
        "fused_fwdbwd_ms": timed(g_fused_j, (q, k, v), args.iters) * 1e3,
        "ref_fwdbwd_ms": timed(g_ref_j, (q, k, v), args.iters) * 1e3,
        "bb_fwd": args.bb_fwd, "bb_bwd": args.bb_bwd,
    }
    print(json.dumps(res))


if __name__ == "__main__":
    main()
