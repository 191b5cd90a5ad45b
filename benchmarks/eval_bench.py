#!/usr/bin/env python
"""Full VOC-scale retrieval-eval wall-clock on chip (the BASELINE.md north
star: DWT-featurize + embed + full-matrix eval).

Generates VOC-sized (5717 query + 5717 gallery) device-resident images so
the number isolates on-chip work from the dev tunnel's host→device
bandwidth, embeds them through the flagship pipeline in batches, then runs
the full Hamming metric suite.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import argparse

    import jax
    import jax.numpy as jnp

    from irw_tpu.utils.chip_lock import acquire_chip_lock

    acquire_chip_lock()  # serialize TPU attach on the shared dev chip

    ap = argparse.ArgumentParser()
    ap.add_argument("--n-query", type=int, default=5717)
    ap.add_argument("--n-gallery", type=int, default=5717)
    ap.add_argument("--classes", type=int, default=20)
    args = ap.parse_args()

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from bench import build_pipeline
    from irw_tpu.ops.metrics import compute_retrieval_metrics

    nq, ng, batch = args.n_query, args.n_gallery, 64
    model, pipeline = build_pipeline()
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
            "band_drop": jax.random.PRNGKey(2)}
    variables = jax.jit(lambda r, x: model.init(r, x, train=False))(
        rngs, jnp.zeros((1, 4, 224, 224, 3))
    )

    @jax.jit
    def embed_chunk(v, key):
        imgs = jax.random.randint(key, (batch, 224, 224, 3), 0, 255, jnp.int32).astype(jnp.uint8)
        return pipeline(v, imgs)

    def embed_set(seed, n):
        keys = jax.random.split(jax.random.PRNGKey(seed), -(-n // batch))
        chunks = [embed_chunk(variables, k) for k in keys]
        return jnp.concatenate(chunks, axis=0)[:n]

    np.asarray(embed_chunk(variables, jax.random.PRNGKey(9)))  # compile

    rng = np.random.RandomState(0)
    q_labels = (rng.rand(nq, args.classes) > 0.85).astype(np.float32)
    g_labels = (rng.rand(ng, args.classes) > 0.85).astype(np.float32)

    t0 = time.perf_counter()
    q_codes = embed_set(1, nq)
    g_codes = embed_set(2, ng)
    res = compute_retrieval_metrics(
        q_codes, jnp.asarray(q_labels), g_codes, jnp.asarray(g_labels),
        metric="hamming", k=ng, with_hashing_stats=True,
    )
    total = time.perf_counter() - t0
    print(f"full eval (embed {nq}+{ng} @224^2 + full metric suite, "
          f"{args.classes} classes): {total:.2f}s  (map={res['map']:.4f})")


if __name__ == "__main__":
    main()
