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
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from bench import build_pipeline
    from irw_tpu.ops.metrics import compute_retrieval_metrics

    n, batch = 5717, 64
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

    def embed_set(seed):
        keys = jax.random.split(jax.random.PRNGKey(seed), -(-n // batch))
        chunks = [embed_chunk(variables, k) for k in keys]
        return jnp.concatenate(chunks, axis=0)[:n]

    np.asarray(embed_chunk(variables, jax.random.PRNGKey(9)))  # compile

    rng = np.random.RandomState(0)
    q_labels = (rng.rand(n, 20) > 0.85).astype(np.float32)
    g_labels = (rng.rand(n, 20) > 0.85).astype(np.float32)

    t0 = time.perf_counter()
    q_codes = embed_set(1)
    g_codes = embed_set(2)
    res = compute_retrieval_metrics(
        q_codes, jnp.asarray(q_labels), g_codes, jnp.asarray(g_labels),
        metric="hamming", k=n, with_hashing_stats=True,
    )
    total = time.perf_counter() - t0
    print(f"full VOC-scale eval (embed 2x{n} @224^2 + full metric suite): "
          f"{total:.2f}s  (map={res['map']:.4f})")


if __name__ == "__main__":
    main()
