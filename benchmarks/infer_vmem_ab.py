#!/usr/bin/env python
"""Inference A/B: VMEM attention kernel (+fused LN) on the FROZEN flagship.

The factory's vmem_attn default engages only for unfrozen models
(models/factory.py) — the 1832 img/s / 45.6% MFU inference headline has
never used the kernel, yet the forward also materialises the (N, N)
attention tensors in HBM.  This sweeps {stock, vmem, vmem+ln_fused} at the
bench batch (64) and the knee neighbourhood, one JSON line per variant.
Results → BASELINE.md; if vmem wins, bench.py's headline adopts it.
"""

import importlib.util
import json
import os
import sys
import time

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.abspath(os.path.join(_HERE, os.pardir)))
spec = importlib.util.spec_from_file_location(
    "irw_bench", os.path.join(_HERE, os.pardir, "bench.py"))
bench = importlib.util.module_from_spec(spec)
spec.loader.exec_module(bench)


def main():
    import jax

    from irw_tpu.utils.chip_lock import acquire_chip_lock

    acquire_chip_lock()
    if jax.default_backend() != "cpu":
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(_HERE, os.pardir, ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    import jax.numpy as jnp

    from irw_tpu.utils.flops import device_peak_flops, flagship_forward_flops

    accel = jax.devices()[0]
    fwd = flagship_forward_flops()
    peak, peak_label = device_peak_flops(accel)
    rng = np.random.RandomState(0)

    variables = None
    batches = [int(b) for b in (sys.argv[1:] or [48, 64, 96])]
    for label, kw in (("stock", {}),
                      ("vmem", {"vmem_attn": True}),
                      ("vmem+ln", {"vmem_attn": True, "ln_fused": True})):
        model, pipeline = bench.build_pipeline(**kw)
        if variables is None:  # identical param tree across variants
            init_rngs = {"params": jax.random.PRNGKey(0),
                         "dropout": jax.random.PRNGKey(1),
                         "band_drop": jax.random.PRNGKey(2)}
            sample = jnp.zeros((1, 4, 224, 224, 3), jnp.float32)
            variables = jax.jit(lambda r, x: model.init(r, x, train=False))(
                init_rngs, sample)
        for b in batches:
            batch = rng.randint(0, 255, (b, 224, 224, 3), dtype=np.uint8)
            dt = bench.time_pipeline(accel, batch, iters=10,
                                     variables=variables, pipeline=pipeline)
            ips = b / dt
            print(json.dumps({
                "variant": label, "batch": b,
                "ips": round(ips, 1),
                "ms": round(dt * 1000, 2),
                "mfu": round(fwd * ips / peak, 4),
                "peak": peak_label,
            }), flush=True)


if __name__ == "__main__":
    main()
