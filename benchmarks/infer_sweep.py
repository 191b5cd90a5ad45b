#!/usr/bin/env python
"""Inference batch-size sweep on the flagship SWT+embed pipeline.

Round-2 found batch 64 optimal (vs 128/256) for the f32 pipeline; the
round-3 bf16 residual carry changed the HBM working set, so re-scan the
knee.  Reuses bench.py's build_pipeline/time_pipeline (same program the
driver contract measures).  Not part of the bench.py contract — run
manually; results recorded in BASELINE.md.
"""

import importlib.util
import os
import sys

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
# `python benchmarks/infer_sweep.py` puts benchmarks/ (not the repo root)
# at sys.path[0]; bench.py's `from irw_tpu...` imports need the root
sys.path.insert(0, os.path.abspath(os.path.join(_HERE, os.pardir)))
spec = importlib.util.spec_from_file_location(
    "irw_bench", os.path.join(_HERE, os.pardir, "bench.py"))
bench = importlib.util.module_from_spec(spec)
spec.loader.exec_module(bench)


def main():
    import jax

    from irw_tpu.utils.chip_lock import acquire_chip_lock

    acquire_chip_lock()  # serialize TPU attach on the shared dev chip
    if jax.default_backend() != "cpu":
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(_HERE, os.pardir, ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    import jax.numpy as jnp

    model, pipeline = bench.build_pipeline()
    init_rngs = {
        "params": jax.random.PRNGKey(0),
        "dropout": jax.random.PRNGKey(1),
        "band_drop": jax.random.PRNGKey(2),
    }
    sample = jnp.zeros((1, 4, 224, 224, 3), jnp.float32)
    variables = jax.jit(lambda r, x: model.init(r, x, train=False))(
        init_rngs, sample)

    from irw_tpu.utils.flops import device_peak_flops, flagship_forward_flops

    accel = jax.devices()[0]
    fwd = flagship_forward_flops()
    peak, peak_label = device_peak_flops(accel)

    rng = np.random.RandomState(0)
    batches = [int(b) for b in (sys.argv[1:] or [48, 64, 96, 128, 192, 256])]
    for b in batches:
        batch = rng.randint(0, 255, (b, 224, 224, 3), dtype=np.uint8)
        dt = bench.time_pipeline(accel, batch, iters=10,
                                 variables=variables, pipeline=pipeline)
        ips = b / dt
        print(f"batch {b:4d}: {dt * 1000:7.1f} ms -> {ips:7.1f} img/s "
              f"| MFU {fwd * ips / peak * 100:.1f}% of {peak_label}",
              flush=True)


if __name__ == "__main__":
    main()
