#!/usr/bin/env python
"""Roxford-scale landmark-eval wall clock (manual; results → BASELINE.md).

Shapes follow revisited-Oxford5k: 70 queries × 4993 gallery, 2048-d
descriptors, ~250 positives/junk per query.  Measures the batched
junk-corrected mAP (engine/landmark.py) on the attached accelerator.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from irw_tpu.engine.landmark import landmark_evaluation
    from irw_tpu.utils.chip_lock import acquire_chip_lock

    acquire_chip_lock()  # serialize TPU attach on the shared dev chip
    rng = np.random.RandomState(0)
    nq, ng, d = 70, 4993, 2048
    q = rng.randn(nq, d).astype(np.float32)
    g = rng.randn(ng, d).astype(np.float32)
    gnd = []
    for _ in range(nq):
        perm = rng.permutation(ng)
        gnd.append({"easy": perm[:120], "hard": perm[120:250],
                    "junk": perm[250:400]})

    out = landmark_evaluation(q, g, gnd)  # compile + warm
    t0 = time.perf_counter()
    iters = 5
    for _ in range(iters):
        out = landmark_evaluation(q, g, gnd)
    dt = (time.perf_counter() - t0) / iters
    print(f"roxford-scale landmark eval ({nq}x{ng}, {d}-d, medium+hard): "
          f"{dt*1000:.0f} ms  (maps: {out})")


if __name__ == "__main__":
    main()
