"""Profile the unfrozen flagship train step and rank device ops.

VERDICT r2 asked for evidence behind the backward≈3.6×forward observation:
this captures a ``jax.profiler`` trace of N steady-state steps and prints
the top device ops by total self time, parsed straight from the xplane
protobuf (tensorflow + tensorboard_plugin_profile are in the image).

Usage:
    python benchmarks/profile_train.py [--batch 48] [--steps 3]
        [--remat-policy dots_no_batch] [--split-cls] [--frozen] [--top 25]
"""

from __future__ import annotations

import argparse
import glob
import os
import sys
import tempfile
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def summarize_xspace(trace_dir: str, top: int = 25):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    assert paths, f"no xplane.pb under {trace_dir}"
    totals: dict[str, float] = defaultdict(float)
    counts: dict[str, int] = defaultdict(int)
    device_total = 0.0
    for path in paths:
        xspace = xplane_pb2.XSpace()
        with open(path, "rb") as f:
            xspace.ParseFromString(f.read())
        for plane in xspace.planes:
            name = plane.name.lower()
            if not ("tpu" in name or "device" in name or "/device:" in name
                    or "xla op" in name):
                continue
            ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
            for line in plane.lines:
                lname = line.name.lower()
                # XLA op lines carry per-fusion timing; step lines duplicate
                if "xla op" not in lname and "xla ops" not in lname:
                    continue
                for ev in line.events:
                    op = ev_meta.get(ev.metadata_id, "?")
                    dur = ev.duration_ps / 1e9  # ps → ms
                    totals[op] += dur
                    counts[op] += 1
                    device_total += dur
    ranked = sorted(totals.items(), key=lambda kv: -kv[1])
    return ranked[:top], device_total


def classify(op: str) -> str:
    o = op.lower()
    if "fusion" in o and ("dot" in o or "conv" in o):
        return "matmul-fused"
    for key, tag in (("dot", "matmul"), ("conv", "conv"),
                     ("transpose", "transpose"), ("reduce", "reduce"),
                     ("copy", "copy/layout"), ("all-reduce", "collective"),
                     ("fusion", "elementwise-fused"), ("scatter", "scatter"),
                     ("dynamic", "dynamic-slice")):
        if key in o:
            return tag
    return "other"


def main():
    from irw_tpu.utils.chip_lock import acquire_chip_lock

    acquire_chip_lock()  # serialize TPU attach on the shared dev chip
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=48)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--remat-policy", default="dots_no_batch")
    ap.add_argument("--split-cls", action="store_true")
    ap.add_argument("--vmem-attn", action="store_true")
    ap.add_argument("--ln-fused", action="store_true")
    ap.add_argument("--frozen", action="store_true")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--trace-dir", default=None,
                    help="keep the trace here (default: temp dir)")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    import importlib.util as ilu

    spec = ilu.spec_from_file_location(
        "irw_train_bench",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "train_bench.py"))
    tb = ilu.module_from_spec(spec)
    spec.loader.exec_module(tb)

    step, state, batch, entries = tb.build(
        args.batch, args.frozen, remat_policy=args.remat_policy,
        split_cls=args.split_cls, vmem_attn=args.vmem_attn,
        ln_fused=args.ln_fused)

    from irw_tpu.engine.train import _build_hyper

    hyper = _build_hyper(entries, epoch=1, step=0, warm_up=0, warm_up_key=None)
    # build() already returns the jitted (donating) step — reuse it so the
    # persistent-cache entry from train_bench is a hit, not a re-trace
    dev_batch = {k: jax.device_put(np.asarray(v)) for k, v in batch.items()}
    state, metrics = step(state, dev_batch, hyper)  # compile + warm
    np.asarray(metrics["total_loss"])

    trace_dir = args.trace_dir or tempfile.mkdtemp(prefix="irw_trace_")
    with jax.profiler.trace(trace_dir):
        for _ in range(args.steps):
            state, metrics = step(state, dev_batch, hyper)
        np.asarray(metrics["total_loss"])  # hard sync inside the trace

    ranked, device_total = summarize_xspace(trace_dir, args.top)
    print(f"trace: {trace_dir}; device op time total "
          f"{device_total:.1f} ms over {args.steps} steps "
          f"({device_total / args.steps:.1f} ms/step)")
    by_class: dict[str, float] = defaultdict(float)
    for op, ms in ranked:
        by_class[classify(op)] += ms
    print(f"{'ms':>9}  {'%':>5}  op")
    for op, ms in ranked:
        print(f"{ms:9.2f}  {100 * ms / max(device_total, 1e-9):5.1f}  {op[:110]}")
    print("\nby class (top ops only):")
    for cls, ms in sorted(by_class.items(), key=lambda kv: -kv[1]):
        print(f"  {cls:20s} {ms:9.2f} ms  {100 * ms / max(device_total, 1e-9):5.1f}%")


if __name__ == "__main__":
    main()
