"""Loader-FED sustained training throughput (VERDICT r4 missing #4).

The reference's training is DataLoader-fed end to end
(/root/reference/main/engine/train.py:61-66); every prior headline here
timed a device-resident synthetic batch.  This bench drives the REAL
pipeline: synthetic JPEGs on disk → ImageFolderDataset → EpochLoader
(native C++ decode + the voc_swt train augmentations, thread pool,
bounded prefetch) → the unfrozen flagship train step on the chip — and
reports the sustained img/s with all three legs overlapped, plus each
leg's solo rate so the binding constraint is explicit:

- host leg: EpochLoader alone (decode+augment into uint8 batches);
- device leg: the jitted step on a resident batch (train_bench.measure);
- transfer leg: host→device put of one batch (the axon dev tunnel is
  ~15 MB/s — on a production TPU host this is PCIe/DMA at GB/s, so the
  tunnel number is a dev-rig artifact, not a TPU property).

One JSON line out.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_jpeg_tree(n: int, size: int, root: str, n_classes: int = 8):
    from PIL import Image

    rs = np.random.RandomState(0)
    for k in range(n):
        cls = os.path.join(root, f"class_{k % n_classes}")
        os.makedirs(cls, exist_ok=True)
        w = size + int(rs.randint(-size // 4, size // 4))
        h = size + int(rs.randint(-size // 4, size // 4))
        Image.fromarray(rs.randint(0, 256, (h, w, 3), np.uint8)).save(
            os.path.join(cls, f"im{k}.jpg"), quality=90)


VOC_SWT_HOST = [
    ("Resize", {"size": 256}),
    ("RandomResizedCrop", {"scale": [0.16, 1], "ratio": [0.75, 1.33],
                           "size": 224}),
    ("ColorJitter", {"brightness": 0.25, "contrast": 0.25,
                     "saturation": 0.25, "hue": 0}),
    ("RandomHorizontalFlip", {"p": 0.5}),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=960, help="jpegs on disk")
    ap.add_argument("--size", type=int, default=500)
    ap.add_argument("--batch", type=int, default=48)
    ap.add_argument("--workers", type=int, default=8)
    ap.add_argument("--epochs", type=int, default=3,
                    help="timed passes over the jpeg set (first untimed "
                         "pass covers compile)")
    ap.add_argument("--ln-fused", action="store_true")
    ap.add_argument("--host-only", action="store_true",
                    help="skip the chip: loader leg only")
    args = ap.parse_args()

    from irw_tpu.data.datasets_image import ImageFolderDataset
    from irw_tpu.data.loader import EpochLoader
    from irw_tpu.transforms.pipeline import HostTransform

    with tempfile.TemporaryDirectory() as root:
        make_jpeg_tree(args.n, args.size, root)
        dataset = ImageFolderDataset(root, mode="all")
        n = len(dataset.labels)
        host_t = HostTransform(VOC_SWT_HOST)
        order = np.arange(n)
        batches = [order[i:i + args.batch]
                   for i in range(0, n - args.batch + 1, args.batch)]

        def one_pass(seed, consume):
            loader = EpochLoader(dataset, batches, host_t,
                                 num_workers=args.workers, train=True,
                                 seed=seed)
            t0 = time.perf_counter()
            for b in loader:
                consume(b)
            return time.perf_counter() - t0

        # --- host leg: loader alone ---
        imgs_per_pass = len(batches) * args.batch
        one_pass(0, lambda b: None)  # warm (thread pool, page cache)
        host_dt = sum(one_pass(e, lambda b: None) for e in range(2)) / 2
        host_ips = imgs_per_pass / host_dt

        result = {
            "metric": "loader_fed_train_throughput",
            "unit": "images/sec",
            "host_loader_ips": round(host_ips, 1),
            "workers": args.workers,
            "batch": args.batch,
            "pipeline": "voc_swt train (native decode + ColorJitter/flip)",
        }

        if not args.host_only:
            import importlib.util as ilu

            import jax

            from irw_tpu.utils.chip_lock import acquire_chip_lock

            acquire_chip_lock()
            spec = ilu.spec_from_file_location(
                "irw_train_bench",
                os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "train_bench.py"))
            tb = ilu.module_from_spec(spec)
            spec.loader.exec_module(tb)
            step, state, dev_batch, entries = tb.build(
                args.batch, frozen=False, remat_policy="nothing",
                vmem_attn=True, ln_fused=args.ln_fused)

            # transfer leg: host→device put of one uint8 batch
            sample = next(iter(EpochLoader(dataset, batches[:1], host_t,
                                           num_workers=args.workers,
                                           train=True, seed=0)))
            img = np.ascontiguousarray(sample["image"])
            dev = jax.devices()[0]
            jax.device_put(img, dev).block_until_ready()  # warm path
            t0 = time.perf_counter()
            reps = 3
            for _ in range(reps):
                np.asarray(jax.device_put(img, dev))  # put + fetch sync
            put_dt = (time.perf_counter() - t0) / reps / 2  # half: one-way
            result["transfer_ips"] = round(args.batch / put_dt, 1)
            result["transfer_MBps"] = round(img.nbytes / put_dt / 1e6, 1)

            # --- overlapped end-to-end: loader feeds the step ---
            from irw_tpu.engine.train import _build_hyper

            hyper = _build_hyper(entries, epoch=1, step=0, warm_up=0,
                                 warm_up_key=None)
            st = state  # tb.build's step is already jitted (donated state)

            def consume(b):
                nonlocal st
                st, _ = step(st, {"image": b["image"], "label": b["label"],
                                  "index": b["index"]}, hyper)

            one_pass(0, consume)  # compile + warm
            np.asarray(jax.tree_util.tree_leaves(st.params)[0])  # sync
            t0 = time.perf_counter()
            for e in range(args.epochs):
                one_pass(e + 1, consume)
            np.asarray(jax.tree_util.tree_leaves(st.params)[0])
            dt = time.perf_counter() - t0
            result["value"] = round(args.epochs * imgs_per_pass / dt, 1)

            # device leg LAST (tb.measure donates the state it is given —
            # running it first would invalidate `state` for the loop above)
            dev_dt, _, _ = tb.measure(step, st, dev_batch, entries,
                                      args.batch, iters=5)
            result["device_step_ips"] = round(args.batch / dev_dt, 1)
        else:
            result["value"] = result["host_loader_ips"]

        print(json.dumps(result))


if __name__ == "__main__":
    main()
