#!/usr/bin/env python
"""Offline evaluation CLI (reference: evaluate.py:12-121).

Restores weights/rolling from a run directory — the config travels inside
the checkpoint (reference :21-22) — rebuilds the model + eval datasets and
runs the retrieval metric suite.

    python evaluate.py --run experiments/myrun [--set test] [--bs 256]
        [--k 5000] [--metric hamming] [--append-file results.txt]
"""

from __future__ import annotations

import argparse
import json
import os

import jax

import irw_tpu  # noqa: F401
from irw_tpu.config import Config
from irw_tpu.engine.checkpoint import load_checkpoint
from irw_tpu.engine.evaluate import evaluate as engine_evaluate
from irw_tpu.getter import Getter
from irw_tpu.utils import LOGGER


def load_and_evaluate(run_dir, eval_set="test", batch_size=256, num_workers=8,
                      k=None, distance_metric=None):
    restored = load_checkpoint(run_dir)
    if restored is None:
        raise FileNotFoundError(f"no rolling checkpoint under {run_dir}")
    state, meta = restored
    config = Config(meta["config"])

    getter = Getter()
    model = getter.get_model(config.model)
    _, (host_test, device_test) = getter.get_transform(config.get("transform", {}))
    _, eval_datasets = getter.get_dataset(config.dataset)
    datasets = eval_datasets.get(eval_set) or next(iter(eval_datasets.values()))

    evaluation = (config.experience.get("evaluation") or {})
    k = k if k is not None else evaluation.get("top_k")
    distance_metric = distance_metric or evaluation.get("distance_metric", "cosine")

    variables = {"params": state["params"]}
    if state.get("batch_stats"):
        variables["batch_stats"] = state["batch_stats"]

    def apply_eval(v, x):
        return model.apply(v, x, train=False)

    metrics = engine_evaluate(
        apply_eval,
        jax.tree_util.tree_map(jax.numpy.asarray, variables),
        datasets,
        host_test,
        device_test,
        batch_size=batch_size,
        num_workers=num_workers,
        top_k=k,
        distance_metric=distance_metric,
    )
    LOGGER.info(f"eval[{eval_set}] epoch={meta['epoch']}: {metrics}")
    return metrics


def main():
    from irw_tpu.utils import enable_compile_cache
    from irw_tpu.utils.chip_lock import acquire_chip_lock

    acquire_chip_lock()  # serialize TPU attach on the shared dev chip
    enable_compile_cache()
    parser = argparse.ArgumentParser()
    parser.add_argument("--run", required=True, help="run directory (contains weights/)")
    parser.add_argument("--set", default="test")
    parser.add_argument("--bs", type=int, default=256)
    parser.add_argument("--nw", type=int, default=8)
    parser.add_argument("--k", type=int, default=None)
    parser.add_argument("--metric", default=None)
    parser.add_argument("--append-file", default=None,
                        help="append metrics as a JSON line (reference :112-121)")
    parser.add_argument("--parse-file", default=None,
                        help="file with one run dir per line (batch mode, reference :93-97)")
    args = parser.parse_args()

    runs = [args.run]
    if args.parse_file:
        with open(args.parse_file) as f:
            runs = [line.strip() for line in f if line.strip()]

    for run_dir in runs:
        metrics = load_and_evaluate(run_dir, args.set, args.bs, args.nw, args.k, args.metric)
        if args.append_file:
            with open(args.append_file, "a") as f:
                f.write(json.dumps({"run": run_dir, **{k: v for k, v in metrics.items()}}) + "\n")


if __name__ == "__main__":
    main()
