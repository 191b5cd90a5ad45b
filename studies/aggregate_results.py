#!/usr/bin/env python
"""Aggregate study results (reference: studies/aggregate_results.py).

Reads each run's metrics.jsonl (last value per metric) + the config embedded
in weights/rolling, groups runs over the non-seed swept parameters and
prints mean±std per group.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
from collections import defaultdict

import numpy as np


def read_last_metrics(run_dir: str) -> dict:
    path = os.path.join(run_dir, "metrics.jsonl")
    if not os.path.exists(path):
        return {}
    last: dict = {}
    with open(path) as f:
        for line in f:
            try:
                last.update(json.loads(line))
            except json.JSONDecodeError:
                continue
    return last


def read_tensorboard_scalars(run_dir: str) -> dict:
    """Last value of every scalar in a run's TensorBoard event files —
    the reference aggregated OLD runs this way
    (studies/aggregate_results.py:51-62 `read_last_scalar` via
    EventAccumulator); this restores that path so pre-existing reference
    run directories (or ours, which also write TB) aggregate without a
    metrics.jsonl."""
    try:
        from tensorboard.backend.event_processing.event_accumulator import (
            EventAccumulator,
        )
    except Exception:
        return {}
    event_files = glob.glob(os.path.join(run_dir, "**", "events.out.tfevents.*"),
                            recursive=True)
    if not event_files:
        return {}
    out: dict = {}
    for base in sorted({os.path.dirname(p) for p in event_files}):
        try:
            acc = EventAccumulator(base, size_guidance={"scalars": 0})
            acc.Reload()
            for tag in acc.Tags().get("scalars", []):
                events = acc.Scalars(tag)
                if events:
                    out[tag.replace("/", "_")] = float(events[-1].value)
        except Exception:
            continue
    return out


def read_config(run_dir: str) -> dict:
    """Config from the rolling checkpoint (the reference recovers swept
    values the same way, aggregate_results.py:44-48)."""
    try:
        from irw_tpu.engine.checkpoint import load_checkpoint

        restored = load_checkpoint(run_dir)
        if restored is not None:
            return restored[1].get("config") or {}
    except Exception:
        pass
    return {}


def collect_runs(log_dir: str, study_prefix: str):
    runs = []
    for run_dir in sorted(glob.glob(os.path.join(log_dir, f"{study_prefix}*"))):
        metrics = read_last_metrics(run_dir)
        if not metrics:  # no metrics.jsonl: fall back to TensorBoard scalars
            metrics = read_tensorboard_scalars(run_dir)
        if metrics:
            runs.append((run_dir, metrics))
    return runs


def aggregate(runs, metric_key: str, group_on_seed: bool = False,
              renames: dict | None = None):
    """Group by experiment name minus the seed component.

    ``renames`` maps swept-key names to canonical ones in group names
    (e.g. ``{"ortho_scale": "ortho_weight"}``): runs swept through the
    runtime ``experience.ortho_scale`` knob (one shared compile, base
    ortho_weight pinned 1.0, effective λ = scale) join the groups of runs
    that swept ``fusion_config.ortho_weight`` directly."""
    groups = defaultdict(list)
    for run_dir, metrics in runs:
        name = os.path.basename(run_dir)
        if not group_on_seed:
            parts = [p for p in name.split("_") if not p.startswith("seed=")]
            name = "_".join(parts)
        for old, new in (renames or {}).items():
            name = name.replace(f"{old}=", f"{new}=")
        value = metrics.get(metric_key)
        if value is not None:
            groups[name].append(value)
    return {
        name: (float(np.mean(vals)), float(np.std(vals)), len(vals))
        for name, vals in groups.items()
    }


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--log-dir", default="experiments")
    parser.add_argument("--study", required=True)
    parser.add_argument("--metric", default="test/map_level0",
                        help="comma-separated metric keys; the first is the "
                             "one printed/CSV'd, all appear in --markdown")
    parser.add_argument("--csv", default=None)
    parser.add_argument("--markdown", default=None,
                        help="write a committable mean±std markdown table "
                             "(one column per metric, one row per swept group)")
    parser.add_argument("--rename", action="append", default=[],
                        metavar="OLD=NEW",
                        help="canonicalize a swept key in group names, e.g. "
                             "--rename ortho_scale=ortho_weight joins runtime-λ "
                             "runs with baked-λ runs of the same study")
    args = parser.parse_args()

    renames = dict(r.split("=", 1) for r in args.rename)
    metrics = [m.strip() for m in args.metric.split(",") if m.strip()]
    runs = collect_runs(args.log_dir, args.study)
    print(f"{len(runs)} runs found")
    summary = aggregate(runs, metrics[0], renames=renames)
    rows = []
    for name, (mean, std, n) in sorted(summary.items()):
        print(f"  {name}: {mean:.4f} ± {std:.4f} (n={n})")
        rows.append({"group": name, "mean": mean, "std": std, "n": n})
    if args.csv:
        import csv

        with open(args.csv, "w", newline="") as f:
            writer = csv.DictWriter(f, fieldnames=["group", "mean", "std", "n"])
            writer.writeheader()
            writer.writerows(rows)
    if args.markdown:
        per_metric = {m: aggregate(runs, m, renames=renames) for m in metrics}
        groups = sorted({g for s in per_metric.values() for g in s})
        lines = [
            f"# {args.study} — aggregate (mean ± std over seeds)",
            "",
            f"{len(runs)} runs under `{args.log_dir}`; generated by "
            "`studies/aggregate_results.py --markdown` (reference analog: "
            "studies/aggregate_results.py printed means only).",
            "",
            "| group | " + " | ".join(metrics) + " | n |",
            "|---|" + "---|" * (len(metrics) + 1),
        ]
        for g in groups:
            cells, ns = [], []
            for m in metrics:
                got = per_metric[m].get(g)
                if got is None:
                    cells.append("—")
                    ns.append(0)
                else:
                    mean, std, n = got
                    cells.append(f"{mean:.4f} ± {std:.4f}")
                    ns.append(n)
            # n per metric (a crashed seed can log train/* but no test/*):
            # one number when they agree, else per-metric counts in order
            n_cell = (str(ns[0]) if len(set(ns)) == 1
                      else "/".join(str(n) for n in ns))
            lines.append(f"| {g} | " + " | ".join(cells) + f" | {n_cell} |")
        with open(args.markdown, "w") as f:
            f.write("\n".join(lines) + "\n")
        print(f"markdown table -> {args.markdown}")


if __name__ == "__main__":
    main()
