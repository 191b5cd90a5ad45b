#!/usr/bin/env python
"""Snapshot a finished study into a committable results directory.

``experiments/`` is gitignored (checkpoints live there), but the study's
*evidence* — per-run metrics.jsonl and the derived learning curves /
aggregate table — belongs in git.  This tool copies each run's
metrics.jsonl under ``studies/results/<study>/`` and renders a REPORT.md
with per-run learning curves, the final aggregate (same grouping as
aggregate_results.py), and epoch wall-clock accounting.

The reference kept run artifacts only in ad-hoc home directories read back
by studies/aggregate_results.py:17-28; committing the snapshot is the
auditable equivalent.

Usage::

    python studies/snapshot_results.py --log-dir experiments/protocol \
        --study voc_lambda_protocol --metric test/map_level0
"""

from __future__ import annotations

import argparse
import json
import os
import shutil

import numpy as np

from aggregate_results import aggregate, collect_runs  # noqa: E402 (sibling)


def read_series(run_dir: str):
    """metrics.jsonl -> {metric: [(step, value), ...]} plus epoch timing."""
    path = os.path.join(run_dir, "metrics.jsonl")
    series: dict[str, list] = {}
    if not os.path.exists(path):
        return series
    with open(path) as f:
        for line in f:
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                continue
            step = rec.get("step")
            for key, value in rec.items():
                if key == "step" or not isinstance(value, (int, float)):
                    continue
                series.setdefault(key, []).append((step, float(value)))
    return series


def fmt(value: float) -> str:
    return f"{value:.4f}"


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--log-dir", default="experiments/protocol")
    parser.add_argument("--study", required=True)
    parser.add_argument("--metric", default="test/map_level0")
    parser.add_argument("--out", default=None,
                        help="default: studies/results/<study>/")
    args = parser.parse_args()

    out_dir = args.out or os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "results", args.study)
    os.makedirs(out_dir, exist_ok=True)

    runs = collect_runs(args.log_dir, args.study)
    if not runs:
        raise SystemExit(f"no runs matching {args.study}* under {args.log_dir}")

    lines = [f"# {args.study} — study snapshot", ""]
    curve_rows: dict[int, dict[str, float]] = {}
    run_names = []
    total_train_s = 0.0

    for run_dir, _last in runs:
        name = os.path.basename(run_dir)
        run_names.append(name)
        shutil.copyfile(os.path.join(run_dir, "metrics.jsonl"),
                        os.path.join(out_dir, f"{name}.metrics.jsonl"))
        series = read_series(run_dir)

        for step, value in series.get(args.metric, []):
            curve_rows.setdefault(int(step), {})[name] = value

        steps = series.get("train/step_seconds", [])
        datas = dict(series.get("train/data_seconds", []))
        epoch_s = [s + datas.get(step, 0.0) for step, s in steps]
        run_train_s = float(np.sum(epoch_s)) if epoch_s else 0.0
        total_train_s += run_train_s
        losses = series.get("train/total_loss", [])
        bmap = series.get("train/batch_map", [])
        lines.append(
            f"- **{name}**: {len(steps)} epochs logged, "
            f"train loss {fmt(losses[0][1])} → {fmt(losses[-1][1])}"
            + (f", batch_map {fmt(bmap[0][1])} → {fmt(bmap[-1][1])}" if bmap else "")
            + f", epoch wall-clock median "
            f"{fmt(float(np.median(epoch_s)) if epoch_s else 0.0)}s "
            f"(total {run_train_s/60:.1f} min train-loop)"
            if losses else f"- **{name}**: no train records")
    lines.append("")

    lines.append(f"## Learning curves — `{args.metric}` per eval epoch")
    lines.append("")
    short = {n: n.split(args.study, 1)[-1].strip("_") or n for n in run_names}
    header = "| epoch | " + " | ".join(short[n] for n in run_names) + " |"
    lines.append(header)
    lines.append("|" + "---|" * (len(run_names) + 1))
    for epoch in sorted(curve_rows):
        row = curve_rows[epoch]
        cells = [fmt(row[n]) if n in row else "—" for n in run_names]
        lines.append(f"| {epoch} | " + " | ".join(cells) + " |")
    lines.append("")

    lines.append(f"## Final aggregate (mean±std over seeds) — `{args.metric}`")
    lines.append("")
    summary = aggregate(runs, args.metric)
    lines.append("| group | mean | std | n |")
    lines.append("|---|---|---|---|")
    for gname, (mean, std, n) in sorted(summary.items()):
        lines.append(f"| {gname} | {fmt(mean)} | {fmt(std)} | {n} |")
    lines.append("")
    lines.append(f"Total train-loop time across runs: "
                 f"{total_train_s/3600:.2f} h (excl. eval/ckpt/compile).")
    lines.append("")

    report = os.path.join(out_dir, "REPORT.md")
    with open(report, "w") as f:
        f.write("\n".join(lines))
    print(f"snapshot: {len(runs)} runs -> {out_dir}")
    print("\n".join(lines[-12:]))


if __name__ == "__main__":
    main()
