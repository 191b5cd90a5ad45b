#!/usr/bin/env python
"""Paired-by-seed sweep analysis: Δ(metric) vs a baseline sweep value
computed WITHIN each seed, so run-to-run seed variance cancels.

Why this exists: the hard-VOC λ study's seed σ on final mAP is ~0.037 —
far larger than realistic λ effects. But every sweep value shares the same
seed set, and within a seed the training trajectories are nearly paired
(same data order, same init), so Δ(λ, seed) = m(λ, seed) − m(λ₀, seed) has
σ ≈ 0.001: a 30× sensitivity gain for free. The reference's
aggregate_results.py (studies/aggregate_results.py:51-86) only reported
unpaired group means and could not have resolved these effects.

Usage::

    python studies/paired_analysis.py --log-dir experiments/protocol_hard_cpu \
        --study voc_lambda_hard_cpu --sweep-key ortho_scale --baseline 0 \
        --metrics test/maphashing_level0,train/ortho_raw

Prints a markdown table: per sweep value, mean ± std of each metric over
seeds, plus the paired Δ of the FIRST metric vs the baseline sweep value.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re


def read_last(run_dir: str) -> dict:
    last: dict = {}
    path = os.path.join(run_dir, "metrics.jsonl")
    if not os.path.exists(path):
        return last
    with open(path) as f:
        for line in f:
            try:
                last.update(json.loads(line))
            except json.JSONDecodeError:
                continue
    return last


def collect(log_dir: str, study: str, sweep_key: str, group_key: str | None = None):
    """{(group_value, sweep_value, seed): last-metrics} from run-dir names of
    the run_plan convention ``<study>_<key>=<value>_seed=<seed>`` (any order).
    With no ``group_key`` the group value is fixed at 0.0.

    ``sweep_key`` (and ``group_key``) accept comma-separated ALIASES — e.g.
    ``ortho_weight,ortho_scale`` joins runs that swept the baked fusion λ
    with runs that swept the runtime ``experience.ortho_scale`` knob (base
    weight pinned 1.0, effective λ = scale) into one sweep axis."""
    runs = {}

    def as_num(v: str) -> float:
        # boolean sweeps (e.g. use_bn) render as True/False in run names
        if v in ("True", "true"):
            return 1.0
        if v in ("False", "false"):
            return 0.0
        return float(v)

    sweep_keys = [k.strip() for k in sweep_key.split(",") if k.strip()]
    group_keys = ([k.strip() for k in group_key.split(",") if k.strip()]
                  if group_key else [])

    def key_pat(keys):
        alt = "|".join(re.escape(k) for k in keys)
        return re.compile(rf"(?:^|_)(?:{alt})=([^_/]+)")

    pat = key_pat(sweep_keys)
    seed_pat = re.compile(r"(?:^|_)seed=(\d+)")
    grp_pat = key_pat(group_keys) if group_keys else None
    # a run name is <study> followed by _<known-key>=... — requiring the
    # known key right after the prefix keeps a study whose name extends
    # this one (voc_lambda_hard_cpu vs …_hard_cpu_binding) out of the set
    known = "|".join(re.escape(k) for k in (*sweep_keys, *group_keys, "seed"))
    name_pat = re.compile(rf"^{re.escape(study)}_(?:{known})=")
    for d in sorted(glob.glob(os.path.join(log_dir, f"{study}_*"))):
        name = os.path.basename(d)
        if not name_pat.match(name):
            continue
        m, s = pat.search(name), seed_pat.search(name)
        if not (m and s):
            continue
        g = 0.0
        if grp_pat is not None:
            gm = grp_pat.search(name)
            if not gm:
                continue
            g = as_num(gm.group(1))
        last = read_last(d)
        if last:
            runs[(g, as_num(m.group(1)), int(s.group(1)))] = last
    return runs


def mean_std(vals):
    vals = [v for v in vals if v is not None]
    if not vals:
        return float("nan"), float("nan"), 0
    mu = sum(vals) / len(vals)
    sd = (sum((v - mu) ** 2 for v in vals) / len(vals)) ** 0.5
    return mu, sd, len(vals)


def resolve_metrics(runs, metrics):
    """Exact metric keys pass through; bare names resolve by unique
    '/'-suffix (``maphashing_level0`` → ``test/maphashing_level0``).  An
    unknown or ambiguous name raises instead of silently rendering NaNs.
    """
    available = sorted({k for last in runs.values() for k in last})
    resolved = []
    for m in metrics:
        if any(m in last for last in runs.values()):
            resolved.append(m)
            continue
        hits = [k for k in available if k.endswith("/" + m)]
        if len(hits) != 1:
            raise SystemExit(
                f"metric {m!r} not found{' (ambiguous)' if hits else ''}; "
                f"available: {', '.join(available)}")
        resolved.append(hits[0])
    return resolved


def render(runs, metrics, baseline: float, sweep_key: str,
           group_key: str | None = None) -> str:
    metrics = resolve_metrics(runs, metrics)
    groups = sorted({g for g, _, _ in runs})
    values = sorted({v for _, v, _ in runs})
    seeds = sorted({s for _, _, s in runs})
    head = ((f"| {group_key} " if group_key else "")
            + f"| {sweep_key} | "
            + " | ".join(m.split("/")[-1] for m in metrics)
            + f" | paired Δ {metrics[0].split('/')[-1]} vs {sweep_key}={baseline} |")
    lines = [head,
             ("|---" if group_key else "") + "|---|" + "---|" * (len(metrics) + 1)]
    for g in groups:
        for v in values:
            cells = []
            for m in metrics:
                mu, sd, _ = mean_std(
                    [runs[(g, v, s)].get(m) for s in seeds if (g, v, s) in runs])
                cells.append(f"{mu:.4f} ± {sd:.4f}")
            # pairing is within (group, seed): same data order, same init —
            # only the swept knob differs, so seed variance cancels
            deltas = [
                runs[(g, v, s)][metrics[0]] - runs[(g, baseline, s)][metrics[0]]
                for s in seeds
                if (g, v, s) in runs and (g, baseline, s) in runs
                and metrics[0] in runs[(g, v, s)]
                and metrics[0] in runs[(g, baseline, s)]
            ]
            dmu, dsd, n = mean_std(deltas)
            lines.append((f"| {g:g} " if group_key else "")
                         + f"| {v:g} | " + " | ".join(cells)
                         + f" | {dmu:+.4f} ± {dsd:.4f} (n={n}) |")
    return "\n".join(lines)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--log-dir", required=True)
    p.add_argument("--study", required=True)
    p.add_argument("--sweep-key", required=True,
                   help="swept parameter name as it appears in run-dir names; "
                        "comma-separated aliases join differently-named runs "
                        "into one axis (first name labels the table)")
    p.add_argument("--group-key", default=None,
                   help="optional second sweep axis: the paired Δ is computed "
                        "within each (group value, seed) cell")
    def _baseline(v: str) -> float:
        # same mapping as collect().as_num so boolean sweeps (use_bn) can
        # name their baseline as True/False on the CLI
        if v in ("True", "true"):
            return 1.0
        if v in ("False", "false"):
            return 0.0
        return float(v)

    p.add_argument("--baseline", type=_baseline, default=0.0)
    p.add_argument("--metrics", default="test/maphashing_level0",
                   help="comma-separated; the first gets the paired-Δ column")
    p.add_argument("--out", default=None, help="also write the table here")
    args = p.parse_args()

    metrics = [m.strip() for m in args.metrics.split(",") if m.strip()]
    runs = collect(args.log_dir, args.study, args.sweep_key, args.group_key)
    if not runs:
        raise SystemExit(f"no runs matching {args.study}*{args.sweep_key}=... "
                         f"under {args.log_dir}")
    table = render(runs, metrics, args.baseline,
                   args.sweep_key.split(",")[0].strip(),
                   args.group_key.split(",")[0].strip() if args.group_key
                   else None)
    print(table)
    if args.out:
        with open(args.out, "w") as f:
            f.write(table + "\n")


if __name__ == "__main__":
    main()
