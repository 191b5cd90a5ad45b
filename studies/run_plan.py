#!/usr/bin/env python
"""Study sweep driver (reference: studies/run_plan.py).

A plan YAML declares::

    study_name: bn_ablation
    base_overrides:
      - dataset=mirflickr
      - model.kwargs.nbits=64
    sweep:
      model.kwargs.use_bn: [true, false]
      experience.seed: [1, 2, 3]

and expands into one ``single_experiment_runner`` job per combination
(cross product), each with a unique experiment name derived from the swept
keys (the reference's override_dirname restriction, run_plan.py:59-62).
"""

from __future__ import annotations

import argparse
import itertools
import os
import subprocess
import sys

import yaml

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_plan(path: str) -> dict:
    with open(path) as f:
        return yaml.safe_load(f)


def expand_jobs(plan: dict):
    base = list(plan.get("base_overrides") or [])
    sweep = plan.get("sweep") or {}
    keys = sorted(sweep)
    study = plan.get("study_name", "study")
    jobs = []
    for combo in itertools.product(*(sweep[k] for k in keys)):
        overrides = base + [f"{k}={v}" for k, v in zip(keys, combo)]
        name_bits = [f"{k.split('.')[-1]}={v}" for k, v in zip(keys, combo)]
        name = f"{study}_" + "_".join(name_bits) if name_bits else study
        overrides.append(f"experience.experiment_name={name}")
        jobs.append((name, overrides))
    return jobs


def preview_job_names(plan: dict):
    return [name for name, _ in expand_jobs(plan)]


def build_command(overrides) -> list[str]:
    return [sys.executable, os.path.join(REPO_ROOT, "single_experiment_runner.py")] + overrides


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("plan")
    parser.add_argument("--dry-run", action="store_true")
    args = parser.parse_args()

    plan = load_plan(args.plan)
    jobs = expand_jobs(plan)
    print(f"study '{plan.get('study_name')}': {len(jobs)} jobs")
    for name, overrides in jobs:
        cmd = build_command(overrides)
        print(" ", " ".join(cmd))
        if not args.dry_run:
            subprocess.run(cmd, check=False)


if __name__ == "__main__":
    main()
