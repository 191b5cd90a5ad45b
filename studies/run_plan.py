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


def run_jobs(jobs, n_parallel: int = 1, chips_per_job: int | None = None,
             dry_run: bool = False) -> int:
    """Launch the expanded jobs, optionally ``n_parallel`` at a time.

    The reference fanned jobs out through Ray with 1 GPU per job
    (config/hydra/launcher/ray_launcher.yaml:8-9); here parallel jobs are
    plain subprocesses, each pinned to its own chip subset via
    TPU_VISIBLE_DEVICES when ``chips_per_job`` is set.  Lanes are tracked
    as an explicit free pool (not the job's enumeration index): a job pops
    a free lane at launch and returns it when reaped, so out-of-order
    completions can never double-book a chip subset while others idle.
    Returns the failed jobs as (name, overrides) pairs so the caller can
    re-run them (transient TPU/compile-service failures are a fact of
    life over a dev tunnel; the reference's Ray launcher retried too).
    """
    by_name = dict(jobs)
    failed: list[tuple[str, list]] = []
    running: list[tuple[subprocess.Popen, str, int | None]] = []
    free_lanes = list(range(n_parallel))

    def reap(block: bool) -> None:
        while running and (block or any(p.poll() is not None for p, _, _ in running)):
            for item in list(running):
                proc, name, lane = item
                rc = proc.wait() if block else proc.poll()
                if rc is None:
                    continue
                if rc != 0:
                    print(f"  job {name} FAILED (rc={rc})")
                    failed.append((name, by_name[name]))
                running.remove(item)
                if lane is not None:
                    free_lanes.append(lane)
            if not block:
                break

    for name, overrides in jobs:
        cmd = build_command(overrides)
        print(" ", " ".join(cmd))
        if dry_run:
            continue
        if n_parallel <= 1:
            rc = subprocess.run(cmd, check=False).returncode
            if rc != 0:
                print(f"  job {name} FAILED (rc={rc})")
                failed.append((name, overrides))
            continue
        while len(running) >= n_parallel:
            import time

            reap(block=False)
            if len(running) >= n_parallel:
                time.sleep(0.5)
        env = dict(os.environ)
        lane = None
        if chips_per_job:
            lane = free_lanes.pop(0)
            chips = range(lane * chips_per_job, (lane + 1) * chips_per_job)
            env["TPU_VISIBLE_DEVICES"] = ",".join(str(c) for c in chips)
        running.append((subprocess.Popen(cmd, env=env), name, lane))
    reap(block=True)
    return failed


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("plan")
    parser.add_argument("--dry-run", action="store_true")
    parser.add_argument("--jobs", type=int, default=1,
                        help="run up to N study jobs concurrently (the "
                             "reference used a Ray launcher with 1 GPU/job)")
    parser.add_argument("--chips-per-job", type=int, default=None,
                        help="pin each concurrent job to its own chip subset "
                             "via TPU_VISIBLE_DEVICES")
    parser.add_argument("--retries", type=int, default=1,
                        help="re-run failed jobs up to N extra passes; with "
                             "experience.maybe_resume=true a retried job "
                             "resumes from its rolling checkpoint instead "
                             "of restarting (transient TPU/compile-service "
                             "failures)")
    args = parser.parse_args()

    plan = load_plan(args.plan)
    jobs = expand_jobs(plan)
    print(f"study '{plan.get('study_name')}': {len(jobs)} jobs"
          + (f", {args.jobs} in parallel" if args.jobs > 1 else ""))
    pending = jobs
    for attempt in range(args.retries + 1):
        if attempt:
            print(f"retry pass {attempt}/{args.retries}: "
                  f"{len(pending)} failed job(s)")
        pending = run_jobs(pending, n_parallel=args.jobs,
                           chips_per_job=args.chips_per_job,
                           dry_run=args.dry_run)
        if not pending or args.dry_run:
            break
    if pending:
        print(f"{len(pending)} job(s) still failing after "
              f"{args.retries} retry pass(es): "
              + ", ".join(name for name, _ in pending))
        sys.exit(1)


if __name__ == "__main__":
    main()
