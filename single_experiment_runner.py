#!/usr/bin/env python
"""CLI entry point (reference: single_experiment_runner.py).

Usage mirrors the Hydra CLI::

    python single_experiment_runner.py dataset=synthetic model=dino_hashing \
        experience.max_iter=5 experience.experiment_name=smoke

    python single_experiment_runner.py -m loss.0.weight=0.1,1.0 seed=1,2  # multirun

Resume handling (reference :43-74): with ``experience.maybe_resume=true``
an existing finished run short-circuits; an unfinished one resumes from
weights/rolling.
"""

from __future__ import annotations

import os
import sys

import irw_tpu  # noqa: F401
from irw_tpu.config import compose, expand_sweeps
from irw_tpu.utils import LOGGER

CONFIG_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "configs")


def run_one(overrides, name_suffix: str = "") -> float | None:
    config = compose(CONFIG_DIR, "default", overrides)
    exp = config.experience
    if name_suffix:
        exp["experiment_name"] = f"{exp.get('experiment_name', 'default')}{name_suffix}"

    log_dir = os.path.join(
        os.path.expanduser(exp.get("log_dir", "experiments")),
        str(exp.get("experiment_name", "default")),
    )
    rolling = os.path.join(log_dir, "weights", "rolling")
    if exp.get("maybe_resume") and os.path.exists(rolling):
        from irw_tpu.engine.checkpoint import load_checkpoint

        restored = load_checkpoint(log_dir)
        if restored is not None:
            _, meta = restored
            if meta.get("epoch", 0) >= exp.get("max_iter", 50):
                LOGGER.info(f"experiment already finished (epoch {meta['epoch']}); skipping")
                return meta.get("best_score")
            config.experience["resume"] = True

    import run as run_module

    metrics = run_module.run(config)
    split = exp.get("eval_split", "test")
    principal = exp.get("principal_metric", "map_level0")
    return metrics.get(split, {}).get(principal)


def main(argv=None) -> int:
    from irw_tpu.utils.chip_lock import acquire_chip_lock

    acquire_chip_lock()  # serialize TPU attach on the shared dev chip
    argv = list(sys.argv[1:] if argv is None else argv)
    multirun = False
    if "-m" in argv:
        argv.remove("-m")
        multirun = True
    if "--multirun" in argv:
        argv.remove("--multirun")
        multirun = True

    jobs = list(expand_sweeps(argv)) if multirun else [argv]
    results = []
    for i, overrides in enumerate(jobs):
        suffix = ""
        if multirun:
            LOGGER.info(f"--- multirun job {i + 1}/{len(jobs)}: {overrides}")
            suffix = f"_job{i}"
        score = run_one(overrides, name_suffix=suffix)
        results.append(score)
        LOGGER.info(f"job result: {score}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
