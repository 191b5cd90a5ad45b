"""Entry-point integration: run.run → offline evaluate → aggregation, all
on the synthetic dataset in a temp dir (the reference had no such test)."""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from irw_tpu.config import compose  # noqa: E402

# full train+eval cycles through the real entry points — the slow tier
pytestmark = pytest.mark.slow

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")


@pytest.fixture(scope="module")
def finished_run(tmp_path_factory):
    log_dir = tmp_path_factory.mktemp("exp")
    config = compose(
        CONFIG_DIR,
        "default",
        [
            "transform=dwt_small",
            "experience.max_iter=1",
            "experience.train_eval_freq=1",
            "experience.step_per_epoch=2",
            "experience.eval_bs=64",
            "experience.num_workers=0",
            "experience.maybe_resume=false",
            "experience.experiment_name=itest",
            f"experience.log_dir={log_dir}",
            "+experience.use_mesh=false",
        ],
    )
    import run as run_module

    metrics = run_module.run(config)
    return os.path.join(str(log_dir), "itest"), metrics


def test_run_produces_metrics_and_checkpoint(finished_run):
    run_dir, metrics = finished_run
    assert "test" in metrics and "map_level0" in metrics["test"]
    assert os.path.exists(os.path.join(run_dir, "weights", "rolling"))
    assert os.path.exists(os.path.join(run_dir, "metrics.jsonl"))


def test_offline_evaluate_matches_training_eval(finished_run):
    run_dir, metrics = finished_run
    import importlib

    evaluate_cli = importlib.import_module("evaluate")
    offline = evaluate_cli.load_and_evaluate(run_dir, eval_set="test",
                                             batch_size=64, num_workers=0)
    assert abs(offline["map_level0"] - metrics["test"]["map_level0"]) < 2e-3


def test_aggregate_results_reads_run(finished_run):
    run_dir, _ = finished_run
    from studies.aggregate_results import aggregate, collect_runs, read_last_metrics

    last = read_last_metrics(run_dir)
    assert any(k.startswith("test/") for k in last)
    runs = collect_runs(os.path.dirname(run_dir), "itest")
    assert len(runs) == 1
    summary = aggregate(runs, "test/map_level0")
    assert len(summary) == 1


def test_plot_exemples_renders(finished_run, tmp_path):
    """Qualitative retrieval panels CLI (plot_exemples.py equivalent)."""
    run_dir, _ = finished_run
    import importlib

    pe = importlib.import_module("plot_exemples")
    rows = pe.retrieval_rows(run_dir, num_queries=3, topk=4, thumb=24)
    assert len(rows) == 3 and len(rows[0]) == 5  # query + topk
    out_path = os.path.join(str(tmp_path), "panels.png")
    pe.render([rows], out_path, thumb=24)
    assert os.path.exists(out_path)
    from PIL import Image

    img = Image.open(out_path)
    assert img.size[0] > 0 and img.size[1] > 0


def test_fresh_start_rotates_stale_metrics(tmp_path):
    """A crashed attempt that died before its first rolling save leaves a
    stale metrics.jsonl under the (fixed-name) run dir; a fresh start with
    maybe_resume finding no checkpoint must rotate it aside rather than
    append duplicate steps (run.py).  The reference never hit this because
    Hydra timestamps a fresh run dir per attempt."""
    run_dir = tmp_path / "rot"
    run_dir.mkdir()
    (run_dir / "metrics.jsonl").write_text(
        '{"step": 1, "train/total_loss": 9.9}\n'
        '{"step": 2, "train/total_loss": 8.8}\n')
    config = compose(
        CONFIG_DIR,
        "default",
        [
            "transform=dwt_small",
            "experience.max_iter=1",
            "experience.train_eval_freq=1",
            "experience.step_per_epoch=2",
            "experience.eval_bs=64",
            "experience.num_workers=0",
            "experience.maybe_resume=true",
            "experience.experiment_name=rot",
            f"experience.log_dir={tmp_path}",
            "+experience.use_mesh=false",
        ],
    )
    import run as run_module

    run_module.run(config)
    with open(run_dir / "metrics.jsonl") as f:
        steps = [json.loads(line)["step"] for line in f
                 if "train/total_loss" in line]
    assert steps == sorted(set(steps)), "duplicate steps from stale attempt"
    assert (run_dir / "metrics.jsonl.stale").exists()


def test_synthetic_hashing_query_gallery_protocol():
    from irw_tpu.getter import Getter

    train, evals = Getter().get_dataset(
        {"name": "SyntheticHashingDataset",
         "kwargs": {"num_samples": 64, "image_size": 32}}
    )
    test = evals["test"]
    assert set(test) == {"query", "gallery"}
    assert len(test["query"]) < len(test["gallery"])
    # query and gallery are disjoint draws
    assert test["query"].paths[0] != test["gallery"].paths[0]


def test_disk_dataset_trains_through_native_loader(tmp_path, monkeypatch):
    """End-to-end train+eval on an on-disk (fake-CUB) JPEG tree: the
    product loader path must engage the native C++ decoder (irw_tpu/native)
    for the geometry-only pipeline and finish a real epoch."""
    from PIL import Image

    from irw_tpu import native
    from irw_tpu.data.loader import EpochLoader

    if not native.available():
        pytest.skip("native loader unavailable")

    root = str(tmp_path / "cub")
    rs = np.random.RandomState(0)
    rows_img, rows_lbl = [], []
    idx = 1
    for cls in (1, 2, 3, 101, 102):
        for j in range(6):
            rel = f"{cls:03d}.C{cls}/img_{idx}.jpg"
            path = os.path.join(root, "images", rel)
            os.makedirs(os.path.dirname(path), exist_ok=True)
            arr = rs.randint(0, 256, (48 + cls % 7, 56, 3), np.uint8)
            Image.fromarray(arr).save(path, quality=90)
            rows_img.append(f"{idx} {rel}")
            rows_lbl.append(f"{idx} {cls}")
            idx += 1
    with open(os.path.join(root, "images.txt"), "w") as f:
        f.write("\n".join(rows_img) + "\n")
    with open(os.path.join(root, "image_class_labels.txt"), "w") as f:
        f.write("\n".join(rows_lbl) + "\n")

    native_calls = {"n": 0}
    orig = EpochLoader._native_batch

    def spy(self, indices, rng):
        out = orig(self, indices, rng)
        if out is not None:
            native_calls["n"] += 1
        return out

    monkeypatch.setattr(EpochLoader, "_native_batch", spy)

    log_dir = tmp_path / "exp"
    config = compose(
        CONFIG_DIR,
        "default",
        [
            "dataset=cub",
            f"dataset.kwargs.data_dir={root}",
            "dataset.sampler.kwargs.batch_size=8",
            "transform=dwt_small",
            "experience.max_iter=1",
            "experience.train_eval_freq=1",
            "experience.eval_bs=16",
            "experience.num_workers=2",
            "experience.maybe_resume=false",
            "experience.experiment_name=cubdisk",
            f"experience.log_dir={log_dir}",
            "+experience.use_mesh=false",
        ],
    )
    import run as run_module

    metrics = run_module.run(config)
    assert native_calls["n"] > 0, "native loader path never engaged"
    assert "test" in metrics and "map_level0" in metrics["test"]


def test_run_plan_parallel_launcher_counts_failures(monkeypatch):
    """run_jobs fans jobs out as subprocesses (--jobs N) and reports the
    number of failed ones (reference: Ray launcher, 1 GPU/job)."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "studies"))
    import run_plan

    calls = []

    def fake_cmd(overrides):
        calls.append(overrides)
        code = "import sys; sys.exit(1)" if "fail=1" in overrides else "pass"
        return [sys.executable, "-c", code]

    monkeypatch.setattr(run_plan, "build_command", fake_cmd)
    jobs = [("a", ["ok=1"]), ("b", ["fail=1"]), ("c", ["ok=2"]), ("d", ["ok=3"])]
    assert [n for n, _ in run_plan.run_jobs(jobs, n_parallel=2)] == ["b"]
    assert len(calls) == 4
    failed = run_plan.run_jobs(jobs, n_parallel=1)  # serial path too
    assert failed == [("b", ["fail=1"])]
    assert run_plan.run_jobs(jobs, n_parallel=2, dry_run=True) == []


def test_run_plan_retries_rerun_only_failed_jobs(tmp_path, monkeypatch):
    """--retries re-runs just the failed jobs; a transient failure (fails
    once, succeeds on retry) ends the study green.  This is the launcher
    analogue of the reference's Ray retry behavior — a flaky dev-tunnel
    TPU job must not torpedo a 5-job sweep."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "studies"))
    import run_plan

    plan = tmp_path / "plan.yaml"
    plan.write_text(
        "study_name: retry_demo\nbase_overrides: []\nsweep:\n  flaky: [0, 1]\n")

    attempts: dict[str, int] = {}

    def fake_cmd(overrides):
        flaky = any(o.startswith("flaky=1") for o in overrides)
        name = "flaky" if flaky else "stable"
        attempts[name] = attempts.get(name, 0) + 1
        fail = flaky and attempts[name] == 1
        return [sys.executable, "-c",
                "import sys; sys.exit(1)" if fail else "pass"]

    monkeypatch.setattr(run_plan, "build_command", fake_cmd)
    monkeypatch.setattr(sys, "argv", ["run_plan.py", str(plan), "--retries", "1"])
    run_plan.main()  # exits 0: the retry pass recovered the flaky job
    assert attempts == {"stable": 1, "flaky": 2}


def test_image_folder_infers_num_classes(tmp_path, monkeypatch):
    """dataset.num_classes: null is resolved from the built dataset and
    reconciled into loss kwargs (run.py) — the ImageFolder quickstart must
    not train against the loss preset's hardcoded class count."""
    from PIL import Image

    root = str(tmp_path / "tree")
    rs = np.random.RandomState(0)
    for cls in ("a", "b", "c", "d", "e", "f"):
        os.makedirs(os.path.join(root, cls))
        for j in range(4):
            arr = rs.randint(0, 256, (40, 40, 3), np.uint8)
            Image.fromarray(arr).save(os.path.join(root, cls, f"{j}.jpg"))

    config = compose(
        CONFIG_DIR,
        "default",
        [
            "dataset=image_folder",
            f"dataset.kwargs.data_dir={root}",
            "dataset.sampler.kwargs.batch_size=8",
            "dataset.sampler.kwargs.m=4",
            "transform=dwt_small",
            "experience.max_iter=1",
            "experience.train_eval_freq=1",
            "experience.eval_bs=16",
            "experience.num_workers=0",
            "experience.maybe_resume=false",
            "experience.experiment_name=ncls",
            f"experience.log_dir={tmp_path}",
            "+experience.use_mesh=false",
        ],
    )
    assert config.dataset["num_classes"] is None
    import run as run_module

    metrics = run_module.run(config)
    # class-disjoint halves of 6 classes -> 3 train classes, remapped 0..2
    assert config.dataset["num_classes"] == 3
    assert config.loss[0]["kwargs"]["num_classes"] == 3
    assert "map_level0" in metrics["test"]


def test_aggregate_results_tensorboard_fallback(tmp_path):
    """A run directory with only TensorBoard event files (the reference's
    old-run format, studies/aggregate_results.py:51-62) aggregates without
    a metrics.jsonl."""
    from torch.utils.tensorboard import SummaryWriter

    run_dir = tmp_path / "tbstudy_seed=1_x=0"
    writer = SummaryWriter(str(run_dir / "tb"))
    for step, val in ((1, 0.3), (2, 0.55)):
        writer.add_scalar("test/map_level0", val, step)
    writer.close()

    from studies.aggregate_results import collect_runs, read_tensorboard_scalars

    scalars = read_tensorboard_scalars(str(run_dir))
    assert abs(scalars["test_map_level0"] - 0.55) < 1e-6  # last value wins
    runs = collect_runs(str(tmp_path), "tbstudy")
    assert len(runs) == 1 and "test_map_level0" in runs[0][1]


def test_dsch_end_to_end(tmp_path):
    """Drive the DSCH protocol through run.run (run.py dsch_train branch →
    engine/dsch.py train_dsch; reference: main/engine/DSCH/train.py:27):
    α continuation steps per epoch, early stopping fires with patience 1,
    and checkpoints are written.  lr=0 keeps eval scores constant so the
    early stop is deterministic (epoch 2 = first non-improving eval)."""
    log_dir = tmp_path
    config = compose(
        CONFIG_DIR,
        "default",
        [
            "dataset=synthetic_hashing",
            "loss=dsch",
            "transform=cifar_resize",
            "experience.dsch_train=true",
            "experience.max_iter=5",
            "experience.train_eval_freq=1",
            "experience.step_per_epoch=2",
            "experience.eval_bs=64",
            "experience.num_workers=0",
            "experience.maybe_resume=false",
            "experience.experiment_name=dsch_e2e",
            f"experience.log_dir={log_dir}",
            "+experience.use_mesh=false",
            "+experience.dsch.patience=1",
            "+experience.dsch.alpha_gamma=1.0",
            "+experience.dsch.topk=64",
            "dataset.kwargs.num_samples=96",
            "dataset.kwargs.image_size=32",
            "dataset.sampler.kwargs.batch_size=16",
        ],
    )
    # tiny α-taking hashing model + frozen learning (deterministic early stop)
    config["model"] = {"name": "resnet_hashing_alpha",
                       "kwargs": {"depth": 18, "nbits": 16}}
    # plain-image trunk (the DSCH nets take (B,H,W,3), reference
    # resnet_ce.py) at the dataset's native 32px — no 224 upresize
    config["transform"] = {
        "train": {"Resize": {"size": [32, 32]}, "ToTensor": {}},
        "test": {"Resize": {"size": [32, 32]}, "ToTensor": {}},
    }
    config["loss"][0]["kwargs"]["n_bits"] = 16
    config["optimizer"][0]["kwargs"]["lr"] = 0.0
    config["optimizer"][0]["scheduler_on_epoch"] = None

    import run as run_module

    metrics = run_module.run(config)
    run_dir = os.path.join(str(log_dir), "dsch_e2e")

    assert "test" in metrics and "map_level0" in metrics["test"]
    assert os.path.exists(os.path.join(run_dir, "weights", "rolling"))

    rows = [json.loads(line)
            for line in open(os.path.join(run_dir, "metrics.jsonl"))]
    alphas = {r["step"]: r["train/model_alpha"]
              for r in rows if "train/model_alpha" in r}
    # α continuation increased per epoch: (1 + γ·e)^0.5, γ=1
    assert alphas[2] > alphas[1] > 1.0
    # early stop with patience 1 under lr=0: epochs {1, 2} only, not max_iter
    assert set(alphas) == {1, 2}
