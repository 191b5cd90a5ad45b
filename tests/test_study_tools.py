"""Unit tests for the study analysis tooling (studies/{paired_analysis,
aggregate_results}.py) on synthetic run trees — fast tier."""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "studies"))

from paired_analysis import collect, mean_std, render  # noqa: E402


def _write_run(root, study, lam, seed, mapv, ortho):
    d = root / f"{study}_ortho_scale={lam}_seed={seed}"
    d.mkdir(parents=True)
    with open(d / "metrics.jsonl", "w") as f:
        f.write(json.dumps({"step": 1, "train/ortho_raw": ortho + 1.0}) + "\n")
        f.write(json.dumps({"step": 2, "test/maphashing_level0": mapv,
                            "train/ortho_raw": ortho}) + "\n")


def test_paired_analysis_cancels_seed_offset(tmp_path):
    # seed 334 runs 0.05 below seed 333 at EVERY λ (pure seed offset);
    # λ=10 costs exactly 0.004 within each seed. The paired Δ must recover
    # the 0.004 with zero σ while the unpaired group σ stays at 0.025.
    study = "fake_lambda"
    for seed, offs in ((333, 0.0), (334, -0.05)):
        _write_run(tmp_path, study, 0, seed, 0.30 + offs, 7.7)
        _write_run(tmp_path, study, 10, seed, 0.296 + offs, 4.6)
    runs = collect(str(tmp_path), study, "ortho_scale")
    # no group key → group value pinned at 0.0
    assert set(runs) == {(0.0, 0.0, 333), (0.0, 0.0, 334),
                         (0.0, 10.0, 333), (0.0, 10.0, 334)}
    # last-line-wins metric reading
    assert runs[(0.0, 0.0, 333)]["train/ortho_raw"] == 7.7

    table = render(runs, ["test/maphashing_level0"], 0.0, "ortho_scale")
    rows = table.splitlines()
    assert "| 0 |" in rows[2] and "| 10 |" in rows[3]
    # unpaired σ reflects the seed offset…
    assert "0.2710 ± 0.0250" in rows[3]
    # …paired Δ removes it exactly
    assert "-0.0040 ± 0.0000 (n=2)" in rows[3]


def test_paired_analysis_group_key(tmp_path):
    # two-axis sweep (run_plan names sort keys: ortho_scale, seed,
    # num_queries — trailing): λ=1 is free at q=2 but costs 0.01 at q=12,
    # within every seed. --group-key num_queries must separate the two.
    study = "fake_qscan"
    for seed, offs in ((333, 0.0), (334, -0.05)):
        for q, cost in ((2, 0.0), (12, -0.01)):
            for lam in (0, 1):
                d = tmp_path / (f"{study}_ortho_scale={lam}_seed={seed}"
                                f"_num_queries={q}")
                d.mkdir(parents=True)
                mapv = 0.30 + offs + (cost if lam else 0.0)
                with open(d / "metrics.jsonl", "w") as f:
                    f.write(json.dumps(
                        {"test/maphashing_level0": mapv}) + "\n")
    runs = collect(str(tmp_path), study, "ortho_scale",
                   group_key="num_queries")
    assert len(runs) == 8
    table = render(runs, ["test/maphashing_level0"], 0.0, "ortho_scale",
                   group_key="num_queries")
    rows = table.splitlines()
    # q=2: λ=1 paired Δ exactly 0; q=12: exactly −0.01, both σ=0
    assert any(r.startswith("| 2 | 1 |") and "+0.0000 ± 0.0000 (n=2)" in r
               for r in rows)
    assert any(r.startswith("| 12 | 1 |") and "-0.0100 ± 0.0000 (n=2)" in r
               for r in rows)


def test_mean_std_skips_missing():
    mu, sd, n = mean_std([1.0, None, 3.0])
    assert (mu, n) == (2.0, 2) and abs(sd - 1.0) < 1e-12


def test_collect_boolean_sweep_values(tmp_path):
    # boolean sweeps (use_bn) render as True/False in run-dir names
    study = "fake_bn"
    for seed in (333, 334):
        for flag, mapv in (("True", 0.31), ("False", 0.27)):
            d = tmp_path / f"{study}_seed={seed}_use_bn={flag}"
            d.mkdir(parents=True)
            with open(d / "metrics.jsonl", "w") as f:
                f.write(json.dumps({"test/maphashing_level0": mapv}) + "\n")
    runs = collect(str(tmp_path), study, "use_bn")
    assert {(v, s) for _, v, s in runs} == {(1.0, 333), (1.0, 334),
                                            (0.0, 333), (0.0, 334)}
    table = render(runs, ["test/maphashing_level0"], 0.0, "use_bn")
    assert "+0.0400 ± 0.0000 (n=2)" in table


def test_render_resolves_bare_metric_names(tmp_path):
    # bare names resolve by unique '/'-suffix; unknown names raise instead
    # of silently rendering an all-NaN table
    import pytest

    study = "fake_lambda"
    for seed in (333, 334):
        _write_run(tmp_path, study, 0, seed, 0.30, 7.7)
    runs = collect(str(tmp_path), study, "ortho_scale")
    table = render(runs, ["maphashing_level0"], 0.0, "ortho_scale")
    assert "0.3000 ± 0.0000" in table
    with pytest.raises(SystemExit, match="not found"):
        render(runs, ["no_such_metric"], 0.0, "ortho_scale")


def test_collect_sweep_key_aliases_join_runs(tmp_path):
    """Comma-separated sweep-key aliases join runs swept through the baked
    fusion λ (ortho_weight=…) with runs swept through the runtime
    experience.ortho_scale knob into ONE axis — the protocol seed-334
    completion runs under the scale naming while the original runs use
    the weight naming."""
    study = "fake_proto"
    # old naming (seed first, ortho_weight key)
    d = tmp_path / f"{study}_seed=333_ortho_weight=0"
    d.mkdir(parents=True)
    (d / "metrics.jsonl").write_text(
        json.dumps({"test/maphashing_level0": 0.30}) + "\n")
    # new naming (ortho_scale key)
    _write_run(tmp_path, study, 0.01, 333, 0.31, 0.1)
    runs = collect(str(tmp_path), study, "ortho_weight,ortho_scale")
    assert set(runs) == {(0.0, 0.0, 333), (0.0, 0.01, 333)}


def test_collect_excludes_prefix_extension_studies(tmp_path):
    """A study whose name extends this one (voc_lambda_hard_cpu vs
    …_hard_cpu_binding) sharing one log dir must NOT be absorbed: run
    names must continue <study>_<known-key>=…"""
    _write_run(tmp_path, "fake_hard", 1, 333, 0.30, 0.5)
    _write_run(tmp_path, "fake_hard_binding", 1, 333, 0.99, 9.9)
    runs = collect(str(tmp_path), "fake_hard", "ortho_scale")
    assert set(runs) == {(0.0, 1.0, 333)}
    assert runs[(0.0, 1.0, 333)]["test/maphashing_level0"] == 0.30


def test_aggregate_rename_joins_groups(tmp_path):
    """aggregate_results --rename ortho_scale=ortho_weight merges the
    runtime-λ group into the baked-λ group of the same value."""
    from aggregate_results import aggregate, collect_runs

    study = "fake_proto"
    d = tmp_path / f"{study}_seed=333_ortho_weight=0.01"
    d.mkdir(parents=True)
    (d / "metrics.jsonl").write_text(
        json.dumps({"test/maphashing_level0": 0.30}) + "\n")
    _write_run(tmp_path, study, 0.01, 334, 0.32, 0.1)
    runs = collect_runs(str(tmp_path), study)
    groups = aggregate(runs, "test/maphashing_level0",
                       renames={"ortho_scale": "ortho_weight"})
    assert list(groups) == [f"{study}_ortho_weight=0.01"]
    mean, _std, n = groups[f"{study}_ortho_weight=0.01"]
    assert n == 2 and abs(mean - 0.31) < 1e-9
