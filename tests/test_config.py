"""Config system tests: compose semantics, overrides, sweeps, interpolation
(the reference leaned on Hydra for all of this)."""

import os

import pytest

from irw_tpu.config import Config, compose, expand_sweeps, parse_overrides

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")


def test_compose_defaults():
    cfg = compose(CONFIG_DIR, "default")
    assert cfg.experience.seed == 333
    assert cfg.dataset.name == "SyntheticDataset"
    assert isinstance(cfg.loss, list) and cfg.loss[0]["name"] == "HashLoss"
    assert cfg.model.name == "single_band_net"
    assert "memory" not in cfg  # null group skipped


def test_group_swap_and_dotted_override():
    cfg = compose(
        CONFIG_DIR,
        "default",
        ["loss=roadmap", "experience.max_iter=7", "model.kwargs.nbits=32"],
    )
    assert cfg.loss[0]["name"] == "CalibrationLoss"
    assert cfg.experience.max_iter == 7
    assert cfg.model.kwargs.nbits == 32


def test_override_unknown_key_rejected():
    with pytest.raises(KeyError):
        compose(CONFIG_DIR, "default", ["experience.not_a_key=1"])
    # +prefix force-adds
    cfg = compose(CONFIG_DIR, "default", ["+experience.new_flag=true"])
    assert cfg.experience.new_flag is True


def test_list_index_override():
    cfg = compose(CONFIG_DIR, "default", ["loss.0.weight=0.5"])
    assert cfg.loss[0]["weight"] == 0.5


def test_sweep_expansion():
    jobs = list(expand_sweeps(["a=1,2", "b=x", "c=3,4"]))
    assert len(jobs) == 4
    assert sorted(jobs[0]) == ["a=1", "b=x", "c=3"]
    assert sorted(jobs[-1]) == ["a=2", "b=x", "c=4"]


def test_interpolation():
    cfg = Config({"a": {"b": 5}, "c": "${a.b}", "d": "val_${a.b}"})
    from irw_tpu.config.compose import _resolve_interpolations

    _resolve_interpolations(cfg, cfg)
    assert cfg.c == 5
    assert cfg.d == "val_5"


def test_yaml_value_types():
    groups, sets, adds = parse_overrides(["x.y=true", "x.z=[1,2]", "d=voc"])
    assert sets == {"x.y": True, "x.z": [1, 2]}
    assert groups == {"d": "voc"}


def test_config_roundtrip():
    cfg = compose(CONFIG_DIR, "default")
    d = cfg.to_dict()
    cfg2 = Config(d)
    assert cfg2.experience.seed == cfg.experience.seed
    assert cfg.to_yaml()  # serialisable


def test_study_plan_expansion():
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from studies.run_plan import expand_jobs, load_plan

    plan = load_plan(os.path.join(os.path.dirname(__file__), "..", "studies", "smoke_plan.yaml"))
    jobs = expand_jobs(plan)
    assert len(jobs) == 2
    names = [name for name, _ in jobs]
    assert len(set(names)) == 2
    for name, overrides in jobs:
        assert any(o.startswith("experience.experiment_name=") for o in overrides)


def test_every_config_option_composes_and_builds():
    """Every YAML in every group must compose; losses and models must build
    from their configs (registry-level parity with the reference tree)."""
    import glob

    from irw_tpu.losses import build_losses
    from irw_tpu.models import get_model

    groups = {}
    for group in ("dataset", "model", "loss", "optimizer", "transform", "memory"):
        groups[group] = sorted(
            os.path.splitext(os.path.basename(p))[0]
            for p in glob.glob(os.path.join(CONFIG_DIR, group, "*.yaml"))
        )
    assert len(groups["model"]) >= 10 and len(groups["loss"]) >= 10
    # presets whose interpolations reach into a sibling group need a
    # matching option, same pairing the reference's own defaults use
    extra = {
        ("loss", "arcface"): ["model=resnet"],
        ("model", "wcnn_attention_all_subs"): ["transform=sdd_dwt_all_subs"],
    }
    for group, options in groups.items():
        for option in options:
            cfg = compose(CONFIG_DIR, "default",
                          [f"{group}={option}"] + extra.get((group, option), []))
            if group == "loss":
                build_losses(cfg.loss)
            if group == "model":
                get_model(cfg.model["name"], **dict(cfg.model.get("kwargs") or {}))


def test_all_subbands_transform_seven_bands():
    import numpy as np

    from irw_tpu.transforms import build_transforms

    host, device = build_transforms(
        {"Resize": {"size": 32},
         "CustomTransform": {"decompose_levels": 2, "basis": "haar", "coarse_only": False},
         "ResizeSubBands": {"size": 16}}
    )
    rng = np.random.RandomState(0)
    from irw_tpu.data import SyntheticDataset

    img = host(SyntheticDataset(num_samples=1, image_size=32)[0]["image"], rng, False)
    out = np.asarray(device(img[None]))
    assert out.shape == (1, 7, 16, 16, 3)  # LL2 + 3 details L2 + 3 details L1


def test_all_committed_study_plans_compose():
    """Every studies/*.yaml plan must compose against the config tree.

    Regression: voc_lambda_hard_cpu shipped with override keys that did not
    exist in the composed config (model.kwargs.backbone on the protocol
    preset; experience.ortho_scale before it was declared in
    configs/experience/default.yaml), so all its jobs died at compose time
    on first launch. Composes the first sweep point of each plan exactly
    like studies/run_plan.py builds job command lines.
    """
    import glob

    import yaml

    plans = sorted(glob.glob(os.path.join(CONFIG_DIR, "..", "studies", "*.yaml")))
    assert plans, "no study plans found"
    for plan_path in plans:
        with open(plan_path) as f:
            plan = yaml.safe_load(f)
        base = list(plan.get("base_overrides") or [])
        first = [f"{k}={v[0]}" for k, v in (plan.get("sweep") or {}).items()]
        compose(CONFIG_DIR, "default", base + first)
