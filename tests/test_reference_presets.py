"""Reference config-preset compatibility.

Every preset name the reference ships (config/{model,transform,optimizer,
loss,dataset,memory}/*.yaml) must resolve as an override string against our
config tree, and the composed config must build real objects through the
getter — the SURVEY §7 'existing YAMLs run unchanged' constraint.
"""

import os

import numpy as np
import pytest
import yaml

from irw_tpu.config import compose, expand_sweeps

REF = "/root/reference/config"
CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference tree not mounted"
)


def _ref_options(group):
    return sorted(
        f[:-5] for f in os.listdir(os.path.join(REF, group)) if f.endswith(".yaml")
    )


# presets whose interpolations reach into a sibling group: compose them with
# the matching option (same pairing the reference studies use)
EXTRA = {
    ("model", "wcnn_attention_all_subs"): ["transform=sdd_dwt_all_subs"],
    # arcface interpolates ${model.kwargs.embed_dim}: pair with an embedding
    # model, as the reference's own defaults do
    ("loss", "arcface"): ["model=resnet"],
}


def _compose(group, option):
    overrides = [f"{group}={option}"] + EXTRA.get((group, option), [])
    return compose(CONFIG_DIR, "default", overrides)


@pytest.mark.parametrize("group", ["model", "transform", "optimizer", "loss",
                                   "dataset", "memory"])
def test_every_reference_preset_composes(group):
    for option in _ref_options(group):
        cfg = _compose(group, option)
        assert cfg is not None, f"{group}={option}"


def test_every_reference_model_preset_builds():
    from irw_tpu.getter import Getter

    getter = Getter()
    for option in _ref_options("model"):
        cfg = _compose("model", option)
        model = getter.get_model(cfg.model.to_dict()
                                 if hasattr(cfg.model, "to_dict") else cfg.model)
        assert model is not None, f"model={option}"


def test_every_reference_loss_preset_builds():
    from irw_tpu.getter import Getter

    getter = Getter()
    for option in _ref_options("loss"):
        cfg = _compose("loss", option)
        loss_cfg = [dict(e) for e in cfg.loss]
        losses = getter.get_loss(loss_cfg)
        assert losses, f"loss={option}"
        tx = getter.get_loss_optimizer(loss_cfg)
        assert tx is not None


def test_every_reference_optimizer_preset_builds():
    import jax.numpy as jnp

    from irw_tpu.engine.optimizers import build_optimizers

    params = {
        "backbone": {"kernel": jnp.ones((4, 4)), "bias": jnp.zeros(4)},
        "fc": {"kernel": jnp.ones((4, 2)), "bias": jnp.zeros(2)},
    }
    for option in _ref_options("optimizer"):
        cfg = _compose("optimizer", option)
        entries = build_optimizers([dict(e) for e in cfg.optimizer], params)
        assert entries, f"optimizer={option}"
        for entry in entries:
            lrs = entry.group_lrs(epoch=1, step=10)
            assert all(np.isfinite(v) and v >= 0 for v in lrs.values()), (
                option, lrs)


def test_every_reference_transform_preset_builds():
    from irw_tpu.getter import Getter

    getter = Getter()
    for option in _ref_options("transform"):
        cfg = _compose("transform", option)
        (host_t, device_t), (host_e, device_e) = getter.get_transform(
            cfg.transform.to_dict())
        # run a small image through the host stage both modes
        from PIL import Image

        img = Image.fromarray(
            (np.random.RandomState(0).rand(96, 80, 3) * 255).astype(np.uint8))
        rng = np.random.RandomState(0)
        out = host_t(img, rng, True)
        assert (isinstance(out, list) and out) or out.ndim == 3, option
        out_e = host_e(img, rng, False)
        assert (isinstance(out_e, list) and out_e) or out_e.ndim == 3, option


def test_every_reference_dataset_preset_resolves():
    from irw_tpu.data.registry import DATASET_REGISTRY

    for option in _ref_options("dataset"):
        cfg = _compose("dataset", option)
        assert cfg.dataset.name in DATASET_REGISTRY, f"dataset={option}"
        assert "sampler" in cfg.dataset


def test_every_reference_memory_preset_builds():
    from irw_tpu.getter import Getter

    getter = Getter()
    for option in _ref_options("memory"):
        cfg = _compose("memory", option)
        mem = getter.get_memory(
            cfg.get("memory") and cfg.memory.to_dict(), embedding_dim=16)
        if option == "default":
            assert mem is None  # name/size null → no memory
        else:
            assert mem is not None and mem.size > 0, f"memory={option}"


def test_experience_landmarks_composes():
    cfg = compose(CONFIG_DIR, "default", ["experience=landmarks"])
    assert cfg.experience.landmarks is True
    assert cfg.experience.principal_metric == "mapH"


def test_reference_study_plans_compose_and_build():
    """The three reference study plans' base_overrides + sweeps compose
    against our tree and construct model/losses/transforms
    (/root/reference/studies/*.yaml)."""
    from irw_tpu.getter import Getter

    getter = Getter()
    plans = sorted(
        f for f in os.listdir("/root/reference/studies") if f.endswith(".yaml"))
    assert len(plans) == 3
    for plan_file in plans:
        with open(os.path.join("/root/reference/studies", plan_file)) as f:
            plan = yaml.safe_load(f)
        base = [
            f"{k}={'null' if v is None else v}"
            for k, v in (plan.get("base_overrides") or {}).items()
        ]
        sweep = [
            f"{k}={','.join(str(x) for x in v)}"
            for k, v in (plan.get("sweep") or {}).items()
        ]
        jobs = list(expand_sweeps(base + sweep))
        assert jobs
        # compose the first and last sweep job fully
        for job in (jobs[0], jobs[-1]):
            cfg = compose(CONFIG_DIR, "default", job)
            model = getter.get_model(cfg.model.to_dict())
            losses = getter.get_loss([dict(e) for e in cfg.loss])
            getter.get_transform(cfg.transform.to_dict())
            assert model is not None and losses, plan_file
