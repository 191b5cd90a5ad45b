"""Data pipeline tests: dataset contract, samplers, loader, host/device
transform split (the reference had no dataset tests at all)."""

import numpy as np
import pytest

from irw_tpu.data import EpochLoader, SyntheticDataset
from irw_tpu.data.base import subset
from irw_tpu.samplers import HierarchicalSampler, MPerClassSampler, RandomSampler
from irw_tpu.transforms import build_transforms


@pytest.fixture()
def dataset():
    return SyntheticDataset(num_samples=64, num_classes=4, image_size=32, seed=0)


def test_dataset_contract(dataset):
    assert len(dataset) == 64
    inst = dataset.instance_dict
    assert set(inst) == {0, 1, 2, 3}
    assert sum(len(v) for v in inst.values()) == 64
    assert dataset.my_at_R == max(len(v) for v in inst.values())
    item = dataset[0]
    assert item["image"].size == (32, 32)
    sup = dataset.super_dict
    assert sup is not None


def test_multilabel_instance_dict():
    ds = SyntheticDataset(num_samples=32, multi_label=True, num_label_dims=10, seed=1)
    assert ds.labels.shape == (32, 10)
    inst = ds.instance_dict
    for c, idxs in inst.items():
        for i in idxs:
            assert ds.labels[i, c] > 0


def test_subset_reindex(dataset):
    sub = subset(dataset, [0, 5, 10], mode="eval")
    assert len(sub) == 3
    assert sub.mode == "eval"
    np.testing.assert_array_equal(sub.labels, dataset.labels[[0, 5, 10]])
    assert sub[1]["path"] == dataset.paths[5]


def test_random_sampler(dataset):
    s = RandomSampler(dataset, batch_size=16, seed=3).reshuffle(0)
    assert len(s) == 4
    all_idx = np.concatenate(s.batches)
    assert len(set(all_idx.tolist())) == 64
    # epoch-keyed reshuffle differs, same epoch reproduces
    b0 = [b.copy() for b in s.batches]
    s.reshuffle(1)
    assert any(not np.array_equal(a, b) for a, b in zip(b0, s.batches))
    s.reshuffle(0)
    for a, b in zip(b0, s.batches):
        np.testing.assert_array_equal(a, b)


def test_m_per_class_sampler(dataset):
    s = MPerClassSampler(dataset, batch_size=8, samples_per_class=4, seed=0).reshuffle(0)
    for batch in s:
        labels = dataset.labels[batch]
        values, counts = np.unique(labels, return_counts=True)
        assert len(values) == 2
        assert (counts == 4).all()


def test_hierarchical_sampler(dataset):
    s = HierarchicalSampler(
        dataset, batch_size=8, samples_per_class=2, batches_per_super_pair=2
    ).reshuffle(0)
    assert len(s) > 0
    for batch in s:
        supers = dataset.super_labels[batch]
        assert len(np.unique(supers)) == 2


def test_loader_yields_uint8_batches(dataset):
    sampler = RandomSampler(dataset, batch_size=16).reshuffle(0)
    host, _ = build_transforms({"Resize": {"size": 32}})
    loader = EpochLoader(dataset, sampler.batches, host, num_workers=2)
    batches = list(loader)
    assert len(batches) == 4
    b = batches[0]
    assert b["image"].shape == (16, 32, 32, 3) and b["image"].dtype == np.uint8
    assert b["label"].shape == (16,)
    assert b["index"].shape == (16,)


def test_loader_zero_workers_equivalent(dataset):
    sampler = RandomSampler(dataset, batch_size=16).reshuffle(0)
    host, _ = build_transforms({"Resize": {"size": 32}})
    threaded = list(EpochLoader(dataset, sampler.batches, host, num_workers=4))
    serial = list(EpochLoader(dataset, sampler.batches, host, num_workers=0))
    for a, b in zip(threaded, serial):
        np.testing.assert_array_equal(a["image"], b["image"])


def test_device_transform_swt(dataset):
    host, device = build_transforms(
        {"Resize": {"size": 32}, "SWTTransform": {"level": 1, "wavelet": "haar"}}
    )
    rng = np.random.RandomState(0)
    img = host(dataset[0]["image"], rng, train=False)
    out = np.asarray(device(img[None]))
    assert out.shape == (1, 4, 32, 32, 3)  # size-preserving


def test_device_transform_custom_dwt(dataset):
    host, device = build_transforms(
        {
            "Resize": {"size": 32},
            "Normalize": {},
            "CustomTransform": {"decompose_levels": 2, "basis": "haar"},
        }
    )
    rng = np.random.RandomState(0)
    img = host(dataset[0]["image"], rng, train=False)
    out = np.asarray(device(img[None]))
    assert out.shape == (1, 4, 8, 8, 3)


def test_device_transform_resize_subbands(dataset):
    host, device = build_transforms(
        {
            "Resize": {"size": 64},
            "CustomTransform": {"decompose_levels": 1, "basis": "cdf97"},
            "ResizeSubBands": {"size": 32},
        }
    )
    rng = np.random.RandomState(0)
    img = host(
        SyntheticDataset(num_samples=1, image_size=64)[0]["image"], rng, train=False
    )
    out = np.asarray(device(img[None]))
    assert out.shape == (1, 4, 32, 32, 3)


def test_host_transform_train_augmentation(dataset):
    host, _ = build_transforms(
        {
            "RandomResizedCrop": {"size": 32},
            "RandomHorizontalFlip": {"p": 1.0},
        }
    )
    rng = np.random.RandomState(0)
    img = dataset[0]["image"]
    a = host(img, np.random.RandomState(0), train=True)
    b = host(img, np.random.RandomState(0), train=False)
    assert a.shape == b.shape == (32, 32, 3)
    assert not np.array_equal(a, b)  # train path augments


def test_cifar_protocol_from_fake_batches(tmp_path):
    """Cifar10Retrieval split sizes on synthetic pickle batches."""
    import pickle

    root = tmp_path / "cifar-10-batches-py"
    root.mkdir()
    rng = np.random.RandomState(0)
    per_batch = 1200  # 6 batches × 1200 = 7200 images, 720/class
    for i, name in enumerate([f"data_batch_{j}" for j in range(1, 6)] + ["test_batch"]):
        data = {
            b"data": rng.randint(0, 255, (per_batch, 3072), dtype=np.uint8),
            b"labels": [int(x) for x in rng.randint(0, 10, per_batch)],
        }
        with open(root / name, "wb") as f:
            pickle.dump(data, f)

    from irw_tpu.data.cifar import Cifar10Retrieval

    q = Cifar10Retrieval(str(tmp_path), mode="query")
    t = Cifar10Retrieval(str(tmp_path), mode="train")
    g = Cifar10Retrieval(str(tmp_path), mode="gallery")
    assert len(q) == 1000  # 100/class
    assert len(t) == 5000  # 500/class
    assert len(g) == 7200 - 1000  # database = all − queries


def test_multi_crop_branch(dataset):
    """SwAV multi-crop (base_dataset.py:94-147): 2 global + N local crops
    with color distortion; eval path falls back to plain ops."""
    from irw_tpu.data import EpochLoader
    from irw_tpu.samplers import RandomSampler
    from irw_tpu.transforms import build_transforms

    host, _ = build_transforms(
        {"Resize": {"size": 32},
         "MultiCrop": {"size_crops": [32, 16], "nmb_crops": [2, 3],
                        "min_scale_crops": [0.5, 0.2], "max_scale_crops": [1.0, 0.5]}}
    )
    sampler = RandomSampler(dataset, batch_size=8).reshuffle(0)
    batch = next(iter(EpochLoader(dataset, sampler.batches, host, num_workers=0)))
    assert batch["crop_0"].shape == (8, 32, 32, 3)
    assert batch["crop_1"].shape == (8, 32, 32, 3)
    assert batch["crop_2"].shape == (8, 16, 16, 3)
    assert batch["crop_4"].shape == (8, 16, 16, 3)
    np.testing.assert_array_equal(batch["image"], batch["crop_0"])
    # eval path: single array
    ev = next(iter(EpochLoader(dataset, sampler.batches, host, num_workers=0, train=False)))
    assert ev["image"].shape == (8, 32, 32, 3)


def test_dsch_trainer_early_stopping():
    from irw_tpu.engine.dsch import EarlyStopping, dsch_alpha

    stop = EarlyStopping(patience=2)
    assert not stop.update(0.5)
    assert not stop.update(0.4)
    assert stop.update(0.3)  # 2 bad epochs
    assert dsch_alpha(0) == 1.0
    assert dsch_alpha(100) > dsch_alpha(10) > 1.0


REF_TRANSFORMS = "/root/reference/config/transform"


@pytest.mark.skipif(not __import__("os").path.isdir(REF_TRANSFORMS),
                    reason="reference tree not mounted")
@pytest.mark.slow
@pytest.mark.parametrize("preset", ["voc_swt.yaml", "cub_dwt.yaml"])
def test_reference_transform_yaml_runs_train_step(preset):
    """The VERBATIM reference transform presets (incl. ColorJitter) compose
    through build_transforms and feed one real train step
    (/root/reference/config/transform/voc_swt.yaml:1-16)."""
    import os

    import jax
    import optax
    import yaml

    from irw_tpu.engine.optimizers import build_optimizers
    from irw_tpu.engine.train import _build_hyper
    from irw_tpu.engine.train_step import build_train_step
    from irw_tpu.getter import Getter, init_train_state
    from irw_tpu.losses import build_losses
    from irw_tpu.models import get_model

    with open(os.path.join(REF_TRANSFORMS, preset)) as f:
        cfg = yaml.safe_load(f)
    (host_t, device_t), (host_e, device_e) = Getter().get_transform(cfg)

    ds = SyntheticDataset(num_samples=8, num_classes=2, image_size=260, seed=0)
    rng = np.random.RandomState(0)
    train_imgs = np.stack([host_t(ds.load_image(i), rng, True) for i in range(2)])
    assert train_imgs.shape == (2, 224, 224, 3) and train_imgs.dtype == np.uint8
    eval_imgs = np.stack([host_e(ds.load_image(i), rng, False) for i in range(2)])
    assert eval_imgs.shape == (2, 224, 224, 3)

    bands = device_t(train_imgs)
    expect_hw = 224 if "swt" in preset else 112  # SWT size-preserving, DWT halves
    assert bands.shape == (2, 4, expect_hw, expect_hw, 3)

    model = get_model(
        "multidino_attention_hashing_ortho", backbone="vit_tiny", nbits=16,
        frozen_backbone=False,
        fusion_config={"type": "cross_attention_advanced", "output_dim": 64,
                       "num_queries": 2, "num_heads": 2, "ortho_weight": 0.01})
    losses = build_losses([
        {"name": "HashLoss", "weight": 1.0,
         "kwargs": {"num_classes": 2, "embedding_size": 16}}])
    batch = {"image": train_imgs, "label": ds.labels[:2], "index": np.arange(2)}
    x = device_t(batch["image"])
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
         "band_drop": jax.random.PRNGKey(2)}, x, train=True)
    entries = build_optimizers(
        [{"name": "AdamW", "params": None, "kwargs": {"lr": 1e-3}}],
        variables["params"])
    loss_tx = optax.adamw(1e-3)
    state = init_train_state(model, losses, entries, loss_tx, batch,
                             device_transform=device_t, seed=0)
    step = jax.jit(build_train_step(model, losses, entries, loss_tx,
                                    device_transform=device_t))
    hyper = _build_hyper(entries, 1, 0, 0, None)
    _, metrics = step(state, batch, hyper)
    assert np.isfinite(float(metrics["total_loss"]))


def test_color_jitter_grayscale_blur_named_ops(dataset):
    """ColorJitter/RandomGrayscale/GaussianBlur as named host ops: train mode
    perturbs pixels, eval mode is a no-op passthrough."""
    host_t, _ = build_transforms({
        "Resize": {"size": 32},
        "ColorJitter": {"brightness": 0.5, "contrast": 0.5,
                        "saturation": 0.5, "hue": 0.1},
        "RandomGrayscale": {"p": 1.0},
        "GaussianBlur": {"p": 1.0, "sigma": (0.5, 1.0)},
    })
    img = dataset.load_image(0)
    rng = np.random.RandomState(0)
    out_train = host_t(img, rng, True)
    out_eval = host_t(img, np.random.RandomState(0), False)
    base = np.asarray(img.resize((32, 32), 2), dtype=np.uint8)  # 2 = BILINEAR
    assert out_train.shape == (32, 32, 3) and out_eval.shape == (32, 32, 3)
    np.testing.assert_array_equal(out_eval, base)  # eval: geometry only
    assert np.abs(out_train.astype(int) - base.astype(int)).max() > 5
    # grayscale with p=1 in train: all channels equal
    assert (out_train[..., 0] == out_train[..., 1]).all()
