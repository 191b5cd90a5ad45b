"""Multi-device sharding tests on the 8-device virtual CPU mesh — the
reference had no distributed testing at all (SURVEY §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from irw_tpu.ops.metrics import compute_retrieval_metrics
from irw_tpu.parallel import make_mesh, shard_batch
from irw_tpu.parallel.eval_sharding import sharded_retrieval_metrics

# jit compilations over the 8-device mesh dominate suite time — slow tier
pytestmark = pytest.mark.slow


def test_mesh_has_8_devices(devices):
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_shard_batch_pads_and_masks(devices):
    mesh = make_mesh()
    batch = {"image": np.zeros((13, 4, 4, 3), np.uint8), "label": np.arange(13)}
    out = shard_batch(batch, mesh)
    assert out["image"].shape[0] == 16  # padded to mesh multiple
    assert int(np.asarray(out["valid"]).sum()) == 13


def test_sharded_metrics_match_single_device(devices, rng):
    q = rng.randn(10, 16).astype(np.float32)
    g = rng.randn(50, 16).astype(np.float32)
    ql = rng.randint(0, 5, 10)
    gl = rng.randint(0, 5, 50)
    single = compute_retrieval_metrics(q, ql, g, gl, metric="cosine", k=50)
    sharded = sharded_retrieval_metrics(q, ql, g, gl, metric="cosine", k=50)
    for key in ("map", "r_precision", "precision_at_1"):
        assert abs(single[key] - sharded[key]) < 1e-5, key


def test_sharded_metrics_multilabel_hamming(devices, rng):
    codes_q = np.sign(rng.randn(8, 32)).astype(np.float32)
    codes_g = np.sign(rng.randn(41, 32)).astype(np.float32)  # non-multiple of 8
    ql = (rng.rand(8, 6) > 0.6).astype(np.float32)
    gl = (rng.rand(41, 6) > 0.6).astype(np.float32)
    single = compute_retrieval_metrics(codes_q, ql, codes_g, gl, metric="hamming", k=41)
    sharded = sharded_retrieval_metrics(codes_q, ql, codes_g, gl, metric="hamming", k=41)
    assert abs(single["map"] - sharded["map"]) < 1e-5


def test_data_parallel_forward_matches_replicated(devices, rng):
    """Batch-sharded jit forward == single-device forward."""
    from irw_tpu.models import get_model

    mesh = make_mesh()
    model = get_model("dino_hash_baseline", backbone="vit_tiny", nbits=8)
    x = jnp.asarray(rng.rand(16, 32, 32, 3), dtype=jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
         "band_drop": jax.random.PRNGKey(2)}, x, train=False,
    )

    def fwd(v, inp):
        out, _ = model.apply(v, inp, train=False)
        return out

    plain = jax.jit(fwd)(variables, x)

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    sharded = jax.jit(fwd, in_shardings=(repl, data), out_shardings=data)(
        jax.device_put(variables, repl), jax.device_put(x, data)
    )
    np.testing.assert_allclose(np.asarray(plain), np.asarray(sharded), atol=1e-5)


@pytest.mark.parametrize("model_parallel", [1, 2])
def test_train_loop_uses_mesh(devices, tmp_path, rng, model_parallel):
    """The epoch loop auto-shards over the 8-device mesh (use_mesh); with
    experience.model_parallel=2 it runs dp×tp (data4 × model2)."""
    import optax

    from irw_tpu.data import SyntheticDataset
    from irw_tpu.engine.optimizers import build_optimizers
    from irw_tpu.engine.train import train
    from irw_tpu.getter import Getter, init_train_state
    from irw_tpu.losses import build_losses
    from irw_tpu.models import get_model
    from irw_tpu.samplers import RandomSampler

    dataset = SyntheticDataset(num_samples=32, num_classes=4, image_size=32, seed=0)
    (host_t, device_t), _ = Getter().get_transform(
        {"train": {"Resize": {"size": 32}, "CustomTransform": {"decompose_levels": 1}},
         "test": {"Resize": {"size": 32}, "CustomTransform": {"decompose_levels": 1}}}
    )
    model = get_model("single_band_net", backbone="vit_tiny", nbits=8, frozen_backbone=False)
    losses = build_losses([{"name": "HashLoss", "weight": 1.0,
                            "kwargs": {"num_classes": 4, "embedding_size": 8}}])
    sampler = RandomSampler(dataset, batch_size=16, seed=0)
    sampler.reshuffle(0)
    np_rng = np.random.RandomState(0)
    idx = sampler.batches[0]
    batch = {"image": np.stack([host_t(dataset.load_image(int(i)), np_rng, True) for i in idx]),
             "label": dataset.labels[idx], "index": np.asarray(idx)}
    x = device_t(batch["image"])
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
         "band_drop": jax.random.PRNGKey(2)}, x, train=True)
    entries = build_optimizers([{"name": "AdamW", "params": None, "kwargs": {"lr": 1e-3}}],
                               variables["params"])
    state = init_train_state(model, losses, entries, optax.adamw(1e-3), batch,
                             device_transform=device_t)
    config = {"experience": {"max_iter": 1, "train_eval_freq": 1, "eval_bs": 32,
                             "num_workers": 0, "distance_metric": "hamming",
                             "use_mesh": True, "seed": 0,
                             "model_parallel": model_parallel}}
    state, metrics = train(model, state, losses, entries, optax.adamw(1e-3),
                           dataset, sampler, {"test": dataset}, host_t, device_t,
                           config, str(tmp_path))
    assert "map_level0" in metrics["test"]


def test_train_loop_registers_attention_mesh_and_runs_vmem_attn(
        devices, tmp_path, rng):
    """The engine registers its mesh for the VMEM attention kernel
    (ops/vmem_attention.set_attention_mesh) so vmem_attn=True models train
    over the data-sharded mesh through shard_map — the multi-chip path the
    factory default relies on (Mosaic calls are opaque to GSPMD/Shardy)."""
    import optax

    from irw_tpu.data import SyntheticDataset
    from irw_tpu.engine.optimizers import build_optimizers
    from irw_tpu.engine.train import train
    from irw_tpu.getter import Getter, init_train_state
    from irw_tpu.losses import build_losses
    from irw_tpu.models import get_model
    from irw_tpu.ops import vmem_attention as va
    from irw_tpu.samplers import RandomSampler

    dataset = SyntheticDataset(num_samples=32, num_classes=4, image_size=32, seed=0)
    (host_t, device_t), _ = Getter().get_transform(
        {"train": {"Resize": {"size": 32}, "CustomTransform": {"decompose_levels": 1}},
         "test": {"Resize": {"size": 32}, "CustomTransform": {"decompose_levels": 1}}}
    )
    model = get_model("single_band_net", backbone="vit_tiny", nbits=8,
                      frozen_backbone=False, vit_kwargs={"vmem_attn": True})
    losses = build_losses([{"name": "HashLoss", "weight": 1.0,
                            "kwargs": {"num_classes": 4, "embedding_size": 8}}])
    sampler = RandomSampler(dataset, batch_size=16, seed=0)
    sampler.reshuffle(0)
    np_rng = np.random.RandomState(0)
    idx = sampler.batches[0]
    batch = {"image": np.stack([host_t(dataset.load_image(int(i)), np_rng, True) for i in idx]),
             "label": dataset.labels[idx], "index": np.asarray(idx)}
    x = device_t(batch["image"])
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
         "band_drop": jax.random.PRNGKey(2)}, x, train=True)
    entries = build_optimizers([{"name": "AdamW", "params": None, "kwargs": {"lr": 1e-3}}],
                               variables["params"])
    state = init_train_state(model, losses, entries, optax.adamw(1e-3), batch,
                             device_transform=device_t)
    config = {"experience": {"max_iter": 1, "train_eval_freq": 1, "eval_bs": 32,
                             "num_workers": 0, "distance_metric": "hamming",
                             "use_mesh": True, "seed": 0}}
    va.clear_attention_mesh()
    # spy on the registration: run_training registers the mesh for the
    # duration of the run and un-registers it on exit (a later offline eval
    # or second experiment must not inherit a stale mesh)
    registered = []
    orig_set = va.set_attention_mesh

    def spy_set(mesh, **kw):
        registered.append((dict(mesh.shape), kw))
        return orig_set(mesh, **kw)

    va.set_attention_mesh = spy_set
    try:
        state, metrics = train(model, state, losses, entries, optax.adamw(1e-3),
                               dataset, sampler, {"test": dataset}, host_t,
                               device_t, config, str(tmp_path))
        assert registered, "engine never registered the attention mesh"
        shape, kw = registered[0]
        assert shape == {"data": 8} and kw.get("batch_axes") == ("data",)
        assert not kw.get("band_fallback")
        assert va.attention_mesh() is None, "mesh must be cleared after the run"
        assert "map_level0" in metrics["test"]
        assert np.isfinite(metrics["test"]["map_level0"])
    finally:
        va.set_attention_mesh = orig_set
        va.clear_attention_mesh()


def test_train_loop_clears_attention_mesh_on_exception(devices, tmp_path, rng):
    """The mesh un-registration is a try/finally invariant, not a
    clean-return courtesy: a run that dies mid-epoch (failed step, eval
    error, KeyboardInterrupt) must still leave the process-global
    attention mesh cleared for library callers that catch and continue
    in-process (advisor r4 finding, engine/train.py)."""
    import optax

    from irw_tpu.data import SyntheticDataset
    from irw_tpu.engine.optimizers import build_optimizers
    from irw_tpu.engine.train import train
    from irw_tpu.getter import Getter, init_train_state
    from irw_tpu.losses import build_losses
    from irw_tpu.models import get_model
    from irw_tpu.ops import vmem_attention as va
    from irw_tpu.samplers import RandomSampler

    dataset = SyntheticDataset(num_samples=32, num_classes=4, image_size=32, seed=0)
    (host_t, device_t), _ = Getter().get_transform(
        {"train": {"Resize": {"size": 32}, "CustomTransform": {"decompose_levels": 1}},
         "test": {"Resize": {"size": 32}, "CustomTransform": {"decompose_levels": 1}}}
    )
    model = get_model("single_band_net", backbone="vit_tiny", nbits=8,
                      frozen_backbone=False)
    losses = build_losses([{"name": "HashLoss", "weight": 1.0,
                            "kwargs": {"num_classes": 4, "embedding_size": 8}}])
    sampler = RandomSampler(dataset, batch_size=16, seed=0)
    sampler.reshuffle(0)
    np_rng = np.random.RandomState(0)
    idx = sampler.batches[0]
    batch = {"image": np.stack([host_t(dataset.load_image(int(i)), np_rng, True) for i in idx]),
             "label": dataset.labels[idx], "index": np.asarray(idx)}
    x = device_t(batch["image"])
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
         "band_drop": jax.random.PRNGKey(2)}, x, train=True)
    entries = build_optimizers([{"name": "AdamW", "params": None, "kwargs": {"lr": 1e-3}}],
                               variables["params"])
    state = init_train_state(model, losses, entries, optax.adamw(1e-3), batch,
                             device_transform=device_t)
    config = {"experience": {"max_iter": 1, "train_eval_freq": 1, "eval_bs": 32,
                             "num_workers": 0, "distance_metric": "hamming",
                             "use_mesh": True, "seed": 0}}

    class Boom(RuntimeError):
        pass

    class ExplodingInstrumentor:
        # fires at the FIRST train batch — after the mesh registration,
        # before the step even compiles (cheapest in-body failure point)
        def snapshot_batch(self, batch):
            raise Boom("mid-epoch failure")

    va.clear_attention_mesh()
    try:
        with pytest.raises(Boom):
            train(model, state, losses, entries, optax.adamw(1e-3),
                  dataset, sampler, {"test": dataset}, host_t, device_t,
                  config, str(tmp_path), instrumentor=ExplodingInstrumentor())
        assert va.attention_mesh() is None, \
            "mesh must be cleared even when the run dies mid-epoch"
    finally:
        va.clear_attention_mesh()


def test_engine_evaluate_gallery_sharded_matches_single_device(devices, rng):
    """The ENGINE eval path (evaluate._metric_suite) now rides the mesh when
    >1 device is live: its result must equal the explicit single-device
    metric suite at VOC-ish scale (multi-label, hamming)."""
    from irw_tpu.engine.evaluate import _metric_suite

    nq, ng, nbits, ndim = 37, 203, 16, 16  # odd sizes: exercises gallery padding
    q = np.sign(rng.randn(nq, nbits)).astype(np.float32)
    g = np.sign(rng.randn(ng, nbits)).astype(np.float32)
    ql = (rng.rand(nq, 5) < 0.3).astype(np.float32)
    gl = (rng.rand(ng, 5) < 0.3).astype(np.float32)
    ql[np.arange(nq), rng.randint(0, 5, nq)] = 1.0
    gl[np.arange(ng), rng.randint(0, 5, ng)] = 1.0

    cfg = {"distance_metric": "hamming", "top_k": 50, "multi_label": True,
           "same_source": False}
    sharded = _metric_suite(jnp.asarray(q), ql, jnp.asarray(g), gl, cfg)
    single = _metric_suite(jnp.asarray(q), ql, jnp.asarray(g), gl,
                           {**cfg, "force_single_device": True})
    assert set(sharded) == set(single)
    for name in single:
        assert abs(sharded[name] - single[name]) < 1e-5, name


def test_tensor_parallel_step_matches_data_parallel(devices, rng):
    """One train step on a (data4 × model2) mesh with Megatron-style specs
    (parallel/tp.py) equals the replicated-params step: same loss; params
    agree to Adam's first-step reordering noise (update magnitude ≈ lr)."""
    import optax

    import __graft_entry__ as g
    from irw_tpu.engine.optimizers import build_optimizers
    from irw_tpu.engine.train import _build_hyper
    from irw_tpu.engine.train_step import build_train_step
    from irw_tpu.getter import init_train_state
    from irw_tpu.losses import build_losses
    from irw_tpu.parallel import (
        make_mesh,
        make_mesh_2d,
        tp_shardings,
        validate_tp_divisibility,
    )

    model = g._flagship("vit_tiny", nbits=16, embed_dim=64, num_heads=2)
    losses = build_losses([{"name": "HashLoss", "weight": 1.0,
                            "kwargs": {"num_classes": 4, "embedding_size": 16}}])
    loss_tx = optax.adamw(1e-3)
    bs = 8
    batch = {"image": rng.rand(bs, 4, 32, 32, 3).astype(np.float32),
             "label": np.arange(bs) % 4, "index": np.arange(bs)}
    entries_src = [{"name": "AdamW", "params": None, "kwargs": {"lr": 1e-3}}]
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
         "band_drop": jax.random.PRNGKey(2)},
        jnp.asarray(batch["image"]), train=True)
    entries = build_optimizers(entries_src, variables["params"])
    state = init_train_state(model, losses, entries, loss_tx, batch, seed=0)
    step = build_train_step(model, losses, entries, loss_tx, clip_grad=5.0)
    hyper = _build_hyper(entries, epoch=1, step=0, warm_up=0, warm_up_key=None)

    def run(tp: bool):
        if tp:
            mesh = make_mesh_2d(jax.devices(), model_parallel=2)
            validate_tp_divisibility(state.params, mesh)
            st_shard = tp_shardings(state, mesh)
        else:
            mesh = make_mesh(jax.devices())
            st_shard = NamedSharding(mesh, P())
        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P("data"))
        st = jax.device_put(state, st_shard)
        b = {k: jax.device_put(np.asarray(v), data) for k, v in batch.items()}
        hy = jax.device_put(hyper, repl)
        jitted = jax.jit(step, in_shardings=(st_shard, data, repl),
                         out_shardings=(st_shard, repl))
        new_state, metrics = jitted(st, b, hy)
        return float(metrics["total_loss"]), new_state

    loss_dp, s_dp = run(tp=False)
    loss_tp, s_tp = run(tp=True)
    assert abs(loss_dp - loss_tp) < 1e-4
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), s_dp.params, s_tp.params)
    assert max(jax.tree_util.tree_leaves(diffs)) < 5e-3


def test_tp_specs_shard_expected_leaves(devices):
    """The suffix rules hit attention qkv/out and MLP kernels (through the
    vmap band axis) and leave LayerNorm/BatchNorm/token params replicated."""
    import __graft_entry__ as g
    from irw_tpu.parallel import make_mesh_2d, tp_shardings

    model = g._flagship("vit_tiny", nbits=16, embed_dim=64, num_heads=2)
    variables = jax.eval_shape(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
             "band_drop": jax.random.PRNGKey(2)},
            jnp.zeros((1, 4, 32, 32, 3), jnp.float32), train=True))
    mesh = make_mesh_2d(jax.devices(), model_parallel=2)
    shardings = tp_shardings(variables["params"], mesh)
    flat = {"/".join(str(getattr(k, "key", k)) for k in path): s.spec
            for path, s in jax.tree_util.tree_flatten_with_path(shardings)[0]}
    sharded = {p for p, spec in flat.items() if any(ax == "model" for ax in spec)}
    assert any("attn/query/kernel" in p for p in sharded)
    assert any("attn/out/kernel" in p for p in sharded)
    assert any("Mlp_0/Dense_0/kernel" in p for p in sharded)
    assert any("Mlp_0/Dense_1/kernel" in p for p in sharded)
    assert not any("norm" in p.lower() for p in sharded)
    assert not any("pos_embed" in p or "cls_token" in p for p in sharded)


def test_band_specs_shard_expected_leaves(devices):
    """Band specs put the vmapped branch stack's leading axis on "band"
    (composing with tp on trailing axes); the fusion head and hash head
    stay replicated."""
    import __graft_entry__ as g
    from irw_tpu.parallel import make_mesh_3d, mesh_shardings

    model = g._flagship("vit_tiny", nbits=16, embed_dim=64, num_heads=2)
    variables = jax.eval_shape(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
             "band_drop": jax.random.PRNGKey(2)},
            jnp.zeros((1, 4, 32, 32, 3), jnp.float32), train=True))
    mesh = make_mesh_3d(jax.devices(), band_parallel=2, model_parallel=2)
    shardings = mesh_shardings(variables["params"], mesh,
                               band_axis="band", model_axis="model")
    flat = {"/".join(str(getattr(k, "key", k)) for k in path): s.spec
            for path, s in jax.tree_util.tree_flatten_with_path(shardings)[0]}
    banded = {p for p, spec in flat.items() if len(spec) and spec[0] == "band"}
    assert any("VmapVisionTransformer" in p for p in banded)
    # every vmapped leaf is band-sharded; nothing outside the stack is
    for p, spec in flat.items():
        if "Vmap" in p:
            assert spec[0] == "band", p
        else:
            assert not any(ax == "band" for ax in spec), p
    # band and tensor parallelism compose on the same leaf
    qk = next(p for p in flat if "attn/query/kernel" in p and "Vmap" in p)
    assert flat[qk][0] == "band" and any(ax == "model" for ax in flat[qk])


def test_band_parallel_step_matches_data_parallel(devices, rng):
    """One train step on a (data4 × band2) mesh (parallel/band.py: branch
    params/compute band-local, fusion-head all_gather inserted by XLA)
    equals the replicated-params step."""
    import optax

    import __graft_entry__ as g
    from irw_tpu.engine.optimizers import build_optimizers
    from irw_tpu.engine.train import _build_hyper
    from irw_tpu.engine.train_step import build_train_step
    from irw_tpu.getter import init_train_state
    from irw_tpu.losses import build_losses
    from irw_tpu.parallel import (
        make_mesh,
        make_mesh_3d,
        mesh_shardings,
        validate_band_divisibility,
    )

    model = g._flagship("vit_tiny", nbits=16, embed_dim=64, num_heads=2)
    losses = build_losses([{"name": "HashLoss", "weight": 1.0,
                            "kwargs": {"num_classes": 4, "embedding_size": 16}}])
    loss_tx = optax.adamw(1e-3)
    bs = 8
    batch = {"image": rng.rand(bs, 4, 32, 32, 3).astype(np.float32),
             "label": np.arange(bs) % 4, "index": np.arange(bs)}
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
         "band_drop": jax.random.PRNGKey(2)},
        jnp.asarray(batch["image"]), train=True)
    entries = build_optimizers([{"name": "AdamW", "params": None,
                                 "kwargs": {"lr": 1e-3}}], variables["params"])
    state = init_train_state(model, losses, entries, loss_tx, batch, seed=0)
    step = build_train_step(model, losses, entries, loss_tx, clip_grad=5.0)
    hyper = _build_hyper(entries, epoch=1, step=0, warm_up=0, warm_up_key=None)

    def run(band: bool):
        if band:
            mesh = make_mesh_3d(jax.devices(), band_parallel=2)
            validate_band_divisibility(state.params, mesh)
            st_shard = mesh_shardings(state, mesh, band_axis="band")
            data = NamedSharding(mesh, P("data"))
            img = NamedSharding(mesh, P("data", "band"))
        else:
            mesh = make_mesh(jax.devices())
            st_shard = NamedSharding(mesh, P())
            data = img = NamedSharding(mesh, P("data"))
        repl = NamedSharding(mesh, P())
        st = jax.device_put(state, st_shard)
        b = {k: jax.device_put(np.asarray(v), img if k == "image" else data)
             for k, v in batch.items()}
        hy = jax.device_put(hyper, repl)
        jitted = jax.jit(step, in_shardings=(st_shard, b_shardings(b, img, data), repl),
                         out_shardings=(st_shard, repl))
        new_state, metrics = jitted(st, b, hy)
        return float(metrics["total_loss"]), new_state

    def b_shardings(b, img, data):
        return {k: (img if k == "image" else data) for k in b}

    loss_dp, s_dp = run(band=False)
    loss_bp, s_bp = run(band=True)
    assert abs(loss_dp - loss_bp) < 1e-4
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), s_dp.params, s_bp.params)
    assert max(jax.tree_util.tree_leaves(diffs)) < 5e-3


def test_train_loop_band_parallel(devices, tmp_path, rng):
    """The epoch loop wires experience.band_parallel=2 into a
    (data4 × band2) mesh end-to-end (engine/train.py mesh block)."""
    import optax

    import __graft_entry__ as g
    from irw_tpu.data import SyntheticDataset
    from irw_tpu.engine.optimizers import build_optimizers
    from irw_tpu.engine.train import train
    from irw_tpu.getter import Getter, init_train_state
    from irw_tpu.losses import build_losses
    from irw_tpu.samplers import RandomSampler

    dataset = SyntheticDataset(num_samples=32, num_classes=4, image_size=32, seed=0)
    (host_t, device_t), _ = Getter().get_transform(
        {"train": {"Resize": {"size": 32}, "SWTTransform": {"level": 1, "wavelet": "haar"}},
         "test": {"Resize": {"size": 32}, "SWTTransform": {"level": 1, "wavelet": "haar"}}}
    )
    model = g._flagship("vit_tiny", nbits=8, embed_dim=64, num_heads=2)
    losses = build_losses([{"name": "HashLoss", "weight": 1.0,
                            "kwargs": {"num_classes": 4, "embedding_size": 8}}])
    sampler = RandomSampler(dataset, batch_size=16, seed=0)
    sampler.reshuffle(0)
    np_rng = np.random.RandomState(0)
    idx = sampler.batches[0]
    batch = {"image": np.stack([host_t(dataset.load_image(int(i)), np_rng, True) for i in idx]),
             "label": dataset.labels[idx], "index": np.asarray(idx)}
    x = device_t(batch["image"])
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
         "band_drop": jax.random.PRNGKey(2)}, x, train=True)
    entries = build_optimizers([{"name": "AdamW", "params": None, "kwargs": {"lr": 1e-3}}],
                               variables["params"])
    state = init_train_state(model, losses, entries, optax.adamw(1e-3), batch,
                             device_transform=device_t)
    config = {"experience": {"max_iter": 1, "train_eval_freq": 1, "eval_bs": 32,
                             "num_workers": 0, "distance_metric": "hamming",
                             "use_mesh": True, "seed": 0, "band_parallel": 2}}
    state, metrics = train(model, state, losses, entries, optax.adamw(1e-3),
                           dataset, sampler, {"test": dataset}, host_t, device_t,
                           config, str(tmp_path))
    assert "map_level0" in metrics["test"]


def test_band_parallel_fallback_keeps_tp(devices, tmp_path, rng):
    """band_parallel on a model with no Vmap band stack falls back cleanly
    WITHOUT dropping the (valid) tensor parallelism the user also asked
    for (engine/train.py validates the two axes independently)."""
    import optax

    from irw_tpu.data import SyntheticDataset
    from irw_tpu.engine.optimizers import build_optimizers
    from irw_tpu.engine.train import train
    from irw_tpu.getter import Getter, init_train_state
    from irw_tpu.losses import build_losses
    from irw_tpu.models import get_model
    from irw_tpu.samplers import RandomSampler

    dataset = SyntheticDataset(num_samples=32, num_classes=4, image_size=32, seed=0)
    (host_t, device_t), _ = Getter().get_transform(
        {"train": {"Resize": {"size": 32}, "CustomTransform": {"decompose_levels": 1}},
         "test": {"Resize": {"size": 32}, "CustomTransform": {"decompose_levels": 1}}}
    )
    model = get_model("single_band_net", backbone="vit_tiny", nbits=8,
                      frozen_backbone=False)
    losses = build_losses([{"name": "HashLoss", "weight": 1.0,
                            "kwargs": {"num_classes": 4, "embedding_size": 8}}])
    sampler = RandomSampler(dataset, batch_size=16, seed=0)
    sampler.reshuffle(0)
    np_rng = np.random.RandomState(0)
    idx = sampler.batches[0]
    batch = {"image": np.stack([host_t(dataset.load_image(int(i)), np_rng, True) for i in idx]),
             "label": dataset.labels[idx], "index": np.asarray(idx)}
    x = device_t(batch["image"])
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
         "band_drop": jax.random.PRNGKey(2)}, x, train=True)
    entries = build_optimizers([{"name": "AdamW", "params": None, "kwargs": {"lr": 1e-3}}],
                               variables["params"])
    state = init_train_state(model, losses, entries, optax.adamw(1e-3), batch,
                             device_transform=device_t)
    config = {"experience": {"max_iter": 1, "train_eval_freq": 1, "eval_bs": 32,
                             "num_workers": 0, "distance_metric": "hamming",
                             "use_mesh": True, "seed": 0,
                             "band_parallel": 2, "model_parallel": 2}}
    state, metrics = train(model, state, losses, entries, optax.adamw(1e-3),
                           dataset, sampler, {"test": dataset}, host_t, device_t,
                           config, str(tmp_path))
    assert "map_level0" in metrics["test"]


def test_pipeline_parallel_vit_forward_matches(devices, rng):
    """GPipe pipeline over a 'stage' mesh axis (parallel/pp.py): the
    pipelined block stack equals the plain scanned forward bit-exactly at
    2 and 4 stages."""
    from jax.sharding import Mesh

    from irw_tpu.models.vit import VisionTransformer
    from irw_tpu.parallel import pp_vit_forward

    vt = VisionTransformer(embed_dim=32, depth=4, num_heads=2, patch_size=8,
                           scan_blocks=True)
    x = jnp.asarray(rng.rand(8, 16, 16, 3), jnp.float32)
    variables = vt.init(jax.random.PRNGKey(0), x, train=False)
    ref, _ = vt.apply(variables, x, train=False)
    for n_stages in (2, 4):
        mesh = Mesh(np.asarray(jax.devices()[:n_stages]), ("stage",))
        got = pp_vit_forward(vt, variables, x, mesh=mesh, n_microbatches=4)
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_pipeline_parallel_gradients_match(devices, rng):
    """jax.grad flows through the ppermute tick loop: pipeline gradients
    equal the plain forward's gradients (ppermute transposes to the
    reverse permutation — no hand-written backward schedule)."""
    from jax.sharding import Mesh

    from irw_tpu.models.vit import VisionTransformer
    from irw_tpu.parallel import pp_vit_forward

    vt = VisionTransformer(embed_dim=32, depth=4, num_heads=2, patch_size=8,
                           scan_blocks=True)
    x = jnp.asarray(rng.rand(8, 16, 16, 3), jnp.float32)
    variables = vt.init(jax.random.PRNGKey(0), x, train=False)
    mesh = Mesh(np.asarray(jax.devices()[:2]), ("stage",))

    def loss_pp(params):
        out = pp_vit_forward(vt, {"params": params}, x, mesh=mesh,
                             n_microbatches=4)
        return (out ** 2).sum()

    def loss_ref(params):
        out, _ = vt.apply({"params": params}, x, train=False)
        return (out ** 2).sum()

    g_pp = jax.grad(loss_pp)(variables["params"])
    g_ref = jax.grad(loss_ref)(variables["params"])
    for a, b in zip(jax.tree_util.tree_leaves(g_pp),
                    jax.tree_util.tree_leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_fsdp_step_matches_data_parallel(devices, rng):
    """ZeRO-style param+optimizer sharding over the data axis
    (parallel/fsdp.py): one train step under FSDP shardings equals the
    replicated-state step, and per-device state bytes shrink ~8x."""
    import optax

    import __graft_entry__ as g
    from irw_tpu.engine.optimizers import build_optimizers
    from irw_tpu.engine.train import _build_hyper
    from irw_tpu.engine.train_step import build_train_step
    from irw_tpu.getter import init_train_state
    from irw_tpu.losses import build_losses
    from irw_tpu.parallel import bytes_per_device, fsdp_shardings, make_mesh

    model = g._flagship("vit_tiny", nbits=16, embed_dim=64, num_heads=2)
    losses = build_losses([{"name": "HashLoss", "weight": 1.0,
                            "kwargs": {"num_classes": 4, "embedding_size": 16}}])
    loss_tx = optax.adamw(1e-3)
    bs = 8
    batch = {"image": rng.rand(bs, 4, 32, 32, 3).astype(np.float32),
             "label": np.arange(bs) % 4, "index": np.arange(bs)}
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
         "band_drop": jax.random.PRNGKey(2)},
        jnp.asarray(batch["image"]), train=True)
    entries = build_optimizers(
        [{"name": "AdamW", "params": None, "kwargs": {"lr": 1e-3}}],
        variables["params"])
    state = init_train_state(model, losses, entries, loss_tx, batch, seed=0)
    step = build_train_step(model, losses, entries, loss_tx, clip_grad=5.0)
    hyper = _build_hyper(entries, epoch=1, step=0, warm_up=0, warm_up_key=None)
    mesh = make_mesh(jax.devices())

    def run(fsdp: bool):
        st_shard = (fsdp_shardings(state, mesh, min_size=1 << 8)
                    if fsdp else NamedSharding(mesh, P()))
        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P("data"))
        st = jax.device_put(state, st_shard)
        b = {k: jax.device_put(np.asarray(v), data) for k, v in batch.items()}
        hy = jax.device_put(hyper, repl)
        jitted = jax.jit(step, in_shardings=(st_shard, data, repl),
                         out_shardings=(st_shard, repl))
        new_state, metrics = jitted(st, b, hy)
        return float(metrics["total_loss"]), new_state, st_shard

    loss_dp, s_dp, _ = run(fsdp=False)
    loss_fsdp, s_fsdp, shardings = run(fsdp=True)
    assert abs(loss_dp - loss_fsdp) < 1e-4
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), s_dp.params, s_fsdp.params)
    assert max(jax.tree_util.tree_leaves(diffs)) < 5e-3

    # per-device bytes: params+opt moments must shrink with fsdp on
    dp_bytes = sum(l.nbytes for l in jax.tree_util.tree_leaves(state.params))
    dp_bytes += sum(l.nbytes for l in jax.tree_util.tree_leaves(state.opt_states))
    fs_bytes = bytes_per_device(state.params, shardings.params, mesh)
    fs_bytes += bytes_per_device(state.opt_states, shardings.opt_states, mesh)
    assert fs_bytes < dp_bytes / 3, (fs_bytes, dp_bytes)

    # the actual device shards agree with the accounting: the addressable
    # shard of a sharded leaf is 1/8 of the global leaf
    flat = jax.tree_util.tree_leaves(s_fsdp.params)
    sharded_leaves = [l for l in flat
                     if l.sharding.spec and any(s for s in l.sharding.spec)]
    assert sharded_leaves, "no parameter leaf actually sharded"
    for leaf in sharded_leaves[:4]:
        local = leaf.addressable_shards[0].data
        assert local.size == leaf.size // 8


def test_xbm_memory_mixing_sharded_matches_single_device(devices, rng):
    """XBM memory-mixing with a ref-aware loss ON THE MESH equals the
    single-device step: the data-sharded batch is inserted into the
    (replicated) ring memory inside the jitted step and PairLoss forms
    batch×memory pairs against it (reference base_update.py:75-113,
    memory.py:51-60).  Asserts the memory term is LIVE (non-zero part
    feeding total_loss) and that loss, memory part, updated params and
    updated XBM contents all match the unsharded step."""
    import optax

    import __graft_entry__ as g
    from irw_tpu.engine.optimizers import build_optimizers
    from irw_tpu.engine.train import _build_hyper
    from irw_tpu.engine.train_step import build_train_step
    from irw_tpu.engine.xbm import XBM
    from irw_tpu.getter import init_train_state
    from irw_tpu.losses import build_losses

    model = g._flagship("vit_tiny", nbits=16, embed_dim=64, num_heads=2)
    losses = build_losses(
        [{"name": "HashLoss", "weight": 1.0,
          "kwargs": {"num_classes": 4, "embedding_size": 16}},
         {"name": "PairLoss", "weight": 0.5, "kwargs": {"margin": 0.5}}])
    loss_tx = optax.adamw(1e-3)
    xbm = XBM(size=32, embedding_dim=16, unique=False, weight=0.5)
    bs = 8
    batch = {"image": rng.rand(bs, 4, 32, 32, 3).astype(np.float32),
             "label": np.arange(bs) % 4, "index": np.arange(bs)}
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
         "band_drop": jax.random.PRNGKey(2)},
        jnp.asarray(batch["image"]), train=True)
    entries = build_optimizers(
        [{"name": "AdamW", "params": None, "kwargs": {"lr": 1e-3}}],
        variables["params"])
    state = init_train_state(model, losses, entries, loss_tx, batch, seed=0,
                             xbm=xbm)
    step = build_train_step(model, losses, entries, loss_tx, xbm=xbm,
                            xbm_active=True, clip_grad=5.0)
    hyper = _build_hyper(entries, epoch=1, step=0, warm_up=0, warm_up_key=None)
    mesh = make_mesh(jax.devices())

    def run(sharded: bool, n_steps: int = 2):
        if sharded:
            repl = NamedSharding(mesh, P())
            data = NamedSharding(mesh, P("data"))
            jitted = jax.jit(step, in_shardings=(repl, data, repl),
                             out_shardings=(repl, repl))
            st = jax.device_put(state, repl)
            b = {k: jax.device_put(np.asarray(v), data) for k, v in batch.items()}
            hy = jax.device_put(hyper, repl)
        else:
            jitted = jax.jit(step)
            st, b, hy = state, dict(batch), hyper
        metrics = None
        for _ in range(n_steps):  # step 2 mixes step-1 memory contents
            st, metrics = jitted(st, b, hy)
        return st, {k: float(v) for k, v in metrics.items()}

    s1, m1 = run(sharded=False)
    s8, m8 = run(sharded=True)
    # the memory term must be live, not inert
    assert m8["loss_1_memory_PairLoss"] != 0.0, m8
    assert np.isfinite(m8["loss_1_memory_PairLoss"])
    for key in ("total_loss", "loss_1_memory_PairLoss", "loss_1_PairLoss"):
        assert abs(m1[key] - m8[key]) < 1e-4, (key, m1[key], m8[key])
    # inserted memory contents identical slots/order: GSPMD preserves
    # logical row order (atol covers step-1 param-update reduction-order
    # noise feeding the step-2 embeddings, observed ~4e-5)
    np.testing.assert_allclose(np.asarray(s1.xbm.embeddings),
                               np.asarray(s8.xbm.embeddings), atol=1e-3)
    np.testing.assert_array_equal(np.asarray(s1.xbm.valid),
                                  np.asarray(s8.xbm.valid))
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), s1.params, s8.params)
    assert max(jax.tree_util.tree_leaves(diffs)) < 5e-3


def test_fsdp_composes_with_tp_specs(devices):
    """fsdp(base=tp): tensor-sharded kernels keep their model-axis dim and
    gain a data-axis dim on another axis; replicated small leaves stay P()."""
    import __graft_entry__ as g
    from irw_tpu.parallel import fsdp_shardings, make_mesh_2d
    from irw_tpu.parallel.tp import tp_leaf_spec

    model = g._flagship("vit_tiny", nbits=16, embed_dim=64, num_heads=2)
    variables = jax.eval_shape(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
             "band_drop": jax.random.PRNGKey(2)},
            jnp.zeros((1, 4, 32, 32, 3), jnp.float32), train=True))
    mesh = make_mesh_2d(jax.devices(), model_parallel=2)
    shardings = fsdp_shardings(
        variables["params"], mesh, min_size=1 << 8,
        base_spec_fn=lambda names, ndim: tp_leaf_spec(names, ndim))
    flat = {"/".join(str(getattr(k, "key", k)) for k in path): s.spec
            for path, s in jax.tree_util.tree_flatten_with_path(shardings)[0]}
    both = [p for p, spec in flat.items()
            if any(ax == "model" for ax in spec) and any(ax == "data" for ax in spec)]
    assert both, "no leaf carries both model and data axes"
    for p, spec in flat.items():
        axes = [a for a in spec if a]
        assert len(axes) == len(set(axes)), (p, spec)


def _pp_baseline_setup(rng, n_classes=4, batch=8):
    """DINOHashBaseline (unfrozen scanned vit, depth 4) + a HashLoss train
    step's ingredients on plain images.  SGD optimizer so a one-step param
    delta IS the gradient (AdamW's normalisation amplifies float
    reassociation noise into the comparison)."""
    import optax

    from irw_tpu.engine.optimizers import build_optimizers
    from irw_tpu.getter import init_train_state
    from irw_tpu.losses import build_losses
    from irw_tpu.models import get_model

    model = get_model(
        "dino_hash_baseline", backbone="vit_tiny", nbits=8,
        frozen_backbone=False,
        vit_kwargs={"depth": 4, "scan_blocks": True})
    losses = build_losses([{"name": "HashLoss", "weight": 1.0,
                            "kwargs": {"num_classes": n_classes,
                                       "embedding_size": 8}}])
    images = np.asarray(rng.rand(batch, 16, 16, 3) * 255, np.uint8)
    labels = rng.randint(0, n_classes, batch)
    batch_d = {"image": images, "label": labels, "index": np.arange(batch)}
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
         "band_drop": jax.random.PRNGKey(2)},
        jnp.asarray(images, jnp.float32) / 255.0, train=True)
    entries = build_optimizers(
        [{"name": "SGD", "params": None, "kwargs": {"lr": 1e-2}}],
        variables["params"])
    state = init_train_state(model, losses, entries, optax.sgd(1e-2),
                             batch_d, seed=0)
    return model, losses, entries, state, batch_d


def test_pipeline_parallel_train_step_grads_match(devices, rng):
    """The engine train step with the pipelined apply (pp_apply_fn via
    build_train_step's apply_fn hook) produces the same loss AND the same
    updated parameters as the plain step — i.e. gradients flow correctly
    through the GPipe tick loop in TRAIN mode, at 2 and 4 stages."""
    import optax
    from jax.sharding import Mesh

    from irw_tpu.engine.train import _build_hyper
    from irw_tpu.engine.train_step import build_train_step
    from irw_tpu.parallel import pp_apply_fn

    model, losses, entries, state0, batch = _pp_baseline_setup(rng)
    hyper = _build_hyper(entries, 1, 0, 0, None)

    def run_step(apply_fn):
        step = jax.jit(build_train_step(
            model, losses, entries, optax.sgd(1e-2), apply_fn=apply_fn))
        state, metrics = step(state0, batch, hyper)
        return jax.device_get(state.params), float(metrics["total_loss"])

    ref_params, ref_loss = run_step(None)
    for n_stages in (2, 4):
        mesh = Mesh(np.asarray(jax.devices()[:n_stages]), ("stage",))
        pp_params, pp_loss = run_step(
            pp_apply_fn(model, mesh=mesh, n_microbatches=4))
        assert abs(pp_loss - ref_loss) < 1e-5
        # microbatched pipelining re-associates the wgrad accumulation
        # (sum of per-microbatch contractions vs one big contraction):
        # compare the GLOBAL updated-parameter vector by relative L2 —
        # per-leaf relative error is meaningless on mathematically-zero
        # gradients (e.g. attention key bias under softmax shift
        # invariance), where only float noise remains
        ref_vec = np.concatenate([np.asarray(l, np.float64).ravel()
                                  for l in jax.tree_util.tree_leaves(ref_params)])
        pp_vec = np.concatenate([np.asarray(l, np.float64).ravel()
                                 for l in jax.tree_util.tree_leaves(pp_params)])
        err = np.linalg.norm(ref_vec - pp_vec) / np.linalg.norm(ref_vec)
        assert err < 1e-6, f"global relative L2 {err} at {n_stages} stages"

    # the dp×pp composition the engine builds when devices > stages:
    # gpipe's data_axis branch shards the microbatch sample dim — a missing
    # psum/wrong out_spec in the shard_map transpose would corrupt
    # gradients ONLY in this configuration (microbatch 2 % data axis 2 = 0)
    mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(2, 2),
                ("data", "stage"))
    pp_params, pp_loss = run_step(
        pp_apply_fn(model, mesh=mesh, n_microbatches=4, data_axis="data"))
    assert abs(pp_loss - ref_loss) < 1e-5
    pp_vec = np.concatenate([np.asarray(l, np.float64).ravel()
                             for l in jax.tree_util.tree_leaves(pp_params)])
    ref_vec = np.concatenate([np.asarray(l, np.float64).ravel()
                              for l in jax.tree_util.tree_leaves(ref_params)])
    err = np.linalg.norm(ref_vec - pp_vec) / np.linalg.norm(ref_vec)
    assert err < 1e-6, f"global relative L2 {err} under dp4×pp2"



def test_pp_apply_fn_validates_at_construction(devices):
    """Statically-known invalid pp configs raise NotImplementedError at
    pp_apply_fn CONSTRUCTION — where the engine's fallback-to-dp
    try/except lives (engine/train.py) — not at first-batch trace time,
    which would kill the run mid-epoch."""
    from jax.sharding import Mesh

    from irw_tpu.models import get_model
    from irw_tpu.parallel import pp_apply_fn

    mesh = Mesh(np.asarray(jax.devices()[:2]), ("stage",))

    def baseline(**vit_kwargs):
        return get_model(
            "dino_hash_baseline", backbone="vit_tiny", nbits=8,
            frozen_backbone=False,
            vit_kwargs={"depth": 4, "scan_blocks": True, **vit_kwargs})

    with pytest.raises(NotImplementedError, match="dropout"):
        pp_apply_fn(baseline(dropout=0.1), mesh=mesh, n_microbatches=4)
    with pytest.raises(NotImplementedError, match="divisible"):
        pp_apply_fn(baseline(depth=3), mesh=mesh, n_microbatches=4)
    with pytest.raises(NotImplementedError, match="scan"):
        pp_apply_fn(baseline(scan_blocks=False), mesh=mesh, n_microbatches=4)
    # the serving-only int8 path must not silently train through round()'s
    # zero gradient (the stage body runs blocks with train=False, bypassing
    # Block's own guard)
    with pytest.raises(NotImplementedError, match="serving-only"):
        pp_apply_fn(baseline(quant_int8=True), mesh=mesh, n_microbatches=4)
    # statically-known batch divisibility: caught at construction (engine
    # fallback), not at first-batch trace
    with pytest.raises(NotImplementedError, match="microbatches"):
        pp_apply_fn(baseline(), mesh=mesh, n_microbatches=4, batch_size=10)
    mesh22 = Mesh(np.asarray(jax.devices()[:4]).reshape(2, 2),
                  ("data", "stage"))
    with pytest.raises(NotImplementedError, match="data axis"):
        pp_apply_fn(baseline(), mesh=mesh22, n_microbatches=4,
                    data_axis="data", batch_size=12)
    # the valid configs construct without raising
    pp_apply_fn(baseline(), mesh=mesh, n_microbatches=4, batch_size=16)
    pp_apply_fn(baseline(), mesh=mesh22, n_microbatches=4,
                data_axis="data", batch_size=16)


def test_pipeline_parallel_engine_knob(devices, tmp_path, rng):
    """experience.pipeline_parallel=2 drives the full epoch loop through
    the pipelined train step (engine/train.py pp branch) on a
    data×stage mesh."""
    import optax

    from irw_tpu.engine.train import train
    from irw_tpu.samplers import RandomSampler
    from irw_tpu.data import SyntheticDataset

    model, losses, entries, state, _ = _pp_baseline_setup(rng, batch=16)
    dataset = SyntheticDataset(num_samples=32, num_classes=4, image_size=16,
                               seed=0)
    host_t = lambda img, r=None, train=False: np.asarray(
        img.resize((16, 16)), np.uint8)
    sampler = RandomSampler(dataset, batch_size=16, seed=0)
    sampler.reshuffle(0)
    # batch 16 / 2 microbatches = 8 samples per tick, divisible by the
    # 4-wide data axis of the (data=4, stage=2) mesh
    config = {"experience": {"max_iter": 1, "train_eval_freq": 1,
                             "eval_bs": 32, "num_workers": 0,
                             "distance_metric": "hamming",
                             "use_mesh": True, "seed": 0,
                             "pipeline_parallel": 2, "pp_microbatches": 2}}
    state, metrics = train(model, state, losses, entries, optax.sgd(1e-2),
                           dataset, sampler, {"test": dataset}, host_t, None,
                           config, str(tmp_path))
    assert "map_level0" in metrics["test"]
