"""Serving export (tools/export_serving.py): the serialized jax.export
artifact reproduces the eval forward bit-exactly, serves any batch size
(symbolic batch dim), and rebuilds from a run checkpoint.

The reference has no serving/export story (evaluate.py re-instantiates the
torch model from config + checkpoint each run, SURVEY §3.3)."""

import numpy as np
import jax
import pytest

from tools.export_serving import export_model, _from_run

# jax.export roundtrips + a full run checkpoint — slow tier
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def flagship():
    from irw_tpu.models import get_model

    m = get_model(
        "multidino_attention_hashing_ortho", backbone="vit_tiny", nbits=16,
        fusion_config={"type": "cross_attention_advanced", "output_dim": 64,
                       "num_queries": 4, "num_heads": 2})
    shape = (4, 32, 32, 3)
    x = np.random.RandomState(0).rand(3, *shape).astype(np.float32)
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
            "band_drop": jax.random.PRNGKey(2)}
    variables = m.init(rngs, x, train=False)
    return m, variables, shape, x


def test_export_roundtrip_bit_exact(flagship, tmp_path):
    from jax import export as jexport

    model, variables, shape, x = flagship
    out = str(tmp_path / "m.jaxexp")
    export_model(model, variables, shape, out_path=out)
    fn = jexport.deserialize(open(out, "rb").read()).call
    got = np.asarray(jax.jit(fn)(x))
    ref = np.asarray(model.apply(variables, x, train=False)[0])
    np.testing.assert_array_equal(got, ref)


def test_export_symbolic_batch(flagship, tmp_path):
    from jax import export as jexport

    model, variables, shape, _ = flagship
    out = str(tmp_path / "m.jaxexp")
    export_model(model, variables, shape, out_path=out)
    fn = jexport.deserialize(open(out, "rb").read()).call
    for bs in (1, 5):
        x = np.random.RandomState(bs).rand(bs, *shape).astype(np.float32)
        assert np.asarray(jax.jit(fn)(x)).shape == (bs, 16)


def test_export_from_run_checkpoint(tmp_path):
    """Train one synthetic epoch, export from the rolling checkpoint, and
    check the artifact matches the restored model's forward."""
    import runpy
    import sys

    from jax import export as jexport

    base_dir = str(tmp_path)
    exp_dir = str(tmp_path / "export_smoke")  # log_dir/experiment_name
    argv_save = sys.argv
    sys.argv = ["single_experiment_runner.py", "transform=dwt_small",
                "experience.max_iter=1", "experience.experiment_name=export_smoke",
                f"experience.log_dir={base_dir}"]
    try:
        with pytest.raises(SystemExit) as exc:
            runpy.run_path("single_experiment_runner.py", run_name="__main__")
        assert exc.value.code in (0, None)
    finally:
        sys.argv = argv_save

    model, variables, config, _device_eval = _from_run(exp_dir)
    size = int(config.transform.test.get("Resize", {}).get("size", 32))
    level_sizes = size  # dwt_small halves spatial dims per level
    # infer the subband input shape from the device transform contract
    shape = (4, size // 2, size // 2, 3)
    x = np.random.RandomState(0).rand(2, *shape).astype(np.float32)
    out = str(tmp_path / "run.jaxexp")
    export_model(model, variables, shape, out_path=out)
    fn = jexport.deserialize(open(out, "rb").read()).call
    got = np.asarray(jax.jit(fn)(x))
    variables = jax.tree_util.tree_map(jax.numpy.asarray, variables)
    ref = np.asarray(model.apply(variables, x, train=False)[0])
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_export_without_baked_weights(flagship, tmp_path):
    """bake_weights=False exports call(variables, bands): tiny artifact,
    weights passed at serve time, same outputs."""
    from jax import export as jexport

    model, variables, shape, x = flagship
    out = str(tmp_path / "nobake.jaxexp")
    export_model(model, variables, shape, out_path=out, bake_weights=False)
    blob = open(out, "rb").read()
    assert len(blob) < 5_000_000  # program only, no weight constants
    fn = jexport.deserialize(blob).call
    got = np.asarray(jax.jit(fn)(variables, x))
    ref = np.asarray(model.apply(variables, x, train=False)[0])
    np.testing.assert_array_equal(got, ref)


def test_export_quant_int8(flagship, tmp_path):
    """--quant int8 export path: the quantized program accepts the float
    checkpoint verbatim (identical param tree) and its artifact stays
    directionally faithful to the float forward (ops/quant.py)."""
    import jax.tree_util as jtu
    from jax import export as jexport

    from irw_tpu.models import get_model

    model, variables, shape, x = flagship
    qmodel = get_model(
        "multidino_attention_hashing_ortho", backbone="vit_tiny", nbits=16,
        fusion_config={"type": "cross_attention_advanced", "output_dim": 64,
                       "num_queries": 4, "num_heads": 2},
        vit_kwargs={"quant_int8": True})
    out = str(tmp_path / "q.jaxexp")
    export_model(qmodel, variables, shape, out_path=out, compress_int8=True)
    # the quant-path kernels bake as int8 constants (smaller artifact)
    out_f = str(tmp_path / "f.jaxexp")
    export_model(model, variables, shape, out_path=out_f)
    import os

    assert os.path.getsize(out) < os.path.getsize(out_f)
    fn = jexport.deserialize(open(out, "rb").read()).call
    got = np.asarray(jax.jit(fn)(x))
    ref = np.asarray(model.apply(variables, x, train=False)[0])
    assert got.shape == ref.shape
    cos = (got * ref).sum(-1) / (
        np.linalg.norm(got, axis=-1) * np.linalg.norm(ref, axis=-1) + 1e-9)
    assert (cos > 0.97).all(), cos


def test_export_with_device_transform(flagship, tmp_path):
    """device_transform folds the SWT featurization into the program: the
    artifact takes raw uint8 images and matches transform+apply."""
    from jax import export as jexport

    from irw_tpu.transforms.pipeline import DeviceTransform

    model, variables, _, _ = flagship
    dt = DeviceTransform([("SWTTransform", {"level": 1, "wavelet": "haar"})])
    imgs = np.random.RandomState(3).randint(0, 256, (2, 32, 32, 3), np.uint8)
    out = str(tmp_path / "pipe.jaxexp")
    export_model(model, variables, (32, 32, 3), out_path=out,
                 device_transform=dt, symbolic_batch=2)
    fn = jexport.deserialize(open(out, "rb").read()).call
    got = np.asarray(jax.jit(fn)(imgs))
    ref = np.asarray(model.apply(variables, dt(imgs), train=False)[0])
    np.testing.assert_allclose(got, ref, atol=1e-6)
