"""Weight-converter structural tests: converted torch-format state dicts
must load into the flax models leaf-for-leaf (tools/convert_torch_weights)."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from convert_torch_weights import convert_resnet, stack_scanned_blocks  # noqa: E402


def fake_resnet18_sd(rng):
    sd = {}

    def add_conv(name, o, i, k):
        sd[name + ".weight"] = rng.randn(o, i, k, k).astype(np.float32) * 0.05

    def add_bn(name, c):
        sd[name + ".weight"] = np.ones(c, np.float32)
        sd[name + ".bias"] = np.zeros(c, np.float32)
        sd[name + ".running_mean"] = np.zeros(c, np.float32)
        sd[name + ".running_var"] = np.ones(c, np.float32)

    add_conv("conv1", 64, 3, 7)
    add_bn("bn1", 64)
    inc = 64
    for stage, (chan, blocks) in enumerate(zip([64, 128, 256, 512], [2, 2, 2, 2]), 1):
        for b in range(blocks):
            pre = f"layer{stage}.{b}"
            add_conv(pre + ".conv1", chan, inc if b == 0 else chan, 3)
            add_bn(pre + ".bn1", chan)
            add_conv(pre + ".conv2", chan, chan, 3)
            add_bn(pre + ".bn2", chan)
            if b == 0 and stage > 1:
                add_conv(pre + ".downsample.0", chan, inc, 1)
                add_bn(pre + ".downsample.1", chan)
            if b == 0:
                inc = chan
    return sd


def _flat_shapes(tree, prefix=""):
    out = {}
    for key, value in tree.items():
        if isinstance(value, dict):
            out.update(_flat_shapes(value, prefix + key + "/"))
        else:
            out[prefix + key] = tuple(value.shape)
    return out


@pytest.mark.slow
def test_resnet18_conversion_structural(rng):
    from irw_tpu.models.resnet import resnet18

    tree = convert_resnet(fake_resnet18_sd(rng), stage_sizes=(2, 2, 2, 2), bottleneck=False)
    model = resnet18()
    x = jnp.asarray(rng.rand(1, 64, 64, 3), jnp.float32)
    ref = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    assert _flat_shapes(ref["params"]) == _flat_shapes(tree["params"])
    assert _flat_shapes(ref["batch_stats"]) == _flat_shapes(tree["batch_stats"])
    out = model.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, tree["params"]),
         "batch_stats": jax.tree_util.tree_map(jnp.asarray, tree["batch_stats"])},
        x, train=False,
    )
    assert out.shape == (1, 512) and np.isfinite(np.asarray(out)).all()


@pytest.mark.slow
def test_scanned_block_stacking(rng):
    from irw_tpu.models.vit import VisionTransformer

    depth = 3
    unrolled = VisionTransformer(embed_dim=32, depth=depth, num_heads=2,
                                 patch_size=8, scan_blocks=False)
    scanned = VisionTransformer(embed_dim=32, depth=depth, num_heads=2,
                                patch_size=8, scan_blocks=True)
    x = jnp.asarray(rng.rand(2, 16, 16, 3), jnp.float32)
    pu = unrolled.init({"params": jax.random.PRNGKey(0)}, x, train=False)["params"]
    ps_ref = scanned.init({"params": jax.random.PRNGKey(0)}, x, train=False)["params"]

    converted = stack_scanned_blocks(dict(jax.device_get(pu)), depth)
    assert _flat_shapes(ps_ref) == _flat_shapes(converted)
    # forward equivalence: scanned(model with stacked unrolled params)
    # == unrolled(model with original params)
    out_unrolled, _ = unrolled.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, jax.device_get(
            unrolled.init({"params": jax.random.PRNGKey(0)}, x, train=False)["params"]))},
        x, train=False,
    )
    pu2 = jax.device_get(unrolled.init({"params": jax.random.PRNGKey(7)}, x, train=False)["params"])
    conv2 = stack_scanned_blocks(dict(pu2), depth)
    out_a, _ = unrolled.apply({"params": jax.tree_util.tree_map(jnp.asarray, pu2)}, x, train=False)
    out_b, _ = scanned.apply({"params": jax.tree_util.tree_map(jnp.asarray, conv2)}, x, train=False)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b), atol=1e-5)
