"""Int8 serving-path tests (ops/quant.py, QuantDense/QuantMHA) — fast tier.

The reference repo has no quantization support; this is a TPU-native
extension (v5e int8 MXU = 2× bf16 peak).  What must hold:

- the int8 dynamic-quant matmul approximates the float matmul within the
  error budget implied by 127-level symmetric quantization,
- Quant modules create the EXACT param tree of their float twins (so
  checkpoints, the torch converter, and TP specs apply unchanged),
- the flagship ViT forward under ``quant_int8`` stays directionally
  faithful (high cosine similarity of CLS embeddings), and
- the train path refuses to run quantized (zero-gradient trap).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from irw_tpu.models.layers import Mlp
from irw_tpu.models.vit import QuantMHA, VisionTransformer
from irw_tpu.ops.quant import int8_dot, quantize_symmetric

import flax.linen as nn


def test_quantize_symmetric_roundtrip():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(64, 384).astype(np.float32))
    q, s = quantize_symmetric(x, reduce_axes=(-1,))
    assert q.dtype == jnp.int8
    deq = q.astype(jnp.float32) * s
    # per-row max-abs 127-level grid: error ≤ scale/2 per element
    err = np.abs(np.asarray(deq - x))
    bound = np.asarray(s / 2 + 1e-6)
    assert (err <= bound).all()


def test_int8_dot_close_to_float():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(32, 384).astype(np.float32))
    w = jnp.asarray((rng.randn(384, 256) * 0.05).astype(np.float32))
    ref = x @ w
    out = int8_dot(x, w)
    rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
    assert rel < 0.02, rel


def test_quant_mlp_param_tree_and_output():
    x = jnp.asarray(np.random.RandomState(2).randn(4, 16, 384),
                    dtype=jnp.float32)
    f = Mlp(hidden_dim=1536, out_dim=384)
    g = Mlp(hidden_dim=1536, out_dim=384, quant_int8=True)
    vf = f.init(jax.random.PRNGKey(0), x)
    vq = g.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(vf) == jax.tree_util.tree_structure(vq)
    # same init → same float leaves
    for a, b in zip(jax.tree_util.tree_leaves(vf), jax.tree_util.tree_leaves(vq)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    yf = f.apply(vf, x)
    yq = g.apply(vf, x)  # float params flow through the quant path
    cos = float(jnp.sum(yf * yq)
                / (jnp.linalg.norm(yf) * jnp.linalg.norm(yq)))
    assert cos > 0.995, cos


def test_quant_mha_param_tree_matches_flax_and_output_close():
    x = jnp.asarray(np.random.RandomState(3).randn(2, 17, 384),
                    dtype=jnp.float32)
    flax_attn = nn.MultiHeadDotProductAttention(num_heads=6, deterministic=True)
    qattn = QuantMHA(num_heads=6)
    vf = flax_attn.init(jax.random.PRNGKey(0), x, x)
    vq = qattn.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(vf) == jax.tree_util.tree_structure(vq)
    assert [tuple(l.shape) for l in jax.tree_util.tree_leaves(vf)] == \
           [tuple(l.shape) for l in jax.tree_util.tree_leaves(vq)]
    yf = flax_attn.apply(vf, x, x)
    yq = qattn.apply(vf, x)  # the flax params, quantized on the fly
    cos = float(jnp.sum(yf * yq)
                / (jnp.linalg.norm(yf) * jnp.linalg.norm(yq)))
    assert cos > 0.99, cos


def test_vit_quant_forward_faithful_and_train_guarded():
    vit_kw = dict(embed_dim=64, depth=2, num_heads=2, patch_size=8,
                  img_size=32)
    x = jnp.asarray(np.random.RandomState(4).randn(2, 32, 32, 3),
                    dtype=jnp.float32)
    f = VisionTransformer(**vit_kw)
    q = VisionTransformer(**vit_kw, quant_int8=True)
    v = f.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    cls_f, _ = f.apply(v, x, train=False)
    cls_q, _ = q.apply(v, x, train=False)
    cos = np.asarray(
        jnp.sum(cls_f * cls_q, -1)
        / (jnp.linalg.norm(cls_f, axis=-1) * jnp.linalg.norm(cls_q, axis=-1)))
    assert (cos > 0.98).all(), cos
    with pytest.raises(ValueError, match="serving-only"):
        q.apply(v, x, train=True, rngs={"dropout": jax.random.PRNGKey(1)})


def test_compress_params_int8_bit_identical_through_quant_path():
    """compress→decompress must land exactly on the int8 grid the runtime
    requantization snaps to: a quant_int8 ViT applied to the reconstructed
    tree gives BIT-IDENTICAL outputs to the float tree, for both the
    unrolled and the scanned (stacked-depth) layouts."""
    from irw_tpu.ops.quant import (
        QuantizedLeaf,
        compress_params_int8,
        decompress_params_int8,
    )

    x = jnp.asarray(np.random.RandomState(6).randn(2, 32, 32, 3),
                    dtype=jnp.float32)
    for scan in (False, True):
        q = VisionTransformer(embed_dim=64, depth=2, num_heads=2, patch_size=8,
                              img_size=32, quant_int8=True, scan_blocks=scan)
        v = q.init({"params": jax.random.PRNGKey(0)}, x, train=False)
        ctree = compress_params_int8(v)
        qleaves = [l for l in jax.tree_util.tree_leaves(
            ctree, is_leaf=lambda l: isinstance(l, QuantizedLeaf))
            if isinstance(l, QuantizedLeaf)]
        # q/k/v/out + 2 mlp kernels per block; scanned stacks them
        assert len(qleaves) == (6 if scan else 12)
        assert all(l.q.dtype == jnp.int8 for l in qleaves)
        ref, _ = q.apply(v, x, train=False)
        got, _ = q.apply(decompress_params_int8(ctree), x, train=False)
        # requantization reproduces the identical int8 grid; the only
        # residual is the ≤1-ulp scale round-trip (127*s)/127
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)


def test_compress_params_int8_leaves_non_vit_alone():
    """Fusion/hash-head kernels (no Block scope) must pass through
    untouched — they run the float path."""
    from irw_tpu.ops.quant import QuantizedLeaf, compress_params_int8

    tree = {"params": {"HashHead_0": {"Dense_0": {
        "kernel": jnp.ones((8, 4)), "bias": jnp.zeros((4,))}}}}
    out = compress_params_int8(tree)
    leaf = out["params"]["HashHead_0"]["Dense_0"]["kernel"]
    assert not isinstance(leaf, QuantizedLeaf)
    np.testing.assert_array_equal(np.asarray(leaf), np.ones((8, 4)))


def test_vit_quant_composes_with_scan_blocks():
    vit_kw = dict(embed_dim=64, depth=2, num_heads=2, patch_size=8,
                  img_size=32)
    x = jnp.asarray(np.random.RandomState(5).randn(2, 32, 32, 3),
                    dtype=jnp.float32)
    q = VisionTransformer(**vit_kw, quant_int8=True, scan_blocks=True)
    v = q.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    cls_q, _ = jax.jit(lambda v, x: q.apply(v, x, train=False))(v, x)
    assert np.isfinite(np.asarray(cls_q)).all()
