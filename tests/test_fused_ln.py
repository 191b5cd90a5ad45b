"""Fused (stat-free custom-VJP) LayerNorm parity — ops/fused_ln.py.

The swap targets TPU backward scheduling (the round-4 profiler's
f32[bands, B, N] LayerNorm-stat spill class, BASELINE.md); numerically it
must be flax ``nn.LayerNorm`` to float tolerance in BOTH directions of
autodiff, with an identical parameter tree so checkpoints/converter/tp
specs are untouched.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from irw_tpu.ops.fused_ln import FusedLayerNorm, fused_layernorm


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_forward_matches_flax(rng, dtype):
    x = jnp.asarray(rng.randn(4, 9, 32), dtype)
    scale = jnp.asarray(rng.rand(32) + 0.5, jnp.float32)
    bias = jnp.asarray(rng.randn(32), jnp.float32)

    ref_mod = nn.LayerNorm(dtype=dtype)
    want = ref_mod.apply({"params": {"scale": scale, "bias": bias}}, x)
    got = fused_layernorm(x, scale, bias, 1e-6, dtype)
    assert got.dtype == want.dtype
    tol = 1e-6 if dtype == jnp.float32 else 2e-2
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32), atol=tol, rtol=tol)


def test_gradients_match_flax(rng):
    x = jnp.asarray(rng.randn(3, 7, 16), jnp.float32)
    scale = jnp.asarray(rng.rand(16) + 0.5, jnp.float32)
    bias = jnp.asarray(rng.randn(16), jnp.float32)
    cot = jnp.asarray(rng.randn(3, 7, 16), jnp.float32)

    def loss_fused(x, s, b):
        return jnp.sum(fused_layernorm(x, s, b, 1e-6, jnp.float32) * cot)

    def loss_ref(x, s, b):
        y = nn.LayerNorm().apply({"params": {"scale": s, "bias": b}}, x)
        return jnp.sum(y * cot)

    got = jax.grad(loss_fused, argnums=(0, 1, 2))(x, scale, bias)
    want = jax.grad(loss_ref, argnums=(0, 1, 2))(x, scale, bias)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   atol=1e-5, rtol=1e-5)


def test_module_param_tree_identical(rng):
    x = jnp.asarray(rng.randn(2, 5, 8), jnp.float32)
    ref = nn.LayerNorm().init(jax.random.PRNGKey(0), x)["params"]
    got = FusedLayerNorm().init(jax.random.PRNGKey(0), x)["params"]
    assert jax.tree_util.tree_structure(ref) == jax.tree_util.tree_structure(got)
    for (kr, vr), (kg, vg) in zip(sorted(ref.items()), sorted(got.items())):
        assert kr == kg and vr.shape == vg.shape and vr.dtype == vg.dtype


def test_vit_ln_fused_same_params_and_output(rng):
    """A ViT with ln_fused=True loads the ln_fused=False params verbatim
    (identical tree incl. the explicit LayerNorm_0 child names) and
    produces the same forward + input gradients."""
    from irw_tpu.models.vit import VisionTransformer

    kw = dict(embed_dim=32, depth=2, num_heads=2, patch_size=8,
              scan_blocks=True)
    stock = VisionTransformer(**kw)
    fused = VisionTransformer(ln_fused=True, **kw)
    x = jnp.asarray(rng.rand(2, 16, 16, 3), jnp.float32)
    variables = stock.init(jax.random.PRNGKey(0), x, train=False)
    v2 = fused.init(jax.random.PRNGKey(0), x, train=False)
    assert (jax.tree_util.tree_structure(variables)
            == jax.tree_util.tree_structure(v2))

    want, _ = stock.apply(variables, x, train=False)
    got, _ = fused.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)

    def loss(mod):
        return lambda xx: jnp.sum(mod.apply(variables, xx, train=False)[0] ** 2)

    gw = jax.grad(loss(stock))(x)
    gg = jax.grad(loss(fused))(x)
    np.testing.assert_allclose(np.asarray(gg), np.asarray(gw),
                               atol=2e-4, rtol=2e-4)


def test_custom_vjp_saves_no_stat_residuals(rng):
    """The design property the swap exists for: the VJP residuals are
    (x, scale) only — no f32 stat planes cross the fwd/bwd boundary."""
    x = jnp.asarray(rng.randn(4, 9, 32), jnp.bfloat16)
    scale = jnp.asarray(rng.rand(32) + 0.5, jnp.float32)
    bias = jnp.asarray(rng.randn(32), jnp.float32)

    _, vjp_fn = jax.vjp(
        lambda x, s, b: fused_layernorm(x, s, b, 1e-6, jnp.bfloat16),
        x, scale, bias)
    # residual leaves reachable from the vjp closure: x and scale only
    leaves = [l for l in jax.tree_util.tree_leaves(vjp_fn)
              if hasattr(l, "shape")]
    shapes = sorted(tuple(l.shape) for l in leaves)
    assert shapes == sorted([x.shape, scale.shape]), shapes
