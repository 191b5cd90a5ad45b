"""Model zoo tests: init/apply shape checks, train/eval routing, fusion-head
zoo, aux ortho loss, gradient flow.  (The reference's test_models.py only
printed shapes for one config.)"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from irw_tpu.models import get_model
from irw_tpu.models.fusion import get_fusion_head
from irw_tpu.models.retrieval_net import RetrievalNet
from irw_tpu.models.vit import make_vit

RNGS = {
    "params": jax.random.PRNGKey(0),
    "dropout": jax.random.PRNGKey(1),
    "band_drop": jax.random.PRNGKey(2),
}
APPLY_RNGS = {"dropout": jax.random.PRNGKey(3), "band_drop": jax.random.PRNGKey(4)}


def init_and_apply(model, x, train=True):
    variables = model.init(RNGS, x, train=train)
    out = model.apply(
        variables,
        x,
        train=train,
        rngs=APPLY_RNGS,
        mutable=["batch_stats"] if train else False,
    )
    if train:
        (result, aux), _ = out
    else:
        result, aux = out
    return result, aux, variables


FUSION_TYPES = [
    "standard",
    "temperature",
    "semantic",
    "gated",
    "temperature_gated",
    "self_attention",
    "cross_attention_bottleneck",
    "cross_attention_advanced",
    "cbam",
    "eca",
]


@pytest.mark.parametrize("ftype", FUSION_TYPES)
def test_fusion_head_zoo(ftype, rng):
    bands = jnp.asarray(rng.randn(4, 4, 32), dtype=jnp.float32)
    head = get_fusion_head(
        {"type": ftype, "output_dim": 32, "num_heads": 4, "num_queries": 3}, 32
    )
    fused, aux, _ = init_and_apply(head, bands, train=True)
    assert fused.shape == (4, 32)
    assert "ortho_loss" in aux
    assert np.isfinite(float(aux["ortho_loss"]))


def test_cross_attention_ortho_loss_positive(rng):
    bands = jnp.asarray(rng.randn(4, 4, 32), dtype=jnp.float32)
    head = get_fusion_head(
        {
            "type": "cross_attention_advanced",
            "output_dim": 32,
            "num_heads": 4,
            "num_queries": 4,
            "ortho_weight": 1.0,
            "sub_band_dropout_p": 0.0,
        },
        32,
    )
    fused, aux, _ = init_and_apply(head, bands, train=True)
    assert float(aux["ortho_loss"]) > 0
    # eval: no ortho loss (reference :829-832)
    fused_e, aux_e, _ = init_and_apply(head, bands, train=False)
    assert float(aux_e["ortho_loss"]) == 0.0


def test_cross_attention_ortho_raw_is_unscaled(rng):
    """aux['ortho_raw'] is the PRE-ortho_weight constraint violation:
    observable at λ=0 and comparable across configs with different λ
    (feeds train/ortho_raw in engine/train_step.py)."""
    bands = jnp.asarray(rng.randn(4, 4, 32), dtype=jnp.float32)

    def head_with(w):
        return get_fusion_head(
            {
                "type": "cross_attention_advanced",
                "output_dim": 32,
                "num_heads": 4,
                "num_queries": 4,
                "ortho_weight": w,
                "sub_band_dropout_p": 0.0,
            },
            32,
        )

    _, aux, _ = init_and_apply(head_with(0.5), bands, train=True)
    assert float(aux["ortho_raw"]) > 0
    assert np.isclose(float(aux["ortho_loss"]),
                      0.5 * float(aux["ortho_raw"]), rtol=1e-6)
    # λ=0: zero penalty, but the violation stays observable
    _, aux0, _ = init_and_apply(head_with(0.0), bands, train=True)
    assert float(aux0["ortho_loss"]) == 0.0
    assert float(aux0["ortho_raw"]) > 0


def test_multidino_hashing_routing(rng):
    m = get_model(
        "multidino_attention_hashing_ortho",
        backbone="vit_tiny",
        nbits=16,
        fusion_config={
            "type": "cross_attention_advanced",
            "output_dim": 64,
            "num_queries": 4,
            "num_heads": 2,
        },
    )
    x = jnp.asarray(rng.rand(2, 4, 32, 32, 3), dtype=jnp.float32)
    logits, aux, variables = init_and_apply(m, x, train=True)
    assert logits.shape == (2, 16)
    # eval → ±1 codes
    codes, _ = m.apply(variables, x, train=False)
    assert set(np.unique(np.asarray(codes))) <= {-1.0, 0.0, 1.0}


def test_shared_dino_band_major_equivalence(rng):
    """SharedDinoHashing's band-major flatten must equal per-band forward."""
    m = get_model("shared_dino_hashing", backbone="vit_tiny", nbits=8,
                  fusion_config={"type": "standard", "output_dim": 64, "num_heads": 2})
    x = jnp.asarray(rng.rand(2, 4, 32, 32, 3), dtype=jnp.float32)
    out, aux, variables = init_and_apply(m, x, train=True)
    assert out.shape == (2, 8)


def test_prompted_shared_dino(rng):
    m = get_model(
        "prompted_shared_dino_hashing",
        backbone="vit_tiny",
        nbits=8,
        num_prompts=3,
        use_dsln=True,
        fusion_config={"type": "standard", "output_dim": 64, "num_heads": 2},
    )
    x = jnp.asarray(rng.rand(2, 4, 32, 32, 3), dtype=jnp.float32)
    out, aux, variables = init_and_apply(m, x, train=True)
    assert out.shape == (2, 8)
    # per-band prompts exist
    flat = jax.tree_util.tree_leaves_with_path(variables["params"])
    names = ["/".join(str(p) for p in path) for path, _ in flat]
    assert any("prompts" in n for n in names)


@pytest.mark.slow
def test_wcnn_train_eval_routing(rng):
    m = get_model("wcnn_ce", num_classes=7, backbone="resnet18")
    x = jnp.asarray(rng.rand(2, 4, 32, 32, 3), dtype=jnp.float32)
    logits, aux, variables = init_and_apply(m, x, train=True)
    assert isinstance(logits, list) and len(logits) == 4
    assert logits[0].shape == (2, 7)
    emb, _ = m.apply(variables, x, train=False)
    assert emb.shape == (2, 4 * 512)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(emb), axis=1), 1.0, atol=1e-4)


@pytest.mark.slow
def test_wresnet_in_model_dwt(rng):
    m = get_model("wresnet", decom_level=1, wave="haar", attention="cbam")
    x = jnp.asarray(rng.rand(2, 32, 32, 3), dtype=jnp.float32)
    out, aux, _ = init_and_apply(m, x, train=True)
    assert out.shape == (2, 2048)
    assert "gate" in aux


@pytest.mark.slow
def test_mtwavenet_stage_attention(rng):
    m = get_model("mtwavenet", num_classes=5)
    x = jnp.asarray(rng.rand(2, 4, 32, 32, 3), dtype=jnp.float32)
    logits, aux, variables = init_and_apply(m, x, train=True)
    assert isinstance(logits, list) and len(logits) == 4
    emb, _ = m.apply(variables, x, train=False)
    assert emb.shape == (2, 4 * 512)


@pytest.mark.slow
def test_mtwavenet50_fusion_returns_five_heads(rng):
    m = get_model("mtwavenet50_fusion", num_classes=5)
    x = jnp.asarray(rng.rand(1, 4, 32, 32, 3), dtype=jnp.float32)
    logits, aux, variables = init_and_apply(m, x, train=True)
    assert len(logits) == 5  # 4 branches + fused (mtwavenet.py:408-417)
    assert "gate" in aux


def test_resnet_ce_routing(rng):
    m = get_model("resnet18_ce", num_classes=11)
    x = jnp.asarray(rng.rand(2, 32, 32, 3), dtype=jnp.float32)
    logits, _, variables = init_and_apply(m, x, train=True)
    assert logits.shape == (2, 11)
    emb, _ = m.apply(variables, x, train=False)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(emb), axis=1), 1.0, atol=1e-4)


def test_hashnet_alpha_continuation(rng):
    m = get_model("resnet_hashing_alpha", nbits=12, depth=18)
    x = jnp.asarray(rng.rand(2, 32, 32, 3), dtype=jnp.float32)
    variables = m.init(RNGS, x, train=True)
    out1, _ = m.apply(variables, x, train=True, alpha=0.1, rngs=APPLY_RNGS, mutable=["batch_stats"])[0]
    out2, _ = m.apply(variables, x, train=True, alpha=10.0, rngs=APPLY_RNGS, mutable=["batch_stats"])[0]
    # larger alpha → more saturated codes
    assert float(jnp.abs(out2).mean()) > float(jnp.abs(out1).mean())


def test_single_band_and_baseline(rng):
    x_bands = jnp.asarray(rng.rand(2, 4, 32, 32, 3), dtype=jnp.float32)
    m = get_model("single_band_net", backbone="vit_tiny", band=2, nbits=8)
    out, _, _ = init_and_apply(m, x_bands, train=True)
    assert out.shape == (2, 8)

    x = jnp.asarray(rng.rand(2, 32, 32, 3), dtype=jnp.float32)
    m2 = get_model("dino_hash_baseline", backbone="vit_tiny", nbits=8)
    out2, _, _ = init_and_apply(m2, x, train=True)
    assert out2.shape == (2, 8)


def test_retrieval_net_wrapper(rng):
    backbone = make_vit("vit_tiny")
    net = RetrievalNet(backbone=backbone, embed_dim=24)
    x = jnp.asarray(rng.rand(2, 32, 32, 3), dtype=jnp.float32)
    emb, aux, _ = init_and_apply(net, x, train=True)
    assert emb.shape == (2, 24)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(emb), axis=1), 1.0, atol=1e-4)


@pytest.mark.slow
def test_grad_flows_through_flagship(rng):
    m = get_model(
        "multidino_attention_hashing_ortho",
        backbone="vit_tiny",
        nbits=8,
        frozen_backbone=False,
        fusion_config={"type": "cross_attention_advanced", "output_dim": 64,
                       "num_queries": 2, "num_heads": 2, "ortho_weight": 0.5},
    )
    x = jnp.asarray(rng.rand(2, 4, 32, 32, 3), dtype=jnp.float32)
    variables = m.init(RNGS, x, train=True)

    def loss_fn(params):
        (logits, aux), _ = m.apply(
            {**variables, "params": params},
            x,
            train=True,
            rngs=APPLY_RNGS,
            mutable=["batch_stats"],
        )
        return jnp.sum(logits**2) + aux["ortho_loss"]

    grads = jax.grad(loss_fn)(variables["params"])
    gnorm = sum(float(jnp.abs(g).sum()) for g in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(gnorm) and gnorm > 0


@pytest.mark.slow
def test_convnext_backbone(rng):
    m = get_model("convnext_tiny")
    x = jnp.asarray(rng.rand(1, 64, 64, 3), dtype=jnp.float32)
    variables = m.init(RNGS, x, train=False)
    out = m.apply(variables, x, train=False)
    assert out.shape == (1, 768)


@pytest.mark.slow
def test_hf_clip_tower(rng):
    m = get_model("clip_vit_b32")
    x = jnp.asarray(rng.rand(1, 224, 224, 3), dtype=jnp.float32)
    variables = m.init(RNGS, x, train=False)
    out, aux = m.apply(variables, x, train=False)
    assert out.shape == (1, 768)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(out), axis=1), 1.0, atol=1e-4)


def test_dtype_string_parsing(rng):
    m = get_model("vit_tiny", dtype="bfloat16")
    assert m.dtype == jnp.bfloat16


@pytest.mark.slow
def test_vit_remat_blocks_same_forward_and_grads():
    """remat_blocks changes memory scheduling only: identical forward
    outputs and gradients vs the plain scanned ViT."""
    import jax
    import jax.numpy as jnp

    from irw_tpu.models.vit import VisionTransformer

    x = jnp.asarray(np.random.RandomState(0).randn(2, 16, 16, 3), jnp.float32)
    base = VisionTransformer(embed_dim=32, depth=3, num_heads=2, patch_size=8,
                             scan_blocks=True)
    remat = VisionTransformer(embed_dim=32, depth=3, num_heads=2, patch_size=8,
                              scan_blocks=True, remat_blocks=True)
    variables = base.init(jax.random.PRNGKey(0), x, train=False)

    out_b, _ = base.apply(variables, x, train=False)
    out_r, _ = remat.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(out_b), np.asarray(out_r), atol=1e-6)

    def loss(m):
        def f(p):
            out, _ = m.apply({"params": p}, x, train=False)
            return (out ** 2).sum()
        return f

    g_b = jax.grad(loss(base))(variables["params"])
    g_r = jax.grad(loss(remat))(variables["params"])
    for a, b in zip(jax.tree_util.tree_leaves(g_b), jax.tree_util.tree_leaves(g_r)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


@pytest.mark.slow
def test_vit_fused_qkv_same_params_and_forward():
    """The opt-in fused-QKV attention keeps the flax MHA param tree
    (query/key/value/out) and produces identical forward outputs."""
    import jax
    import jax.tree_util as jtu

    from irw_tpu.models.vit import VisionTransformer

    kw = dict(embed_dim=32, depth=2, num_heads=2, patch_size=8, img_size=16)
    base = VisionTransformer(**kw)
    fused = VisionTransformer(**kw, fused_qkv=True)
    x = jnp.asarray(np.random.RandomState(1).randn(2, 16, 16, 3), jnp.float32)
    variables = base.init(jax.random.PRNGKey(0), x, train=False)
    assert jtu.tree_structure(variables) == jtu.tree_structure(
        fused.init(jax.random.PRNGKey(0), x, train=False))
    out_b, _ = base.apply(variables, x, train=False)
    out_f, _ = fused.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(out_b), np.asarray(out_f), atol=1e-6)


@pytest.mark.slow
def test_split_cls_attention_matches_default(rng):
    """SplitCLSMHA (lane-aligned 256+1 attention) shares flax MHA's param
    tree and reproduces its output — bit-exact at dropout 0."""
    from irw_tpu.models.vit import Block

    x = jnp.asarray(rng.randn(2, 257, 64), jnp.float32)
    base = Block(num_heads=4)
    split = Block(num_heads=4, split_cls=True)
    variables = base.init({"params": jax.random.PRNGKey(0)}, x)
    out_base = base.apply(variables, x)
    out_split = split.apply(variables, x)  # same params, different path
    np.testing.assert_allclose(np.asarray(out_base), np.asarray(out_split),
                               atol=1e-6)
    # prompt-token counts (SharedDino prompts) change N: still correct
    x2 = jnp.asarray(rng.randn(2, 10, 64), jnp.float32)
    v2 = base.init({"params": jax.random.PRNGKey(1)}, x2)
    np.testing.assert_allclose(np.asarray(base.apply(v2, x2)),
                               np.asarray(split.apply(v2, x2)), atol=1e-5)


@pytest.mark.slow
def test_split_cls_full_vit_matches_default(rng):
    """End-to-end ViT forward with split_cls == default (shared params),
    including under scan_blocks."""
    from irw_tpu.models.vit import VisionTransformer

    x = jnp.asarray(rng.rand(2, 32, 32, 3), jnp.float32)
    base = VisionTransformer(embed_dim=64, depth=2, num_heads=4, patch_size=8,
                             scan_blocks=True)
    split = VisionTransformer(embed_dim=64, depth=2, num_heads=4, patch_size=8,
                              scan_blocks=True, split_cls=True)
    variables = base.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    out_base, _ = base.apply(variables, x, train=False)
    out_split, _ = split.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(out_base), np.asarray(out_split),
                               atol=1e-5)


@pytest.mark.slow
def test_vit_attn_probs_remat_policy_same_forward_and_grads():
    """The ``dots_no_batch_attn`` policy (pin tagged softmax probs) is a
    memory-scheduling change only: outputs and gradients match the
    untagged ``dots_no_batch`` ViT exactly, and an unknown policy name
    still raises."""
    import jax
    import jax.numpy as jnp
    import pytest

    from irw_tpu.models.vit import VisionTransformer

    x = jnp.asarray(np.random.RandomState(1).randn(2, 16, 16, 3), jnp.float32)
    kw = dict(embed_dim=32, depth=3, num_heads=2, patch_size=8,
              scan_blocks=True, remat_blocks=True)
    base = VisionTransformer(**kw, remat_policy="dots_no_batch")
    variables = base.init(jax.random.PRNGKey(0), x, train=False)

    def loss(m):
        def f(p):
            out, _ = m.apply({"params": p}, x, train=False)
            return (out ** 2).sum()
        return f

    g_b = jax.grad(loss(base))(variables["params"])
    out_b, _ = base.apply(variables, x, train=False)
    for policy in ("dots_no_batch_attn", "dots_no_batch_gelu_attn"):
        tagged = VisionTransformer(**kw, remat_policy=policy)
        out_t, _ = tagged.apply(variables, x, train=False)
        np.testing.assert_allclose(np.asarray(out_b), np.asarray(out_t),
                                   atol=1e-6)
        g_t = jax.grad(loss(tagged))(variables["params"])
        for a, b in zip(jax.tree_util.tree_leaves(g_b),
                        jax.tree_util.tree_leaves(g_t)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    with pytest.raises(ValueError, match="unknown remat_policy"):
        VisionTransformer(**kw, remat_policy="dots_nobatch").init(
            jax.random.PRNGKey(0), x, train=False)


def test_regroup_block_params_roundtrip():
    """regroup_block_params is a lossless reshape between the flat
    (depth, ...) scan layout and the grouped (G, k, ...) layout, with flat
    block d at grouped [d // k, d % k]."""
    from irw_tpu.models.vit import regroup_block_params

    depth, k = 6, 3
    flat = {"Block_0": {"w": np.arange(depth * 4.0).reshape(depth, 4)}}
    grouped = regroup_block_params(flat, k)
    assert set(grouped) == {"inner"}
    g = grouped["inner"]["Block_0"]["w"]
    assert g.shape == (depth // k, k, 4)
    np.testing.assert_array_equal(g[1, 2], flat["Block_0"]["w"][5])
    back = regroup_block_params(grouped, 1)
    np.testing.assert_array_equal(back["Block_0"]["w"], flat["Block_0"]["w"])
    # re-grouping to a different k goes through the flat layout
    re2 = regroup_block_params(grouped, 2)
    assert re2["inner"]["Block_0"]["w"].shape == (3, 2, 4)
    np.testing.assert_array_equal(re2["inner"]["Block_0"]["w"][2, 1],
                                  flat["Block_0"]["w"][5])


@pytest.mark.slow
def test_vit_grouped_remat_scan_matches_flat():
    """scan_group changes only the remat/scan schedule: with params
    regrouped between layouts, forward outputs and gradients are identical
    to the per-block scanned ViT (the grouped/"sqrt" remat of the round-4
    carry-stack analysis, BASELINE.md)."""
    from irw_tpu.models.vit import VisionTransformer, regroup_block_params

    x = jnp.asarray(np.random.RandomState(0).randn(2, 16, 16, 3), jnp.float32)
    kw = dict(embed_dim=32, depth=4, num_heads=2, patch_size=8,
              scan_blocks=True, remat_blocks=True, remat_policy="nothing")
    flat = VisionTransformer(**kw)
    grouped = VisionTransformer(**kw, scan_group=2)
    variables = flat.init(jax.random.PRNGKey(0), x, train=False)
    p_flat = variables["params"]
    p_grp = dict(p_flat)
    p_grp["blocks"] = regroup_block_params(p_flat["blocks"], 2)

    # the grouped init produces exactly this structure (so checkpoints
    # restore after regrouping)
    init_grp = grouped.init(jax.random.PRNGKey(0), x, train=False)["params"]
    assert (jax.tree_util.tree_structure(init_grp)
            == jax.tree_util.tree_structure(p_grp))
    assert all(a.shape == b.shape for a, b in zip(
        jax.tree_util.tree_leaves(init_grp), jax.tree_util.tree_leaves(p_grp)))

    out_f, _ = flat.apply({"params": p_flat}, x, train=False)
    out_g, _ = grouped.apply({"params": p_grp}, x, train=False)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_g), atol=1e-6)

    def loss(m):
        def f(p):
            out, _ = m.apply({"params": p}, x, train=False)
            return (out ** 2).sum()
        return f

    g_f = jax.grad(loss(flat))(p_flat)
    g_g = jax.grad(loss(grouped))(p_grp)
    g_g_flat = dict(g_g)
    g_g_flat["blocks"] = regroup_block_params(g_g["blocks"], 1)
    for a, b in zip(jax.tree_util.tree_leaves(g_f),
                    jax.tree_util.tree_leaves(g_g_flat)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    # depth not divisible by the group size is a construction-time error
    with pytest.raises(ValueError):
        bad = VisionTransformer(**kw, scan_group=3)
        bad.init(jax.random.PRNGKey(0), x, train=False)
