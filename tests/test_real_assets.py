"""Gated end-to-end tests with REAL pretrained weights / REAL data.

This image has no torch-hub/HF caches, no torchvision/timm and no datasets
on disk (verified by a full filesystem scan, round 4) — the reference's
actual scientific workload (pretrained DINOv2 via torch.hub,
net.py:222-273; real VOC via torchvision auto-download, voc.py:20-24)
cannot be executed here.  These tests run the full pipeline whenever the
assets ARE present, and skip cleanly otherwise:

- ``IRW_REAL_WEIGHTS``: path to a DINOv2 ViT-S/14 torch checkpoint
  (``dinov2_vits14_pretrain.pth`` from the dinov2 release) — drives
  converter → flagship graft → forward.
- ``IRW_REAL_DATA``: path to a VOCdevkit tree (``VOCdevkit/VOC2012/...``)
  — drives dataset parse → embed → retrieval eval.

Offline recipe: MIGRATING.md §"Real pretrained weights".
"""

import os

import numpy as np
import pytest

REAL_WEIGHTS = os.environ.get("IRW_REAL_WEIGHTS")
REAL_DATA = os.environ.get("IRW_REAL_DATA")


@pytest.mark.skipif(
    not REAL_WEIGHTS,
    reason="set IRW_REAL_WEIGHTS=/path/to/dinov2_vits14_pretrain.pth",
)
def test_real_dinov2_converts_and_embeds():
    """torch checkpoint → convert_dinov2 → flagship graft → forward: codes
    must be valid sign codes and differ from the random-init output."""
    torch = pytest.importorskip("torch")
    import jax
    import jax.numpy as jnp

    from irw_tpu.models import get_model
    from irw_tpu.utils.pretrained import (
        broadcast_to_bands,
        graft_flagship_backbone,
    )
    from tools.convert_torch_weights import convert_dinov2, stack_scanned_blocks

    sd = torch.load(REAL_WEIGHTS, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    tree = convert_dinov2(sd)
    depth = sum(1 for k in tree["params"] if k.startswith("Block_"))
    tree["params"] = stack_scanned_blocks(tree["params"], depth)

    model = get_model(
        "multidino_attention_hashing_ortho",
        backbone="dinov2_vits14", nbits=64, frozen_backbone=True,
        vit_kwargs={"exact_gelu": True},  # bit parity with torch weights
        fusion_config={"type": "cross_attention_advanced", "output_dim": 384,
                       "num_queries": 4, "num_heads": 8, "ortho_weight": 0.01},
    )
    k = jax.random.PRNGKey(0)
    bands = jnp.asarray(np.random.RandomState(0).rand(2, 4, 224, 224, 3),
                        jnp.float32)
    variables = jax.jit(lambda r, x: model.init(r, x, train=False))(
        {"params": k, "dropout": k, "band_drop": k}, bands)
    rand_codes, _ = model.apply(variables, bands, train=False)

    params = graft_flagship_backbone(dict(variables["params"]),
                                     tree["params"])
    real_codes, _ = model.apply({"params": params}, bands, train=False)
    assert real_codes.shape == (2, 64)
    assert set(np.unique(np.asarray(real_codes))) <= {-1.0, 0.0, 1.0}
    assert not np.array_equal(np.asarray(real_codes), np.asarray(rand_codes))
    # tiled towers: every band got the same pretrained weights
    banded = broadcast_to_bands(tree["params"])
    leaf = next(iter(jax.tree_util.tree_leaves(banded)))
    np.testing.assert_array_equal(np.asarray(leaf[0]), np.asarray(leaf[1]))


@pytest.mark.skipif(
    not REAL_DATA,
    reason="set IRW_REAL_DATA=/path/to/VOCdevkit-parent",
)
def test_real_voc_parses_and_evaluates():
    """Real VOC2012 tree → multi-label parse → embed (tiny model) → full
    Hamming retrieval eval on a subset."""
    import jax
    import jax.numpy as jnp

    from irw_tpu.data.registry import get_dataset
    from irw_tpu.models import get_model
    from irw_tpu.ops.metrics import compute_retrieval_metrics
    from irw_tpu.transforms import build_transforms

    query = get_dataset("VOC2012Hashing", mode="query", data_dir=REAL_DATA)
    gallery = get_dataset("VOC2012Hashing", mode="gallery", data_dir=REAL_DATA)
    assert len(query) > 1000 and len(gallery) > 1000  # real VOC12 scale
    assert query.labels.shape[1] == 20

    _, device_t = build_transforms({"SWTTransform": {"level": 1,
                                                     "wavelet": "haar"}})
    model = get_model("multidino_attention_hashing_ortho", backbone="vit_tiny",
                      nbits=16,
                      fusion_config={"type": "cross_attention_advanced",
                                     "output_dim": 64, "num_queries": 4,
                                     "num_heads": 2})
    k = jax.random.PRNGKey(0)

    def embed(ds, n):
        imgs = np.stack([
            np.asarray(ds[i]["image"].convert("RGB").resize((64, 64)), np.uint8)
            for i in range(n)])
        bands = device_t(imgs)
        return bands, ds.labels[:n]

    q_bands, q_labels = embed(query, 32)
    g_bands, g_labels = embed(gallery, 64)
    variables = jax.jit(lambda r, x: model.init(r, x, train=False))(
        {"params": k, "dropout": k, "band_drop": k}, q_bands[:1])
    apply = jax.jit(lambda v, x: model.apply(v, x, train=False)[0])
    q_codes = np.asarray(apply(variables, q_bands))
    g_codes = np.asarray(apply(variables, g_bands))
    res = compute_retrieval_metrics(q_codes, q_labels, g_codes, g_labels,
                                    metric="hamming", k=64)
    assert 0.0 <= float(res["map"]) <= 1.0
