"""Converted-checkpoint loading and grafting.

The reference loads pretrained towers at construction time via torch.hub
(net.py:222-273) / timm / HF.  Here the conversion is a one-time offline
step (tools/convert_torch_weights.py → msgpack tree) and loading is an
explicit param-tree graft — pure functions over pytrees, no module-state
mutation.

Typical flow (documented in MIGRATING.md):

    python tools/convert_torch_weights.py --kind dinov2_vits14 --scan \
        --src dinov2_vits14_pretrain.pth --dst dinov2_vits14.msgpack
    params = graft_flagship_backbone(params, load_converted("....msgpack"))
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def load_converted(path: str) -> dict:
    """Read a tools/convert_torch_weights.py msgpack artifact → param tree."""
    from flax.serialization import msgpack_restore

    with open(path, "rb") as f:
        tree = msgpack_restore(f.read())
    return tree.get("params", tree)


def broadcast_to_bands(vit_params: dict, num_bands: int = 4) -> dict:
    """Tile a single converted ViT tower across the vmapped band axis.

    BandedViT (models/multi_dino.py) holds independent per-band parameters
    with a leading band axis on every leaf; the reference initialises all
    four branches from the SAME pretrained tower (deep-copied hub modules,
    multi_dino_attention.py:395-404), which this reproduces.
    """
    return jax.tree_util.tree_map(
        lambda p: jnp.broadcast_to(p[None], (num_bands,) + p.shape).copy(),
        vit_params,
    )


def _check_compatible(dst, src, where: str):
    d_leaves = jax.tree_util.tree_structure(dst)
    s_leaves = jax.tree_util.tree_structure(src)
    if d_leaves != s_leaves:
        raise ValueError(
            f"converted tree does not match the model's {where} structure:\n"
            f"model:     {d_leaves}\nconverted: {s_leaves}")
    for d, s in zip(jax.tree_util.tree_leaves(dst),
                    jax.tree_util.tree_leaves(src)):
        if d.shape != s.shape:
            raise ValueError(
                f"shape mismatch grafting {where}: model {d.shape} vs "
                f"converted {s.shape}")


def graft_flagship_backbone(params: dict, vit_params: dict,
                            num_bands: int = 4) -> dict:
    """Replace the flagship's 4 band towers with a converted ViT.

    ``vit_params``: a single tower in the scanned layout (convert with
    ``--scan``).  Returns a new params tree; all non-backbone parts
    (fusion head, hash head) are untouched.
    """
    banded = broadcast_to_bands(vit_params, num_bands)
    out = dict(params)
    bv = dict(out["BandedViT_0"])
    _check_compatible(bv["VmapVisionTransformer_0"], banded, "BandedViT tower")
    bv["VmapVisionTransformer_0"] = banded
    out["BandedViT_0"] = bv
    return out


def graft_single_vit(params: dict, vit_params: dict) -> dict:
    """Replace a single-tower model's ViT (DINOHashBaseline / SingleBandNet)."""
    out = dict(params)
    _check_compatible(out["VisionTransformer_0"], vit_params, "ViT tower")
    out["VisionTransformer_0"] = vit_params
    return out
