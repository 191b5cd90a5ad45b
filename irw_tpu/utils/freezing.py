"""Freezing helpers (reference: main/utils/freeze_batch_norm.py:4-8,
freeze_pos_embedding.py:1-6).

The reference monkey-patched ``module.train`` / set ``requires_grad=False``
at runtime.  In the functional build freezing is declarative:

- batch-norm freezing is the models' ``frozen_bn`` flag (BN uses running
  stats and its affine params can be masked via ``frozen_collections``);
- parameter freezing is a ``frozen_collections`` tuple of param-path
  substrings consumed by ``build_optimizers`` (optax ``set_to_zero`` group,
  no moments allocated) and by the train step's gradient zeroing.

These helpers produce those tuples for the common cases.
"""

from __future__ import annotations


def freeze_pos_embedding() -> tuple:
    """Freeze ViT positional embeddings + CLS token (the reference's
    freeze_pos_embedding)."""
    return ("pos_embed", "cls_token")


def freeze_batch_norm_params() -> tuple:
    """Freeze every BatchNorm scale/bias (Boudiaf-protocol freeze; combine
    with the models' ``frozen_bn=True`` to also pin the running stats)."""
    return ("BatchNorm",)


def freeze_backbone(model) -> tuple:
    """The model's own frozen collections (frozen backbones)."""
    return tuple(getattr(model, "frozen_param_collections", ()) or ())


def combine(*freeze_sets) -> tuple:
    out: list = []
    for fs in freeze_sets:
        for item in fs:
            if item not in out:
                out.append(item)
    return tuple(out)
