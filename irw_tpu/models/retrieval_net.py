"""RetrievalNet: backbone + pooling + standardize + projection + L2-norm.

Reference: main/models/net.py:417-489.  The reference's routing quirks
(classifier/multi-branch/hash backbones bypass the head, net.py:476-481)
are preserved by only wrapping *embedding* backbones with this class — the
registry wires multi-branch and hashing models directly.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from irw_tpu.models.layers import ProjectionHead, global_pool, l2_normalize


class RetrievalNet(nn.Module):
    """Wraps a feature backbone into an L2-normalised embedder."""

    backbone: nn.Module
    embed_dim: int = 512
    pooling: str = "default"  # default/avg | max | none (net.py:450-457)
    standardize: bool = False  # LayerNorm before projection (net.py:460-464)
    projection_norm: str | None = None
    without_fc: bool = False
    frozen_backbone: bool = False  # reference 'frozen' kwarg: mask backbone params
    dtype: jnp.dtype = jnp.float32

    @property
    def frozen_param_collections(self):
        return ("backbone",) if self.frozen_backbone else ()

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = self.backbone(x, train=train and not self.frozen_backbone)
        feats, aux = out if isinstance(out, tuple) else (out, {})
        if self.frozen_backbone:
            import jax

            feats = jax.lax.stop_gradient(feats)
        if feats.ndim == 4:  # spatial map → pool
            feats = global_pool(feats, self.pooling)
        if self.standardize:
            feats = nn.LayerNorm()(feats)
        if not self.without_fc:
            # scope named 'fc' so reference optimizer presets with
            # ``params: fc`` group targeting resolve (optimizer/sop.yaml etc.)
            feats = ProjectionHead(
                (self.embed_dim,), norm=self.projection_norm, name="fc"
            )(feats, train=train)
        return l2_normalize(feats), aux
