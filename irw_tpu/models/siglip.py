"""SigLIP vision tower in flax — the architecture behind the reference's
``siglip2`` backbone (config/model/siglip2.yaml: google/siglip2-base-
patch16-224; loaded via AutoModel in hugging_face_models.py:6-24 and pooled
through ``vision_model``'s second output).

The fixed-resolution SigLIP-2 checkpoints ship in the original SigLIP
vision architecture — patch conv (no CLS token), learned position
embeddings, pre-LN encoder with tanh-GELU MLPs, a final ``post_layernorm``
and a **multihead-attention pooling head** (a learned probe query attends
over the patch tokens).  transformers has no Flax SigLIP, so this module
implements it natively; parameter names are chosen so the torch
``SiglipVisionModel`` state dict maps over by pure transpose/split
(tools/convert_torch_weights.convert_siglip), and forward parity against
the real torch implementation is asserted in
tests/test_converter_numeric.py.

TPU notes: everything is matmul-shaped (MXU); the probe attention is a
1-query cross-attention — negligible next to the encoder.  The encoder
loop is a Python unroll (depth 12 at most here); serving-scale SigLIP
deployments should go through the jax.export path where XLA caches the
compiled module.
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp


def _tanh_gelu(x):
    # torch ACT2FN["gelu_pytorch_tanh"] — the SigLIP default hidden_act
    return nn.gelu(x, approximate=True)


# torch transformers ACT2FN names we can reproduce exactly; a checkpoint
# config with any other hidden_act must fail loudly rather than silently
# diverge from the converted torch model (--config-json passes it through)
_ACTIVATIONS = {
    "gelu_pytorch_tanh": _tanh_gelu,
    "gelu": lambda x: nn.gelu(x, approximate=False),
    "quick_gelu": lambda x: x * nn.sigmoid(1.702 * x),
    "relu": nn.relu,
}


def _resolve_act(name: str):
    try:
        return _ACTIVATIONS[name]
    except KeyError:
        raise ValueError(
            f"unsupported hidden_act {name!r}; supported: "
            f"{sorted(_ACTIVATIONS)}") from None


class SiglipAttentionBlock(nn.Module):
    """One pre-LN encoder layer (modeling_siglip.SiglipEncoderLayer):
    x += attn(ln1(x)); x += mlp(ln2(x)); softmax scale = head_dim^-0.5."""

    num_heads: int
    intermediate_size: int
    layer_norm_eps: float = 1e-6
    hidden_act: str = "gelu_pytorch_tanh"

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        hd = d // self.num_heads
        h = nn.LayerNorm(epsilon=self.layer_norm_eps, name="layer_norm1")(x)
        q = nn.Dense(d, name="q_proj")(h)
        k = nn.Dense(d, name="k_proj")(h)
        v = nn.Dense(d, name="v_proj")(h)
        b, n, _ = h.shape
        split = lambda t: t.reshape(b, n, self.num_heads, hd)  # noqa: E731
        scores = jnp.einsum("bqhd,bkhd->bhqk", split(q) / math.sqrt(hd), split(k))
        ctx = jnp.einsum("bhqk,bkhd->bqhd", jax.nn.softmax(scores, -1), split(v))
        x = x + nn.Dense(d, name="out_proj")(ctx.reshape(b, n, d))
        h = nn.LayerNorm(epsilon=self.layer_norm_eps, name="layer_norm2")(x)
        h = nn.Dense(self.intermediate_size, name="fc1")(h)
        h = nn.Dense(d, name="fc2")(_resolve_act(self.hidden_act)(h))
        return x + h


class SiglipPoolingHead(nn.Module):
    """modeling_siglip.SiglipMultiheadAttentionPoolingHead: a learned
    (1, 1, D) probe cross-attends over the tokens (torch
    nn.MultiheadAttention semantics: per-head softmax at head_dim^-0.5,
    in_proj split into q/k/v), then a residual MLP; returns token 0."""

    num_heads: int
    intermediate_size: int
    layer_norm_eps: float = 1e-6
    hidden_act: str = "gelu_pytorch_tanh"

    @nn.compact
    def __call__(self, tokens):
        b, n, d = tokens.shape
        hd = d // self.num_heads
        probe = self.param("probe", nn.initializers.normal(1.0), (1, 1, d))
        q = nn.Dense(d, name="q_proj")(jnp.broadcast_to(probe, (b, 1, d)))
        k = nn.Dense(d, name="k_proj")(tokens)
        v = nn.Dense(d, name="v_proj")(tokens)
        qh = q.reshape(b, 1, self.num_heads, hd)
        kh = k.reshape(b, n, self.num_heads, hd)
        vh = v.reshape(b, n, self.num_heads, hd)
        scores = jnp.einsum("bqhd,bkhd->bhqk", qh / math.sqrt(hd), kh)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", jax.nn.softmax(scores, -1), vh)
        attn_out = nn.Dense(d, name="out_proj")(ctx.reshape(b, 1, d))
        h = nn.LayerNorm(epsilon=self.layer_norm_eps, name="layernorm")(attn_out)
        h = nn.Dense(self.intermediate_size, name="fc1")(h)
        h = nn.Dense(d, name="fc2")(_resolve_act(self.hidden_act)(h))
        return (attn_out + h)[:, 0]


class SiglipVisionTower(nn.Module):
    """Patch conv → +pos embed → encoder → post-LN → attention-pool.

    Returns ``(pooled, last_hidden_state)`` — pooled is what the reference
    wrapper consumes (``cls_emb``, hugging_face_models.py:20-21)."""

    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    patch_size: int = 16
    image_size: int = 224
    intermediate_size: int = 3072
    layer_norm_eps: float = 1e-6
    hidden_act: str = "gelu_pytorch_tanh"

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = self.patch_size
        h = nn.Conv(self.hidden_size, (p, p), strides=(p, p), padding="VALID",
                    name="patch_embedding")(x)
        b, gh, gw, d = h.shape
        h = h.reshape(b, gh * gw, d)
        num_pos = (self.image_size // p) ** 2
        pos = self.param("position_embedding",
                         nn.initializers.normal(1.0 / math.sqrt(d)),
                         (num_pos, d))
        if gh * gw != num_pos:
            # torch interpolate_pos_encoding equivalent (bilinear; the
            # torch side is bicubic — conversion-time use is same-res)
            side = int(math.sqrt(num_pos))
            grid = pos.reshape(side, side, d)
            grid = jax.image.resize(grid, (gh, gw, d), "bilinear")
            pos = grid.reshape(gh * gw, d)
        h = h + pos[None]
        for i in range(self.num_layers):
            h = SiglipAttentionBlock(
                self.num_heads, self.intermediate_size,
                self.layer_norm_eps, self.hidden_act, name=f"layers_{i}")(h)
        h = nn.LayerNorm(epsilon=self.layer_norm_eps, name="post_layernorm")(h)
        pooled = SiglipPoolingHead(
            self.num_heads, self.intermediate_size, self.layer_norm_eps,
            self.hidden_act, name="head")(h)
        return pooled, h
