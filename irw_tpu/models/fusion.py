"""Fusion-head zoo: learned-query cross-attention over subband embeddings.

Reference: multi_dino_attention.py:155-390 and :700-841.  Every head takes
the per-band embedding stack (B, S, D_in) and returns ``(fused, aux)`` where
``aux['ortho_loss']`` is the orthogonality regulariser (explicit output —
the reference smuggled it through ``self.last_ortho_loss`` module state and
the engine fished it back out, base_update.py:130-137) and
``aux['attn_weights']``/``aux['gate']`` feed the introspection CLIs.

Heads (reference line refs):
- standard (:178), temperature (:203), semantic (:226 LL-as-query),
  gated (:244), temperature_gated (:263), self_attention (:292 residual-q),
- cross_attention_bottleneck (:700): N learned query tokens, subband-LL
  dropout, attention-matrix ortho loss ‖M Mᵀ − I‖²_F,
- cross_attention_advanced (:763): hinge-margin Gram ortho loss on the
  query tokens themselves,
- cbam/eca (:155): gate-weighted mean + (BN-ReLU-dropout) FCN.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from irw_tpu.models.attention_blocks import SubbandCBAM, SubbandEca
from irw_tpu.models.layers import Mlp, l2_normalize, trunc_normal_init


def _project_bands(x, embed_dim, dtype):
    """Per-band linear projection to embed_dim (identity if already there).
    x: (B, S, D_in) → (B, S, E).  Uses one Dense per band like the
    reference's per-branch projections."""
    if x.shape[-1] == embed_dim:
        return x
    bands = [
        nn.Dense(embed_dim, dtype=dtype, name=f"proj_{i}")(x[:, i])
        for i in range(x.shape[1])
    ]
    return jnp.stack(bands, axis=1)


class _AttnCore(nn.Module):
    """Shared cross-attention core: q tokens attend over band tokens,
    returning (attn_out, attn_weights)."""

    num_heads: int
    dropout: float
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, q, kv, train: bool = False):
        attn_fn = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads,
            dropout_rate=self.dropout,
            deterministic=not train,
            dtype=self.dtype,
        )
        # weights for introspection/ortho: softmax(q kᵀ/√d) averaged over heads
        out = attn_fn(q, kv)
        d = q.shape[-1]
        logits = jnp.einsum("bqd,bkd->bqk", q, kv) / jnp.sqrt(d).astype(q.dtype)
        weights = nn.softmax(logits, axis=-1)
        return out, weights


class StandardFusionHead(nn.Module):
    input_dim: int
    embed_dim: int = 384
    num_heads: int = 8
    dropout: float = 0.1
    residual_query: bool = False  # True = AttentionFusionHead (:328)
    temperature: float | None = None  # set = TemperatureFusionHead (:220)

    @nn.compact
    def __call__(self, bands, train: bool = False):
        b = bands.shape[0]
        kv = _project_bands(bands, self.embed_dim, jnp.float32)
        q = self.param("query_token", trunc_normal_init, (1, 1, self.embed_dim))
        q = jnp.broadcast_to(q, (b, 1, self.embed_dim))
        if self.temperature is not None:
            q = q / self.temperature
        attn_out, weights = _AttnCore(self.num_heads, self.dropout)(q, kv, train)
        x = nn.LayerNorm(name="norm1")(q + attn_out if self.residual_query else attn_out)
        x = x + Mlp(self.embed_dim * 4, self.embed_dim, self.dropout)(x, train=train)
        x = nn.LayerNorm(name="norm2")(x)
        return x[:, 0], {"ortho_loss": jnp.float32(0.0), "attn_weights": weights}


class SemanticFusionHead(nn.Module):
    """LL band embedding is the query (:226)."""

    input_dim: int
    embed_dim: int = 512
    num_heads: int = 4
    dropout: float = 0.1

    @nn.compact
    def __call__(self, bands, train: bool = False):
        kv = _project_bands(bands, self.embed_dim, jnp.float32)
        q = kv[:, :1]
        attn_out, weights = _AttnCore(self.num_heads, self.dropout)(q, kv, train)
        x = nn.LayerNorm(name="norm1")(attn_out)
        x = x + Mlp(self.embed_dim * 4, self.embed_dim, self.dropout)(x, train=train)
        x = nn.LayerNorm(name="norm2")(x)
        return x[:, 0], {"ortho_loss": jnp.float32(0.0), "attn_weights": weights}


class GatedFusionHead(nn.Module):
    """Per-band sigmoid gates, weighted sum (:244); ``temperature`` set →
    TemperatureGatedFusionHead (:263)."""

    input_dim: int
    embed_dim: int = 512
    dropout: float = 0.1
    temperature: float | None = None

    @nn.compact
    def __call__(self, bands, train: bool = False):
        feats = _project_bands(bands, self.embed_dim, jnp.float32)
        gate_net = nn.Sequential(
            [nn.Dense(self.embed_dim // 2), nn.relu, nn.Dense(1)]
        )
        raw = gate_net(feats)  # (B, S, 1)
        if self.temperature is not None:
            raw = raw / self.temperature
        gates = nn.sigmoid(raw)
        fused = (feats * gates).sum(axis=1)
        x = nn.LayerNorm(name="norm1")(fused)
        x = x + Mlp(self.embed_dim * 4, self.embed_dim, self.dropout)(x, train=train)
        x = nn.LayerNorm(name="norm2")(x)
        return x, {"ortho_loss": jnp.float32(0.0), "gate": gates[..., 0]}


class CrossAttentionBottleneckHead(nn.Module):
    """N learned query tokens + subband-LL dropout + attention-matrix
    orthogonality loss (:700-761); ``advanced=True`` switches to the
    hinge-margin Gram loss on the query tokens (:763-840)."""

    input_dim: int
    embed_dim: int = 384
    num_queries: int = 4
    num_heads: int = 8
    dropout: float = 0.1
    sub_band_dropout_p: float = 0.3
    ortho_weight: float = 0.1
    margin: float = 0.0
    advanced: bool = False

    @nn.compact
    def __call__(self, bands, train: bool = False):
        b = bands.shape[0]
        kv = _project_bands(bands, self.embed_dim, jnp.float32)

        mask_ll = jnp.float32(0.0)
        if train and self.sub_band_dropout_p > 0:
            rng = self.make_rng("band_drop")
            mask_ll = (
                jax.random.uniform(rng, ()) < self.sub_band_dropout_p
            ).astype(jnp.float32)
            ll = kv[:, :1] * (1.0 - mask_ll)
            kv = jnp.concatenate([ll, kv[:, 1:]], axis=1)

        q = self.param(
            "query_tokens", trunc_normal_init, (1, self.num_queries, self.embed_dim)
        )
        qb = jnp.broadcast_to(q, (b, self.num_queries, self.embed_dim))
        attn_out, weights = _AttnCore(self.num_heads, self.dropout)(qb, kv, train)

        if self.advanced:
            # hinge-margin Gram ortho on the query tokens (:794-808)
            qn = l2_normalize(q[0], axis=-1)
            gram = qn @ qn.T
            eye = jnp.eye(self.num_queries, dtype=gram.dtype)
            raw_err = jnp.linalg.norm(gram - eye)
            raw = jnp.where(train, nn.relu(raw_err - self.margin) ** 2, 0.0)
        else:
            # ‖M Mᵀ − I‖²_F on the batch-mean attention matrix (:748-753);
            # zeroed when the LL band was dropped, like the reference (:748)
            m = weights.mean(axis=0)  # (num_queries, S)
            eye = jnp.eye(self.num_queries, dtype=m.dtype)
            raw = jnp.where(
                train, jnp.sum((m @ m.T - eye) ** 2) * (1.0 - mask_ll), 0.0)
        ortho = self.ortho_weight * raw

        x = nn.LayerNorm(name="norm1")(qb + attn_out)
        x = x + Mlp(self.embed_dim * 4, self.embed_dim, self.dropout)(x, train=train)
        x = x.reshape(b, -1)
        x = nn.Dense(self.embed_dim, name="out_proj")(x)
        x = nn.LayerNorm(name="norm2")(x)
        # ortho_raw: the constraint violation BEFORE ortho_weight (and before
        # any runtime ortho_scale) — λ ablations read dose-response in
        # constraint space from it, comparably across configs
        return x, {"ortho_loss": ortho, "ortho_raw": raw,
                   "attn_weights": weights}


class GateFusionHead(nn.Module):
    """CBAM/ECA gate-weighted mean + FCN (AdvancedFusionModule, :155-175)."""

    input_dim: int
    embed_dim: int = 384
    gate: str = "cbam"
    dropout: float = 0.1

    @nn.compact
    def __call__(self, bands, train: bool = False):
        gate_cls = SubbandCBAM if self.gate == "cbam" else SubbandEca
        fused, alphas = gate_cls(num_subbands=bands.shape[1])(bands)
        x = nn.Dense(self.embed_dim)(fused)
        x = nn.BatchNorm(use_running_average=not train)(x)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return x, {"ortho_loss": jnp.float32(0.0), "gate": alphas}


def get_fusion_head(fusion_config: dict, input_dim: int):
    """Dispatcher mirroring multi_dino_attention.py:335-389 (same config
    keys: type, output_dim, num_heads, dropout, temperature, num_queries,
    sub_band_dropout_p, ortho_weight)."""
    cfg = dict(fusion_config)
    ftype = cfg.get("type", "standard")
    embed_dim = cfg.get("output_dim", 384)
    num_heads = cfg.get("num_heads", 8)
    dropout = cfg.get("dropout", 0.1)
    common = dict(input_dim=input_dim, embed_dim=embed_dim)
    if ftype == "standard":
        return StandardFusionHead(num_heads=num_heads, dropout=dropout, **common)
    if ftype == "temperature":
        return StandardFusionHead(
            num_heads=num_heads,
            dropout=dropout,
            temperature=cfg.get("temperature", 0.1),
            **common,
        )
    if ftype == "self_attention":
        return StandardFusionHead(
            num_heads=num_heads, dropout=dropout, residual_query=True, **common
        )
    if ftype == "semantic":
        return SemanticFusionHead(num_heads=num_heads, dropout=dropout, **common)
    if ftype == "gated":
        return GatedFusionHead(dropout=dropout, **common)
    if ftype == "temperature_gated":
        return GatedFusionHead(
            dropout=dropout, temperature=cfg.get("temperature", 0.1), **common
        )
    if ftype in ("cross_attention_bottleneck", "cross_attention_advanced"):
        return CrossAttentionBottleneckHead(
            num_queries=cfg.get("num_queries", 4),
            num_heads=num_heads,
            dropout=dropout,
            sub_band_dropout_p=cfg.get("sub_band_dropout_p", 0.3),
            ortho_weight=cfg.get("ortho_weight", 0.1),
            margin=cfg.get("margin", 0.0),
            advanced=ftype == "cross_attention_advanced",
            **common,
        )
    if ftype in ("cbam", "eca"):
        return GateFusionHead(gate=ftype, dropout=dropout, **common)
    raise ValueError(f"unknown fusion head type {ftype!r}")
