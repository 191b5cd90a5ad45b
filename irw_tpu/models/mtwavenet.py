"""Stage-interleaved multi-branch ResNets with cross-band attention.

Reference: main/models/mtwavenet.py:157-520 — FourBranchResNet (resnet18),
FourBranchResNet50 (+ per-branch LayerNorm, avg/max pool, frozen-BN
protocol), FourBranchResNet50Fusion (+ ChannelGate1D weighted-sum fusion +
main classifier), HybridMultiBranch(V2) (ResNet50 on LL + a second trunk on
details).

TPU re-design: branches are a vmapped ResNet executed stage-by-stage; after
every stage the (B, S, H, W, C) stack passes through CrossBandAttention
(mtwavenet.py:214-248's forward order).  Frozen BN is a flag, not a
``train()`` override.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from irw_tpu.models.attention_blocks import ChannelGate1D, CrossBandAttention
from irw_tpu.models.layers import global_pool, l2_normalize
from irw_tpu.models.resnet import BasicBlock, Bottleneck


class _BandedStagedResNet(nn.Module):
    """Per-band-parameter ResNet trunk that applies a CrossBandAttention
    block after the stem+stage boundaries.  (B, S, H, W, C) → (B, S, D)."""

    stage_sizes: tuple
    block_name: str
    width: int = 64
    layernorm: bool = False
    pool: str = "avg"
    frozen_bn: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        block_cls = Bottleneck if self.block_name == "bottleneck" else BasicBlock
        use_ra = (not train) or self.frozen_bn

        # stem (per-band params)
        class Stem(nn.Module):
            width: int
            dtype: jnp.dtype

            @nn.compact
            def __call__(self, y):
                y = nn.Conv(self.width, (7, 7), strides=(2, 2), padding=3, use_bias=False, dtype=self.dtype)(y)
                y = nn.BatchNorm(use_running_average=use_ra, momentum=0.9, dtype=self.dtype)(y)
                y = nn.relu(y)
                return nn.max_pool(y, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        vm_stem = nn.vmap(
            Stem,
            in_axes=1,
            out_axes=1,
            variable_axes={"params": 0, "batch_stats": 0, "intermediates": 0},
            split_rngs={"params": True},
        )
        x = vm_stem(width=self.width, dtype=self.dtype)(x)  # train via use_ra closure

        class Stage(nn.Module):
            filters: int
            num_blocks: int
            first_stride: int
            dtype: jnp.dtype

            @nn.compact
            def __call__(self, y, train_flag: bool = False, frozen: bool = False):
                for b_idx in range(self.num_blocks):
                    stride = self.first_stride if b_idx == 0 else 1
                    y = block_cls(filters=self.filters, stride=stride, dtype=self.dtype)(
                        y, train=train_flag, frozen_bn=frozen
                    )
                return y

        for stage_idx, num_blocks in enumerate(self.stage_sizes):
            vm_stage = nn.vmap(
                Stage,
                in_axes=(1, None, None),
                out_axes=1,
                variable_axes={"params": 0, "batch_stats": 0, "intermediates": 0},
                split_rngs={"params": True},
            )
            # NB: lifted vmap drops kwargs — flags ride positionally
            x = vm_stage(
                filters=self.width * 2**stage_idx,
                num_blocks=num_blocks,
                first_stride=1 if stage_idx == 0 else 2,
                dtype=self.dtype,
            )(x, train, self.frozen_bn)
            x, _ = CrossBandAttention(dtype=self.dtype, name=f"att_block{stage_idx + 1}")(x)

        emb = global_pool(x.reshape((-1,) + x.shape[2:]), self.pool)
        emb = emb.reshape(x.shape[0], x.shape[1], -1)  # (B, S, D)
        if self.layernorm:
            emb = nn.LayerNorm(name="branch_ln")(emb)
        return emb


class FourBranchResNet(nn.Module):
    """mtwavenet.py:157-285: resnet18 branches; train → per-branch
    (dropout+zero-init classifier) logits, eval → L2-normalised concat."""

    num_classes: int | None = None
    depth: int = 18  # 18 or 50
    layernorm: bool = False
    pool: str = "avg"
    frozen_bn: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        sizes, block = ((2, 2, 2, 2), "basic") if self.depth == 18 else ((3, 4, 6, 3), "bottleneck")
        emb = _BandedStagedResNet(
            stage_sizes=sizes,
            block_name=block,
            layernorm=self.layernorm,
            pool=self.pool,
            frozen_bn=self.frozen_bn,
            dtype=self.dtype,
        )(x, train=train)
        aux = {"ortho_loss": jnp.float32(0.0)}
        if train and self.num_classes is not None:
            emb_d = nn.Dropout(0.5, deterministic=not train)(emb)
            logits = nn.DenseGeneral(
                self.num_classes,
                axis=-1,
                kernel_init=nn.initializers.zeros,
                bias_init=nn.initializers.zeros,
            )(emb_d)
            return [logits[:, i] for i in range(logits.shape[1])], aux
        flat = l2_normalize(emb.reshape(emb.shape[0], -1))
        return flat, aux


def FourBranchResNet50(**kw) -> FourBranchResNet:
    """mtwavenet.py:287-365: the resnet50 variant with per-branch LayerNorm
    and avg/max pooling options."""
    kw.setdefault("depth", 50)
    kw.setdefault("layernorm", True)
    return FourBranchResNet(**kw)


class FourBranchResNet50Fusion(nn.Module):
    """mtwavenet.py:367-417: + ChannelGate1D weighted-sum fusion and a main
    classifier; train returns [4 branch logits..., fused logits]."""

    num_classes: int = 100
    pool: str = "avg"
    frozen_bn: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        emb = _BandedStagedResNet(
            stage_sizes=(3, 4, 6, 3),
            block_name="bottleneck",
            layernorm=True,
            pool=self.pool,
            frozen_bn=self.frozen_bn,
            dtype=self.dtype,
        )(x, train=train)
        fused, alphas = ChannelGate1D(num_subbands=emb.shape[1])(emb)
        aux = {"ortho_loss": jnp.float32(0.0), "gate": alphas}
        if train:
            emb_d = nn.Dropout(0.5, deterministic=not train)(emb)
            branch_logits = nn.DenseGeneral(
                self.num_classes, axis=-1, kernel_init=nn.initializers.zeros
            )(emb_d)
            fused_logits = nn.Dense(self.num_classes, kernel_init=nn.initializers.zeros)(fused)
            return (
                [branch_logits[:, i] for i in range(branch_logits.shape[1])] + [fused_logits],
                aux,
            )
        return l2_normalize(fused), aux


class HybridMultiBranch(nn.Module):
    """mtwavenet.py:420-520: ResNet-50 on the LL band + DenseNet-121
    branches on the three detail bands (vmapped, per-band params);
    normalised concat output."""

    num_classes: int | None = None
    frozen_bn: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        from irw_tpu.models.densenet import DenseNet
        from irw_tpu.models.resnet import ResNet

        ll_feats = ResNet(stage_sizes=(3, 4, 6, 3), block=Bottleneck, dtype=self.dtype)(
            x[:, 0], train=train, frozen_bn=self.frozen_bn
        )
        detail_trunk = nn.vmap(
            DenseNet,
            in_axes=(1, None, None),
            out_axes=1,
            variable_axes={"params": 0, "batch_stats": 0, "intermediates": 0},
            split_rngs={"params": True},
        )(dtype=self.dtype)
        detail_feats = detail_trunk(x[:, 1:], train, self.frozen_bn)
        emb = jnp.concatenate(
            [ll_feats, detail_feats.reshape(detail_feats.shape[0], -1)], axis=-1
        )
        aux = {"ortho_loss": jnp.float32(0.0)}
        if train and self.num_classes is not None:
            return nn.Dense(self.num_classes, kernel_init=nn.initializers.zeros)(emb), aux
        return l2_normalize(emb), aux


HybridMultiBranchV2 = HybridMultiBranch
