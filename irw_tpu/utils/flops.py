"""Analytic FLOPs + MFU accounting for the benchmark harness.

The reference publishes no perf numbers (BASELINE.md), so rounds are
compared on measured throughput *and* model-FLOPs utilisation: analytic
FLOPs for the flagship architecture divided by device peak.  Counts follow
the standard transformer accounting (2·MACs; attention counted as the two
N²·D batched matmuls).
"""

from __future__ import annotations


def vit_flops(num_tokens: int, embed_dim: int, depth: int,
              mlp_ratio: float = 4.0, patch_size: int = 14,
              in_chans: int = 3) -> float:
    """Forward FLOPs for one image through a ViT trunk."""
    n, d = num_tokens, embed_dim
    per_block = (
        2 * n * d * (3 * d)            # qkv projection
        + 2 * n * n * d                # q·kᵀ
        + 2 * n * n * d                # attn·v
        + 2 * n * d * d                # output projection
        + 2 * 2 * n * d * int(mlp_ratio * d)  # mlp fc1+fc2
    )
    patch_embed = 2 * (n - 1) * d * (patch_size * patch_size * in_chans)
    return depth * per_block + patch_embed


def flagship_forward_flops(image_size: int = 224, patch_size: int = 14,
                           embed_dim: int = 384, depth: int = 12,
                           num_bands: int = 4) -> float:
    """Forward FLOPs per image for the flagship MultiDinoHashing: SWT bands
    each through a ViT-S trunk (fusion/hash heads are <1% and ignored)."""
    tokens = (image_size // patch_size) ** 2 + 1
    return num_bands * vit_flops(tokens, embed_dim, depth,
                                 patch_size=patch_size)


def device_peak_flops(device=None) -> tuple[float, str]:
    """(bf16 peak FLOP/s, label) for the attached accelerator."""
    import jax

    device = device or jax.devices()[0]
    kind = getattr(device, "device_kind", str(device)).lower()
    # bf16 dense peaks (per chip)
    table = {
        "v5 lite": (197e12, "tpu-v5e"),
        "v5e": (197e12, "tpu-v5e"),
        "v5p": (459e12, "tpu-v5p"),
        "v4": (275e12, "tpu-v4"),
        "v6": (918e12, "tpu-v6e"),
    }
    for key, entry in table.items():
        if key in kind:
            return entry
    return 197e12, f"assumed-v5e ({kind})"


def mfu(flops_per_item: float, items_per_second: float, device=None) -> float:
    """Model-FLOPs utilisation in [0, 1]."""
    peak, _ = device_peak_flops(device)
    return flops_per_item * items_per_second / peak
