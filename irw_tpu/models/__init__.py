"""Model zoo (flax.linen), TPU-first re-design of main/models/ (SURVEY §2.4).

Design differences from the reference (intentional, documented per class):

- NHWC layouts and branch axes folded into the batch for the convolutions —
  multi-branch networks run as ONE big batched conv per stage instead of 4
  sequential module calls (better MXU utilisation);
- the fusion heads return their orthogonality regulariser as an explicit
  auxiliary output instead of stashing it in module state
  (``last_ortho_loss`` side channel, multi_dino_attention.py:728-753);
- in-model wavelet transforms call :mod:`irw_tpu.ops.wavelets` on device;
- train/eval routing (logits vs sign codes, per-branch lists vs fused
  embeddings) is driven by an explicit ``train`` argument.

Every model returns ``(output, aux)`` where ``aux`` is a dict carrying
``ortho_loss`` and whatever introspection tensors the instrumentation hooks
want (attention weights, gate alphas).
"""

from irw_tpu.models.registry import MODEL_REGISTRY, get_model, register_model
from irw_tpu.models import layers, attention_blocks  # noqa: F401
from irw_tpu.models.resnet import ResNet, resnet18, resnet50, resnet101
from irw_tpu.models.vit import VisionTransformer, vit_small, vit_base
from irw_tpu.models.fusion import get_fusion_head
from irw_tpu.models.retrieval_net import RetrievalNet
from irw_tpu.models import multi_dino, wresnet, mtwavenet, hashing_nets, baselines  # noqa: F401

__all__ = [
    "MODEL_REGISTRY",
    "get_model",
    "register_model",
    "ResNet",
    "resnet18",
    "resnet50",
    "resnet101",
    "VisionTransformer",
    "vit_small",
    "vit_base",
    "get_fusion_head",
    "RetrievalNet",
]
