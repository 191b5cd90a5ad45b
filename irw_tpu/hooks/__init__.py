"""Instrumentation (reference: main/model_hooks/ + main/engine/train_new.py).

The reference registered forward/backward hooks on ViT blocks and fusion
heads, snapshotted a fixed batch, and at target epochs replayed it, dumping
features and gradients to ``analysis_epoch_{e}_batch_{i}.pt``
(mbw_dino_hooks.py:94-110).  In JAX the same capability is explicit:

- :func:`capture_features` — flax ``capture_intermediates`` forward capture;
- :func:`capture_gradients` — gradients of the loss w.r.t. the captured
  intermediates via ``jax.grad`` over a perturbation-injected forward;
- :class:`FixedBatchInstrumentor` — the train_new protocol: keep one fixed
  batch, dump capture files at target epochs.
"""

from irw_tpu.hooks.instrumentation import (
    FixedBatchInstrumentor,
    capture_features,
    capture_gradients,
)

__all__ = ["capture_features", "capture_gradients", "FixedBatchInstrumentor"]
