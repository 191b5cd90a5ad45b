"""The single train-state pytree.

Replaces the reference's scattered mutable state: net params + BN stats,
the per-name optimizer dict (run.py:106), loss-internal optimizer states
(hash_loss.py:29-31), loss schedule attributes (quantization_loss.py),
XBM dict/deque (memory.py), the HashNet/DSCH α continuation
(resnet_ce.py:188-192), and the global RNG state the reference snapshotted
and restored around eval (get_set_random_state.py) — here the PRNG key is
just a leaf.
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax.numpy as jnp


@flax.struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_states: Any  # dict: entry name → optax state
    loss_params: Any  # dict: loss idx → trainable loss leaves
    loss_opt_state: Any  # optax state over loss_params
    loss_states: Any  # dict: loss idx → schedule state
    xbm: Any  # XBMState or None
    rng: Any  # PRNGKey
    step: jnp.ndarray  # global batch counter
    epoch: jnp.ndarray
    model_alpha: jnp.ndarray  # continuation α for tanh(α·x) models
