"""irw_tpu — a TPU-native image-retrieval framework with wavelet-subband features.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
`ArseneAmoya/image-retrieval-wavelet` (deep metric learning + deep hashing for
image retrieval with DWT/SWT subband decomposition), built TPU-first:

- wavelet transforms run **on device** inside the jitted step (Pallas lifting
  kernels + jnp reference implementations), not per-sample on CPU loader
  workers (reference: ``main/transforms/custom_transforms.py``);
- retrieval evaluation is a block-tiled, mesh-sharded distance matrix with
  ``lax.top_k`` instead of faiss (reference: ``main/engine/get_knn.py``);
- training is a functional ``pjit`` train step over a ``jax.sharding.Mesh``
  with explicit PRNG threading, optax optimizers (including loss-internal
  proxy optimizers as named optax states), and an on-device XBM ring buffer
  (reference: ``main/engine/base_update.py``, ``main/engine/memory.py``);
- checkpoints are Orbax trees carrying params/opt-state/PRNG/config
  (reference: ``main/engine/chepoint.py``).
"""

__version__ = "0.1.0"

from irw_tpu.utils import LOGGER  # noqa: F401
