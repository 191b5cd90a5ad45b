"""TPU-native ops: wavelet transforms, pairwise distances, k-NN, retrieval
metrics.  The compute-heavy pieces the reference delegated to pywt / faiss /
torch (SURVEY §2.9) live here as jnp + Pallas implementations."""

from irw_tpu.ops import wavelets  # noqa: F401
from irw_tpu.ops.distances import pairwise_distance  # noqa: F401
from irw_tpu.ops.knn import knn  # noqa: F401
