"""Engine: functional train/eval runtime (reference: main/engine/, SURVEY §2.3).

- :mod:`train_state` — the one pytree holding params, batch stats, all
  named optimizer states, loss params/states, XBM buffers, PRNG key and
  counters (replaces the reference's scattered mutable state + RNG
  snapshot machinery);
- :mod:`optimizers` — config-driven optax builders incl. per-module LRs,
  bias kwargs, warmcos/sequential schedules (getter.py:37-152);
- :mod:`xbm` — on-device cross-batch-memory ring buffer (memory.py);
- :mod:`train_step` — the jitted update (base_update.py), with
  remat+scan micro-batching standing in for GradCache;
- :mod:`evaluate` — device-resident embedding extraction + metric suite
  (evaluate.py + accuracy_calculator.py);
- :mod:`train` — the epoch loop (train.py);
- :mod:`checkpoint` — Orbax save/restore with config embedded
  (chepoint.py);
- :mod:`splits` — k-fold cross-validation splits
  (cross_validation_splits.py);
- :mod:`batch_map` — training-time proxy mAP + fast-eval subsets
  (batch_map.py);
- :mod:`landmark` — revisited Oxford/Paris protocol
  (landmark_evaluation.py).
"""

from irw_tpu.engine.train_state import TrainState
from irw_tpu.engine.xbm import XBM
from irw_tpu.engine.train_step import build_train_step
from irw_tpu.engine.evaluate import compute_embeddings, evaluate
from irw_tpu.engine.train import train
from irw_tpu.engine.checkpoint import load_checkpoint, save_checkpoint
from irw_tpu.engine.splits import get_splits
from irw_tpu.engine.batch_map import build_fast_eval_subset

__all__ = [
    "TrainState",
    "XBM",
    "build_train_step",
    "compute_embeddings",
    "evaluate",
    "train",
    "save_checkpoint",
    "load_checkpoint",
    "get_splits",
    "build_fast_eval_subset",
]
