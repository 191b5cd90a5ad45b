"""Loss zoo (reference: main/losses/, SURVEY §2.5).

Protocol — the reference dispatched on class attributes (``takes_embeddings``
vs score-based, internal ``step()`` optimizers, ``epoch_step()`` schedules;
base_update.py:82-97, 380-390, 410-412).  Here every loss is a pure object:

- ``kind``: one of SCORES (gets the similarity matrix + label matrix),
  EMBEDDINGS (gets embeddings + labels [+ XBM refs]), LOGITS (classifier
  outputs), BRANCHES (list of per-branch outputs);
- ``init_params(rng)``: trainable leaves (proxies, ArcFace weights) — the
  engine folds them into the train state under their own optax optimizer
  (the reference's loss-internal AdamW, hash_loss.py:29-31);
- ``init_state()``: non-trainable schedule state (continuation counters,
  quantization weights) threaded functionally;
- ``__call__(ctx, params, state) -> (loss, new_state)`` — jit-safe;
- ``epoch_update(state)``: the reference's ``epoch_step`` weight schedules.

``build_losses`` turns the list-valued loss config (``[{name, weight,
kwargs}, ...]``, config/loss/*.yaml) into ``[(loss, weight), ...]`` like
``Getter.get_loss`` (main/getter.py:154-161).
"""

from irw_tpu.losses.base import LossBase, LossContext, LossKind
from irw_tpu.losses.rank_ap import (
    AffineAP,
    BlackBoxAP,
    FastAP,
    HeavisideAP,
    SmoothAP,
    SoftBinAP,
    SupAP,
)
from irw_tpu.losses.pairwise import CalibrationLoss, PairLoss
from irw_tpu.losses.classification import ArcFaceLoss, CrossEntropy, MultiCrossEntropyLoss
from irw_tpu.losses.hashing import (
    CSQLoss,
    HashLoss,
    HashNetLoss,
    HHFLoss,
    QuantizationLoss,
    SCHLoss,
)
from irw_tpu.losses.multi import FeatureDistillationLoss, MultiEmbeddingLoss, MultiLoss

LOSS_REGISTRY = {
    "HeavisideAP": HeavisideAP,
    "SmoothAP": SmoothAP,
    "SupAP": SupAP,
    "AffineAP": AffineAP,
    "SoftBinAP": SoftBinAP,
    "BlackBoxAP": BlackBoxAP,
    "FastAP": FastAP,
    "PairLoss": PairLoss,
    "CalibrationLoss": CalibrationLoss,
    "CrossEntropy": CrossEntropy,
    "MultiCrossEntropyLoss": MultiCrossEntropyLoss,
    "ArcFaceLoss": ArcFaceLoss,
    "HashLoss": HashLoss,
    "HashNetAdapter": HashNetLoss,
    "HashNetLoss": HashNetLoss,
    "CSQAdapter": CSQLoss,
    "CSQLoss": CSQLoss,
    "HHFAdapter": HHFLoss,
    "HHFLoss": HHFLoss,
    "SCHLoss": SCHLoss,
    "QuantizationLoss": QuantizationLoss,
    "MultiLoss": MultiLoss,
    "MultiEmbeddingLoss": MultiEmbeddingLoss,
    "FeatureDistillationLoss": FeatureDistillationLoss,
}


def get_loss(name: str, **kwargs):
    try:
        return LOSS_REGISTRY[name](**kwargs)
    except KeyError as exc:
        raise ValueError(f"unknown loss {name!r}; available: {sorted(LOSS_REGISTRY)}") from exc


def build_losses(loss_config):
    """list of {name, weight, kwargs} → [(loss, weight)] (getter.py:154-161).

    ``weight: adaptative`` (the grad-norm re-weighting of
    base_update.py:115-128) maps to weight 1.0 here — the engine detects it
    via :func:`uses_adaptive_weights` and switches the step to the per-loss
    VJP path.
    """
    out = []
    for entry in loss_config:
        name = entry["name"]
        weight = entry.get("weight", 1.0)
        weight = 1.0 if weight == "adaptative" else float(weight)
        kwargs = dict(entry.get("kwargs") or {})
        out.append((get_loss(name, **kwargs), weight))
    return out


def uses_adaptive_weights(loss_config) -> bool:
    return any(entry.get("weight") == "adaptative" for entry in loss_config or [])


__all__ = [
    "LossBase",
    "LossContext",
    "LossKind",
    "LOSS_REGISTRY",
    "get_loss",
    "build_losses",
]
