"""Utility layer (reference: main/utils/__init__.py:1-44).

The reference exports a single logger, RNG snapshot/restore machinery, meters,
label-matrix construction, lr helpers and path/config helpers.  In the JAX
build the RNG snapshot/restore machinery is unnecessary (PRNG keys are
explicit, threaded state), so it is replaced by key-splitting helpers.
"""

from irw_tpu.utils.logger import LOGGER
from irw_tpu.utils.meters import AverageMeter, DictAverage, MovingAverage
from irw_tpu.utils.label_matrix import create_label_matrix
from irw_tpu.utils.freezing import (
    combine,
    freeze_backbone,
    freeze_batch_norm_params,
    freeze_pos_embedding,
)
from irw_tpu.utils.misc import (
    count_parameters,
    enable_compile_cache,
    expand_path,
    format_time,
    override_config,
    str_to_bool,
)

__all__ = [
    "LOGGER",
    "AverageMeter",
    "DictAverage",
    "MovingAverage",
    "create_label_matrix",
    "freeze_pos_embedding",
    "freeze_batch_norm_params",
    "freeze_backbone",
    "combine",
    "count_parameters",
    "enable_compile_cache",
    "expand_path",
    "format_time",
    "override_config",
    "str_to_bool",
]
