#!/usr/bin/env python
"""CBAM/ECA gate-alpha inspection CLI (reference: alpha_weights.py:25-51).

Averages the subband gate values over a dataset for models exposing
``aux['gate']`` (WCNNAttention, WaveResNet+attention, mtwavenet50_fusion,
cbam/eca fusion heads).

    python alpha_weights.py --run experiments/myrun [--set test] [--bs 64]
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

import irw_tpu  # noqa: F401
from irw_tpu.config import Config
from irw_tpu.data.loader import EpochLoader
from irw_tpu.engine.checkpoint import load_checkpoint
from irw_tpu.getter import Getter
from irw_tpu.utils import LOGGER


def generate_alphas(run_dir: str, eval_set: str = "test", batch_size: int = 64):
    state, meta = load_checkpoint(run_dir)
    config = Config(meta["config"])
    getter = Getter()
    model = getter.get_model(config.model)
    _, (host_t, device_t) = getter.get_transform(config.get("transform", {}))
    _, eval_datasets = getter.get_dataset(config.dataset)
    dataset = eval_datasets.get(eval_set) or next(iter(eval_datasets.values()))
    if isinstance(dataset, dict):
        dataset = dataset["gallery"]

    variables = {"params": jax.tree_util.tree_map(jnp.asarray, state["params"])}
    if state.get("batch_stats"):
        variables["batch_stats"] = jax.tree_util.tree_map(jnp.asarray, state["batch_stats"])

    order = np.arange(len(dataset))
    batches = [order[i : i + batch_size] for i in range(0, len(order), batch_size)]
    loader = EpochLoader(dataset, batches, host_t, num_workers=4, train=False)

    @jax.jit
    def forward(v, x):
        out, aux = model.apply(v, x, train=False)
        return aux

    totals, count = None, 0
    for batch in loader:
        x = device_t(batch["image"]) if device_t else jnp.asarray(batch["image"], jnp.float32) / 255
        aux = forward(variables, x)
        gate = aux.get("gate")
        if gate is None:
            raise SystemExit("model exposes no gate alphas (aux['gate'] missing)")
        gate = np.asarray(gate)
        totals = gate.sum(0) if totals is None else totals + gate.sum(0)
        count += gate.shape[0]
    mean = totals / count
    LOGGER.info(f"mean gate alphas over {count} samples: {np.round(mean, 4).tolist()}")
    return mean


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--run", required=True)
    parser.add_argument("--set", default="test")
    parser.add_argument("--bs", type=int, default=64)
    args = parser.parse_args()
    generate_alphas(args.run, args.set, args.bs)
