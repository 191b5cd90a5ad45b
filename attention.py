#!/usr/bin/env python
"""Fusion-head attention-weight inspection CLI (reference: attention.py:8-57).

The reference hooked nn.MultiheadAttention inside the fusion head to capture
weights; here the heads return them as ``aux['attn_weights']``
(B, num_queries, S) — this CLI averages them per subband over a dataset.

    python attention.py --run experiments/myrun [--set test]
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

BAND_NAMES = ["LL", "LH", "HL", "HH"]


def mean_attention(run_dir: str, eval_set: str = "test", batch_size: int = 64):
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
        _, aux = model.apply(v, x, train=False)
        return aux

    totals, count = None, 0
    for batch in loader:
        x = device_t(batch["image"]) if device_t else jnp.asarray(batch["image"], jnp.float32) / 255
        aux = forward(variables, x)
        weights = aux.get("attn_weights")
        if weights is None:
            raise SystemExit("model exposes no attention weights (aux['attn_weights'])")
        weights = np.asarray(weights)  # (B, Q, S)
        totals = weights.sum(0) if totals is None else totals + weights.sum(0)
        count += weights.shape[0]
    mean = totals / count  # (Q, S)
    per_band = mean.mean(0)
    LOGGER.info("mean attention per subband:")
    for name, value in zip(BAND_NAMES, per_band):
        LOGGER.info(f"  {name}: {value:.4f}")
    return mean


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--run", required=True)
    parser.add_argument("--set", default="test")
    parser.add_argument("--bs", type=int, default=64)
    args = parser.parse_args()
    mean_attention(args.run, args.set, args.bs)
