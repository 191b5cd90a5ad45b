#!/usr/bin/env python
"""Qualitative retrieval panels (reference: plot_exemples.py).

For one or two checkpointed runs, embeds query+gallery, retrieves top-k on
device (no faiss) and writes a PNG grid: each row = query | top-k results,
green/red border = relevant or not.

    python plot_exemples.py --run experiments/a [--run2 experiments/b]
        --num-queries 6 --topk 5 --out panels.png
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image, ImageOps

import irw_tpu  # noqa: F401
from irw_tpu.config import Config
from irw_tpu.engine.checkpoint import load_checkpoint
from irw_tpu.engine.evaluate import compute_embeddings
from irw_tpu.getter import Getter
from irw_tpu.ops.knn import knn
from irw_tpu.utils import LOGGER, create_label_matrix


def _load(run_dir):
    state, meta = load_checkpoint(run_dir)
    config = Config(meta["config"])
    getter = Getter()
    model = getter.get_model(config.model)
    _, (host_t, device_t) = getter.get_transform(config.get("transform", {}))
    _, eval_datasets = getter.get_dataset(config.dataset)
    datasets = eval_datasets.get("test") or next(iter(eval_datasets.values()))
    variables = {"params": jax.tree_util.tree_map(jnp.asarray, state["params"])}
    if state.get("batch_stats"):
        variables["batch_stats"] = jax.tree_util.tree_map(jnp.asarray, state["batch_stats"])
    return model, variables, datasets, host_t, device_t, config


def retrieval_rows(run_dir, num_queries, topk, thumb=96):
    model, variables, datasets, host_t, device_t, config = _load(run_dir)
    if isinstance(datasets, dict):
        query_ds, gallery_ds = datasets["query"], datasets["gallery"]
        same = False
    else:
        query_ds = gallery_ds = datasets
        same = True

    def apply_eval(v, x):
        return model.apply(v, x, train=False)

    metric = (config.experience.get("evaluation") or {}).get("distance_metric", "cosine")
    q_emb, q_labels = compute_embeddings(apply_eval, variables, query_ds, host_t, device_t)
    g_emb, g_labels = compute_embeddings(apply_eval, variables, gallery_ds, host_t, device_t)
    idx, _ = knn(q_emb, g_emb, k=topk, metric=metric, same_source=same)
    idx = np.asarray(idx)
    rel = np.asarray(create_label_matrix(jnp.asarray(q_labels), jnp.asarray(g_labels)))

    rows = []
    for q in range(min(num_queries, len(query_ds))):
        tiles = [(query_ds.load_image(q).resize((thumb, thumb)), "blue")]
        for g in idx[q]:
            color = "green" if rel[q, g] > 0 else "red"
            tiles.append((gallery_ds.load_image(int(g)).resize((thumb, thumb)), color))
        rows.append(tiles)
    return rows


def render(rows_list, out_path, thumb=96, border=3, gap=8):
    n_rows = sum(len(rows) for rows in rows_list)
    n_cols = max(len(r) for rows in rows_list for r in rows)
    cell = thumb + 2 * border
    H = n_rows * (cell + gap)
    W = n_cols * (cell + gap)
    canvas = Image.new("RGB", (W, H), "white")
    y = 0
    for rows in rows_list:
        for tiles in rows:
            x = 0
            for img, color in tiles:
                bordered = ImageOps.expand(img, border=border, fill=color)
                canvas.paste(bordered, (x, y))
                x += cell + gap
            y += cell + gap
    canvas.save(out_path)
    LOGGER.info(f"wrote {out_path}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--run", required=True)
    parser.add_argument("--run2", default=None)
    parser.add_argument("--num-queries", type=int, default=6)
    parser.add_argument("--topk", type=int, default=5)
    parser.add_argument("--out", default="retrieval_panels.png")
    args = parser.parse_args()

    panels = [retrieval_rows(args.run, args.num_queries, args.topk)]
    if args.run2:
        panels.append(retrieval_rows(args.run2, args.num_queries, args.topk))
    render(panels, args.out)
