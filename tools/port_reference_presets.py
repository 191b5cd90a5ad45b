"""Port the reference's config presets into configs/ under their reference
names, so reference override strings (``model=resnet``, ``loss=supap``,
``transform=voc_swt``, ...) resolve unchanged.

What this does per file (reference: /root/reference/config/<group>/*.yaml):

- resolves leftover git conflict markers by keeping the HEAD side (the
  reference tree ships several unmerged files);
- drops hydra ``# @package _group_`` headers and the original comments;
- normalises machine-specific ``data_dir``/``weights`` paths to
  ``data/<name>`` placeholders (every study plan overrides them anyway);
- ensures dataset presets carry a top-level ``num_classes`` (several model
  and loss presets interpolate ``${dataset.num_classes}``);
- substitutes the reference's dangling ``${training.steps_per_epoch}``
  interpolation (no ``training`` group exists in its tree either) with a
  literal.

The kwargs dialect is consumed verbatim by irw_tpu/models/factory.py and the
getter, so values are preserved as-is.  Re-runnable: overwrites the ported
files, leaves repo-only presets untouched.
"""

from __future__ import annotations

import os
import re

import yaml

REF = "/root/reference/config"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "configs")

CONFLICT_RE = re.compile(r"<<<<<<< HEAD\n(.*?)=======\n.*?>>>>>>> [^\n]*\n", re.S)

# datasets missing a top-level num_classes in the reference (needed by
# ${dataset.num_classes} interpolations)
NUM_CLASSES = {
    "voc": 20, "coco": 80, "mflickr": 38, "imagenet100": 100,
    "inaturalist": 5690, "inshop": 7982, "sfm120k": 713,
}

# groups ported 1:1 under the reference file names
GROUPS = ("model", "transform", "optimizer", "loss", "dataset", "memory")

# repo-only presets that must not be clobbered even on a name collision
KEEP_OURS: set = set()


def load_ref(path: str):
    txt = open(path).read()
    txt = CONFLICT_RE.sub(r"\1", txt)
    txt = txt.replace("${training.steps_per_epoch}", "100")
    return yaml.safe_load(txt)


def normalize_paths(node, dataset_name: str | None = None):
    if isinstance(node, dict):
        out = {}
        for k, v in node.items():
            if k == "data_dir" and isinstance(v, str):
                out[k] = f"data/{dataset_name or 'dataset'}"
            elif k == "weights" and isinstance(v, str) and ("/" in v or "\\" in v):
                out[k] = None  # hub weight files: use the offline converter
            elif k in ("pretrained_ckpt_path", "pretrained_paths") and v:
                out[k] = None if k == "pretrained_ckpt_path" else {
                    kk: None for kk in v
                }
            else:
                out[k] = normalize_paths(v, dataset_name)
        return out
    if isinstance(node, list):
        return [normalize_paths(v, dataset_name) for v in node]
    return node


def port_group(group: str) -> list[str]:
    src_dir = os.path.join(REF, group)
    dst_dir = os.path.join(OUT, group)
    os.makedirs(dst_dir, exist_ok=True)
    written = []
    for fname in sorted(os.listdir(src_dir)):
        if not fname.endswith(".yaml") or f"{group}/{fname}" in KEEP_OURS:
            continue
        stem = fname[:-5]
        data = load_ref(os.path.join(src_dir, fname))
        data = normalize_paths(data, dataset_name=stem)
        if group == "dataset" and isinstance(data, dict):
            base = stem.split("_")[0]
            if "num_classes" not in data and base in NUM_CLASSES:
                data["num_classes"] = NUM_CLASSES[base]
        header = (
            f"# ported from reference config/{group}/{fname} "
            "(values preserved; see tools/port_reference_presets.py)\n"
        )
        body = yaml.safe_dump(data, sort_keys=False, default_flow_style=None,
                              allow_unicode=True)
        with open(os.path.join(dst_dir, fname), "w") as f:
            f.write(header + body)
        written.append(f"{group}/{fname}")
    return written


def main():
    total = []
    for group in GROUPS:
        total += port_group(group)
    print(f"wrote {len(total)} presets")
    for item in total:
        print(" ", item)


if __name__ == "__main__":
    main()
