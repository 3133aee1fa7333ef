"""Extract dataset metainfo constants from the reference config tree.

The reference ships 55 dataset metainfo files (keypoint names / colors /
symmetry / skeletons / OKS sigmas / joint weights) as data-only Python
configs. This tool executes each one and serializes the factual constants to
JSON under ``probpose_code_tpu/datasets/metainfo/data/`` — data provenance,
not code: the framework loads these tables at runtime via
``parse_pose_metainfo``.

Usage: python tools/extract_metainfo.py
"""


import os.path as _osp
import sys as _sys

_sys.path.insert(0, _osp.dirname(_osp.dirname(_osp.abspath(__file__))))  # repo root

import json
import os
import os.path as osp

REF = os.environ.get("REFERENCE_ROOT", "/root/reference")
SRC = osp.join(REF, "configs/_base_/datasets")
OUT = osp.join(osp.dirname(osp.abspath(__file__)), "..", "probpose_code_tpu/datasets/metainfo/data")
os.makedirs(OUT, exist_ok=True)


def extract(path: str) -> dict:
    namespace: dict = {}
    with open(path) as f:
        exec(compile(f.read(), path, "exec"), namespace)
    info = namespace["dataset_info"]

    def clean(obj):
        if isinstance(obj, dict):
            return {str(k): clean(v) for k, v in obj.items()}
        if isinstance(obj, (list, tuple)):
            return [clean(v) for v in obj]
        return obj

    info = clean(info)
    info.pop("paper_info", None)  # citation text is not needed at runtime
    return info


count = 0
for fname in sorted(os.listdir(SRC)):
    if not fname.endswith(".py"):
        continue
    name = fname[:-3]
    try:
        info = extract(osp.join(SRC, fname))
    except Exception as e:  # noqa: BLE001
        print(f"skip {name}: {e}")
        continue
    with open(osp.join(OUT, f"{name}.json"), "w") as f:
        json.dump(info, f)
    count += 1

print(f"extracted {count} metainfo tables -> {OUT}")
