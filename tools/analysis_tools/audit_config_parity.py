#!/usr/bin/env python
"""Audit config-content parity against the reference model zoo.

The zoo keeps filename parity with the reference
(``configs/**`` vs reference ``configs/**``); this tool checks that the
*content* behind each matching filename agrees on the fields that change
training/eval behavior:

- runtime: per-GPU train batch size, auto_scale_lr base_batch_size,
  max_epochs
- optimizer: type, lr
- codec: type, input/heatmap sizes, sigma, simcc_split_ratio
- pipelines: the transform-type sequence of train/val/stage2 pipelines
- eval: score_mode / nms_mode / use_area, checkpoint save_best key
- protocol: presence of custom_hooks and train_pipeline_stage2

Known deliberate deviations (TPU-native design) are suppressed:
PackOneStageInputs packing for RTMO/YOLOX one-stage recipes.

Usage:
    python tools/analysis_tools/audit_config_parity.py \
        [--reference /root/reference] [--configs configs] [-v]

Exit code 1 when drift is found (suitable for CI).
"""

from __future__ import annotations

import argparse
import pathlib
import re
import sys

ALBU_OPS = {
    "Blur", "MedianBlur", "CoarseDropout", "GaussianBlur", "GaussNoise",
    "RandomBrightnessContrast", "HueSaturationValue", "GridDropout",
}

SCOPED_CHECKS = [
    # (anchor, regex, label)
    ("train_dataloader", r"batch_size=(\d+)", "train_batch"),
    ("auto_scale_lr", r"base_batch_size=(\d+)", "base_batch"),
    ("train_cfg", r"max_epochs=(\d+)", "max_epochs"),
    ("optim_wrapper", r'optimizer=dict\(\s*type="(\w+)"', "optimizer_type"),
    ("optim_wrapper", r"lr=([\d.e-]+)", "lr"),
    ("codec = dict", r'type="(\w+)"', "codec_type"),
    ("codec = dict", r"input_size=\((\d+,\s*\d+)\)", "input_size"),
    ("codec = dict", r"heatmap_size=\((\d+,\s*\d+)\)", "heatmap_size"),
    ("codec = dict", r"sigma=\(?([\d.,\s-]+?)\)?[,)]", "sigma"),
    ("codec = dict", r"simcc_split_ratio=([\d.]+)", "split_ratio"),
    ("val_evaluator", r'score_mode="(\w+)"', "score_mode"),
    ("val_evaluator", r'nms_mode="(\w+)"', "nms_mode"),
    ("val_evaluator", r"use_area=(\w+)", "use_area"),
    ("default_hooks", r'save_best="([\w/\- @.]+)"', "save_best"),
    ("test_cfg=dict", r"flip_test=(\w+)", "flip_test"),
    ("test_cfg=dict", r"nms_dist_thr=([\d.]+)", "nms_dist_thr"),
    ("test_cfg=dict", r"shift_heatmap=(\w+)", "shift_heatmap"),
    ("test_cfg=dict", r"score_thr=([\d.]+)", "score_thr"),
    ("test_cfg=dict", r"nms_thr=([\d.]+)", "nms_thr"),
    ("head=dict", r"rescore_cfg=dict\(\s*in_channels=(\d+)", "rescore_in_channels"),
]


def scoped(src: str, anchor: str, pat: str, window: int = 700):
    i = src.find(anchor)
    if i < 0:
        return None
    m = re.search(pat, src[i:i + window])
    return m.group(1).replace(" ", "") if m else None


def pipeline_types(src: str, name: str):
    i = src.find(f"{name} = [")
    if i < 0:
        return None
    j = src.index("[", i)
    depth, k = 0, j
    while k < len(src):
        if src[k] == "[":
            depth += 1
        elif src[k] == "]":
            depth -= 1
            if depth == 0:
                break
        k += 1
    types = re.findall(r'dict\(\s*(?:#[^\n]*\n\s*)?type=["\']([\w.]+)', src[j:k])
    return [t.split(".")[-1] for t in types if t.split(".")[-1] not in ALBU_OPS]


def values_equal(a: str, b: str) -> bool:
    # numeric values compare numerically FIRST — the dotted-name rule below
    # must never see numbers ('2.5' vs '1.5' share the tail '5')
    try:
        return abs(float(a) - float(b)) < 1e-12
    except ValueError:
        pass
    # scoped type names: 'mmdet.PackDetInputs' == 'PackDetInputs'
    return a.split(".")[-1] == b.split(".")[-1]


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--reference", default="/root/reference")
    ap.add_argument("--configs", default="configs")
    ap.add_argument("-v", "--verbose", action="store_true")
    args = ap.parse_args()

    ref_root = pathlib.Path(args.reference) / "configs"
    refs = {p.name: p for p in ref_root.rglob("*.py")}
    ours = {}
    for p in pathlib.Path(args.configs).rglob("*.py"):
        ours.setdefault(p.name, p)

    drift = []
    checked = 0
    for name, op in sorted(ours.items()):
        rp = refs.get(name)
        if rp is None:
            continue
        checked += 1
        rs, osrc = rp.read_text(), op.read_text()
        for anchor, pat, label in SCOPED_CHECKS:
            rv, ov = scoped(rs, anchor, pat), scoped(osrc, anchor, pat)
            if rv and ov and not values_equal(rv, ov):
                drift.append((name, label, rv, ov))
        for pl in ("train_pipeline", "val_pipeline", "train_pipeline_stage2"):
            rt, ot = pipeline_types(rs, pl), pipeline_types(osrc, pl)
            if rt and ot and rt != ot and "PackOneStageInputs" not in ot:
                drift.append((name, pl, "->".join(rt), "->".join(ot)))
        for marker in ("custom_hooks", "train_pipeline_stage2"):
            if marker in rs and marker not in osrc and "_base_" not in osrc[:400]:
                drift.append((name, f"missing:{marker}", "present", "absent"))

    if args.verbose or drift:
        for name, label, rv, ov in drift:
            print(f"{name}  {label}\n    ref : {rv}\n    ours: {ov}")
    print(f"checked {checked} same-named recipes; {len(drift)} drifted fields")
    return 1 if drift else 0


if __name__ == "__main__":
    sys.exit(main())
