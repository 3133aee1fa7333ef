"""Visualize dataset samples after the pipeline (augmentation preview).

Counterpart of reference ``tools/misc/browse_dataset.py``.

Usage: python tools/misc/browse_dataset.py CONFIG --out-dir vis --max 20 [--phase train]
"""


import os.path as _osp
import sys as _sys

_sys.path.insert(0, _osp.dirname(_osp.dirname(_osp.dirname(_osp.abspath(__file__)))))  # repo root

import argparse
import os

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("config")
    parser.add_argument("--out-dir", default="browse")
    parser.add_argument("--max", type=int, default=20)
    parser.add_argument("--phase", default="train", choices=["train", "val"])
    args = parser.parse_args()

    import cv2

    from probpose_code_tpu.config import Config
    from probpose_code_tpu.registry import DATASETS
    from probpose_code_tpu.visualization import PoseLocalVisualizer

    cfg = Config.fromfile(args.config)
    loader_cfg = cfg.get(f"{args.phase}_dataloader")
    dataset = DATASETS.build(loader_cfg["dataset"])

    vis = PoseLocalVisualizer()
    vis.set_dataset_meta(dataset.metainfo)
    os.makedirs(args.out_dir, exist_ok=True)

    n = min(args.max, len(dataset))
    for i in range(n):
        sample = dataset[i]
        if sample is None:
            continue
        img = np.asarray(sample["inputs"]).astype(np.uint8)
        ds = sample["data_samples"]
        gt = ds.gt_instances
        kpts = np.asarray(gt.get("transformed_keypoints", gt.get("keypoints")))
        drawn = vis.draw_instances(img, kpts, np.asarray(gt.get("keypoints_visible")))
        cv2.imwrite(os.path.join(args.out_dir, f"sample_{i:04d}.jpg"), drawn)
    print(f"wrote {n} samples to {args.out_dir}")


if __name__ == "__main__":
    main()
