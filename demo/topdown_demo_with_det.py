"""Top-down demo with externally-provided detections.

Counterpart of reference ``demo/topdown_demo_with_mmdet.py``; since the
detector is pluggable here, detections come from a COCO-format bbox json
(``--det-file``, e.g. produced by any detector) or whole-image boxes.

    python demo/topdown_demo_with_det.py INPUT CONFIG CHECKPOINT \
        --det-file dets.json --out-dir vis/
"""


import os.path as _osp
import sys as _sys

_sys.path.insert(0, _osp.dirname(_osp.dirname(_osp.abspath(__file__))))  # repo root

import argparse
import json
import os
from collections import defaultdict

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("input", help="image / folder / video")
    parser.add_argument("config")
    parser.add_argument("checkpoint", nargs="?", default=None)
    parser.add_argument("--det-file", default=None, help="COCO-format detection json")
    parser.add_argument("--bbox-thr", type=float, default=0.3)
    parser.add_argument("--nms-thr", type=float, default=0.3)
    parser.add_argument("--kpt-thr", type=float, default=0.3)
    parser.add_argument("--out-dir", default="vis_results")
    parser.add_argument("--pred-out-dir", default=None)
    args = parser.parse_args()

    from probpose_code_tpu.apis.inferencers import Pose2DInferencer
    from probpose_code_tpu.evaluation.functional.nms import nms as bbox_nms

    bboxes = None
    if args.det_file:
        with open(args.det_file) as f:
            dets = json.load(f)
        by_image = defaultdict(list)
        for d in dets:
            if d.get("category_id", 1) != 1 or d.get("score", 1.0) < args.bbox_thr:
                continue
            x, y, w, h = d["bbox"]
            by_image[str(d["image_id"])].append([x, y, x + w, y + h, d.get("score", 1.0)])
        bboxes = {}
        for img_id, blist in by_image.items():
            arr = np.array(blist, dtype=np.float32)
            keep = bbox_nms(arr, args.nms_thr)
            bboxes[img_id] = arr[keep][:, :4]

    inferencer = Pose2DInferencer(args.config, args.checkpoint)
    outputs = inferencer(
        args.input,
        bboxes=bboxes,
        vis_out_dir=args.out_dir,
        pred_out_dir=args.pred_out_dir,
        kpt_thr=args.kpt_thr,
    )
    print(f"processed {len(outputs)} inputs -> {args.out_dir}")


if __name__ == "__main__":
    main()
