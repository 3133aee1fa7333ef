#!/usr/bin/env python
"""Pseudo-label COCO keypoint annotations from GT boxes with a pose model.

Behavioral parity target: reference
``tools/misc/keypoints2coco_without_mmdet.py:1-115`` — run a top-down pose
model over each image's annotated person boxes and write a COCO-format
json with the predicted keypoints (score >= ``--kpt-thr`` marked visible
v=2, the rest zeroed), e.g. to bootstrap training a detector or a larger
pose model without running mmdet.
"""

from __future__ import annotations

import json
import os
from argparse import ArgumentParser

import cv2
import numpy as np

from probpose_code_tpu.apis import inference_topdown, init_model
from probpose_code_tpu.datasets import COCO


def main():
    parser = ArgumentParser(description=__doc__)
    parser.add_argument("pose_config", help="pose config file")
    parser.add_argument("pose_checkpoint", help="checkpoint file")
    parser.add_argument("--img-root", type=str, default="", help="image root")
    parser.add_argument("--json-file", type=str, default="",
                        help="COCO json containing the person bboxes")
    parser.add_argument("--out-json-file", type=str, default="",
                        help="output json with pseudo-labeled keypoints")
    parser.add_argument("--device", default="tpu", help="accepted for parity; JAX picks the backend")
    parser.add_argument("--kpt-thr", type=float, default=0.3, help="keypoint score threshold")
    args = parser.parse_args()

    coco = COCO(args.json_file)
    ckpt = None if args.pose_checkpoint in ("none", "None", "") else args.pose_checkpoint
    model = init_model(args.pose_config, ckpt)

    out = {"images": [], "annotations": [], "categories": [{"id": 1, "name": "person"}]}
    ann_uniq_id = 0
    img_ids = coco.getImgIds()
    for n, image_id in enumerate(img_ids):
        image = coco.loadImgs(image_id)[0]
        image_path = os.path.join(args.img_root, image["file_name"])
        img = cv2.imread(image_path)
        if img is None:
            print(f"skip unreadable {image_path}")
            continue
        height, width = img.shape[:2]

        anns = coco.loadAnns(coco.getAnnIds(imgIds=[image_id]))
        if anns:
            # xywh -> xyxy for inference_topdown
            bboxes = np.array([[a["bbox"][0], a["bbox"][1],
                                a["bbox"][0] + a["bbox"][2], a["bbox"][1] + a["bbox"][3]]
                               for a in anns], np.float32)
            results = inference_topdown(model, img, bboxes=bboxes)
            for sample, bbox_xyxy in zip(results, bboxes):
                pred = sample.pred_instances
                kpts = np.asarray(pred["keypoints"]).reshape(-1, 2)
                scores = np.asarray(pred["keypoint_scores"]).reshape(-1)
                packed = np.concatenate([kpts, scores[:, None]], axis=1)
                packed[scores < args.kpt_thr] = 0
                packed[scores >= args.kpt_thr, 2] = 2
                x, y = int(bbox_xyxy[0]), int(bbox_xyxy[1])
                w, h = int(bbox_xyxy[2] - bbox_xyxy[0]), int(bbox_xyxy[3] - bbox_xyxy[1])
                out["annotations"].append({
                    "keypoints": [int(v) for v in packed.reshape(-1).tolist()],
                    "num_keypoints": len(packed),
                    "area": round(float(w * h), 0),
                    "iscrowd": 0,
                    "image_id": int(image_id),
                    "bbox": [x, y, w, h],
                    "category_id": 1,
                    "id": ann_uniq_id,
                })
                ann_uniq_id += 1

        out["images"].append({"file_name": image["file_name"].split("/")[-1],
                              "height": height, "width": width, "id": int(image_id)})
        if (n + 1) % 50 == 0:
            print(f"{n + 1}/{len(img_ids)} images")

    with open(args.out_json_file, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {ann_uniq_id} pseudo annotations to {args.out_json_file}")


if __name__ == "__main__":
    main()
