"""Convert LaPa face-landmark annotations to COCO keypoint format.

Counterpart of reference ``tools/dataset_converters/lapa2coco.py``. LaPa
ships per-image landmark text files (first line = count, then "x y" lines,
106 points); this walks ``<root>/<split>/landmarks/*.txt``, derives the
tight keypoint bbox, and writes one COCO-style json per split.

    python tools/dataset_converters/lapa2coco.py data/LaPa train
    python tools/dataset_converters/lapa2coco.py data/LaPa trainval  # merge
"""

import argparse
import json
import os
import os.path as osp
import time

import cv2
import numpy as np


def _read_landmarks(path: str) -> np.ndarray:
    with open(path) as f:
        lines = f.read().strip().splitlines()
    n = int(lines[0])
    pts = np.array([[float(v) for v in ln.split()] for ln in lines[1 : n + 1]], dtype=np.float32)
    return pts


def convert_split(root: str, splits, out_file: str) -> None:
    images, annotations = [], []
    uid = 0
    for split in splits:
        lm_dir = osp.join(root, split, "landmarks")
        img_dir = osp.join(root, split, "images")
        for ann_name in sorted(os.listdir(lm_dir)):
            if not ann_name.endswith(".txt"):
                continue
            uid += 1
            pts = _read_landmarks(osp.join(lm_dir, ann_name))
            file_name = ann_name[:-4] + ".jpg"
            img = cv2.imread(osp.join(img_dir, file_name))
            if img is None:
                continue
            x1, y1 = pts.min(axis=0)
            x2, y2 = pts.max(axis=0)
            kpts = np.concatenate([pts, np.full((len(pts), 1), 2, np.float32)], axis=1)
            images.append(dict(
                id=uid, file_name=f"{split}/images/{file_name}",
                height=int(img.shape[0]), width=int(img.shape[1]),
            ))
            annotations.append(dict(
                id=uid, image_id=uid, category_id=1, iscrowd=0,
                keypoints=kpts.reshape(-1).tolist(),
                num_keypoints=len(pts),
                bbox=[float(x1), float(y1), float(x2 - x1), float(y2 - y1)],
                area=float((x2 - x1) * (y2 - y1)),
            ))

    coco = dict(
        info=dict(description="LaPa converted to COCO keypoint format",
                  version=1.0, year=int(time.strftime("%Y"))),
        images=images,
        annotations=annotations,
        categories=[dict(supercategory="person", id=1, name="face")],
    )
    os.makedirs(osp.dirname(osp.abspath(out_file)), exist_ok=True)
    with open(out_file, "w") as f:
        json.dump(coco, f)
    print(f"wrote {len(images)} images / {len(annotations)} annotations to {out_file}")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("root", help="LaPa dataset root (contains train/val/test)")
    parser.add_argument("split", choices=["train", "val", "test", "trainval"])
    parser.add_argument("--out-file", default=None)
    args = parser.parse_args()
    splits = ["train", "val"] if args.split == "trainval" else [args.split]
    out = args.out_file or osp.join(args.root, "annotations", f"lapa_{args.split}.json")
    convert_split(args.root, splits, out)


if __name__ == "__main__":
    main()
