"""Convert 300W-LP face landmarks (.mat) to COCO keypoint format.

Counterpart of reference ``tools/dataset_converters/300wlp2coco.py``.
300W-LP stores 68-point 2D landmarks per image in
``300W_LP/landmarks/<SUBSET>/<image>_pts.mat`` (key ``pts_2d``); image
subsets are AFW / HELEN / IBUG / LFPW. This walks a split image directory
and writes a COCO-style json.

    python tools/dataset_converters/300wlp2coco.py data/300wlp train
"""

import argparse
import json
import os
import os.path as osp
import time

import cv2
import numpy as np


def convert_split(root: str, splits, out_file: str) -> None:
    from scipy.io import loadmat

    images, annotations = [], []
    uid = 0
    lm_root = osp.join(root, "300W_LP", "landmarks")
    for split in splits:
        img_dir = osp.join(root, split)
        for img_name in sorted(os.listdir(img_dir)):
            if not img_name.lower().endswith((".jpg", ".png")):
                continue
            subset = img_name.split("_")[0]
            ann_path = osp.join(lm_root, subset, osp.splitext(img_name)[0] + "_pts.mat")
            if not osp.exists(ann_path):
                continue
            uid += 1
            pts = np.asarray(loadmat(ann_path)["pts_2d"], dtype=np.float32)  # (68, 2)
            img = cv2.imread(osp.join(img_dir, img_name))
            if img is None:
                continue
            x1, y1 = pts.min(axis=0)
            x2, y2 = pts.max(axis=0)
            kpts = np.concatenate([pts, np.full((len(pts), 1), 2, np.float32)], axis=1)
            images.append(dict(
                id=uid, file_name=img_name,
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
        info=dict(description="300W-LP converted to COCO keypoint format",
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
    parser.add_argument("root", help="300W-LP root (contains 300W_LP/ and split image dirs)")
    parser.add_argument("split", choices=["train", "val", "test", "trainval"])
    parser.add_argument("--out-file", default=None)
    args = parser.parse_args()
    splits = ["train", "val"] if args.split == "trainval" else [args.split]
    out = args.out_file or osp.join(args.root, "annotations", f"face_landmarks_300wlp_{args.split}.json")
    convert_split(args.root, splits, out)


if __name__ == "__main__":
    main()
