"""Convert MacaquePose (annotations.csv) to COCO keypoint format.

Counterpart of reference ``tools/dataset_converters/parse_macaquepose_dataset.py``:
the csv rows hold (image name, keypoints-json, segmentation-json) per image
with possibly several monkeys; bboxes come from the segmentation extent and
areas from the polygon shoelace formula. The last 20 images go to the test
split (reference split rule).

    python tools/dataset_converters/parse_macaquepose_dataset.py data/macaque
"""

import argparse
import csv
import json
import os
import os.path as osp
import time

import cv2
import numpy as np

KPT_NUM = 17


def poly_area(seg: np.ndarray) -> float:
    x, y = seg[:, 0], seg[:, 1]
    return float(0.5 * np.abs(np.dot(x, np.roll(y, 1)) - np.dot(y, np.roll(x, 1))))


def save_split(rows, img_root, out_path, start_img_id=0, start_ann_id=0):
    images, annotations = [], []
    img_id, ann_id = start_img_id, start_ann_id
    for image_name, kp_string, seg_string in rows:
        img = cv2.imread(osp.join(img_root, image_name))
        if img is None:
            continue
        for kp, seg in zip(json.loads(kp_string), json.loads(seg_string)):
            keypoints = np.zeros((KPT_NUM, 3))
            for ind, p in enumerate(kp[:KPT_NUM]):
                if p.get("position") is not None:
                    keypoints[ind, :2] = p["position"]
                    keypoints[ind, 2] = 2
            segs = [np.array(s["segment"]) for s in seg if len(s.get("segment", []))]
            if not segs:
                continue
            allpts = np.concatenate(segs)
            min_x, min_y = allpts.min(0)
            max_x, max_y = allpts.max(0)
            annotations.append(dict(
                id=ann_id, image_id=img_id, category_id=1, iscrowd=0,
                keypoints=keypoints.reshape(-1).tolist(),
                num_keypoints=int((keypoints[:, 2] > 0).sum()),
                bbox=[float(min_x), float(min_y), float(max_x - min_x + 1), float(max_y - min_y + 1)],
                area=sum(poly_area(s) for s in segs),
                segmentation=[s.reshape(-1).tolist() for s in segs],
            ))
            ann_id += 1
        images.append(dict(id=img_id, file_name=image_name, height=int(img.shape[0]), width=int(img.shape[1])))
        img_id += 1

    coco = dict(
        info=dict(description="MacaquePose converted to COCO keypoint format",
                  version="1.0", year=time.strftime("%Y")),
        images=images,
        annotations=annotations,
        categories=[dict(supercategory="animal", id=1, name="macaque")],
    )
    with open(out_path, "w") as f:
        json.dump(coco, f)
    print(f"wrote {len(images)} images / {len(annotations)} annotations to {out_path}")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("dataset_dir", help="MacaquePose root (annotations.csv + images/)")
    parser.add_argument("--test-count", type=int, default=20, help="trailing images held out for test")
    args = parser.parse_args()

    with open(osp.join(args.dataset_dir, "annotations.csv")) as f:
        rows = [r[:3] for r in csv.reader(f)][1:]  # drop header

    img_root = osp.join(args.dataset_dir, "images")
    ann_root = osp.join(args.dataset_dir, "annotations")
    os.makedirs(ann_root, exist_ok=True)
    n_test = args.test_count
    save_split(rows[:-n_test] if n_test else rows, img_root, osp.join(ann_root, "macaque_train.json"))
    if n_test:
        save_split(rows[-n_test:], img_root, osp.join(ann_root, "macaque_test.json"),
                   start_img_id=len(rows) - n_test, start_ann_id=100000)


if __name__ == "__main__":
    main()
