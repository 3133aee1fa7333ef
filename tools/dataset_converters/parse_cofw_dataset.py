"""Convert the COFW face dataset (.mat, HDF5 layout) to COCO keypoint format.

Counterpart of reference ``tools/dataset_converters/parse_cofw_dataset.py``:
reads ``COFW_{train,test}_color.mat`` (images + 29-point phis + bboxes),
dumps images as numbered jpgs and writes ``cofw_{train,test}.json``.
COFW visibility convention: phis stores 1 = occluded, 0 = visible, which
becomes COCO v = 2 - flag; matlab 1-indexing shifts to 0-based pixels.

    python tools/dataset_converters/parse_cofw_dataset.py data/cofw
"""

import argparse
import json
import os
import os.path as osp
import time

import cv2
import numpy as np


def convert(dataset_dir: str) -> None:
    import h5py

    image_root = osp.join(dataset_dir, "images")
    ann_root = osp.join(dataset_dir, "annotations")
    os.makedirs(image_root, exist_ok=True)
    os.makedirs(ann_root, exist_ok=True)

    uid = 0
    for mat_name, keys, json_name in (
        ("COFW_train_color.mat", ("IsTr", "phisTr", "bboxesTr"), "cofw_train.json"),
        ("COFW_test_color.mat", ("IsT", "phisT", "bboxesT"), "cofw_test.json"),
    ):
        path = osp.join(dataset_dir, mat_name)
        if not osp.exists(path):
            print(f"skipping {mat_name} (not found)")
            continue
        mat = h5py.File(path, "r")
        imgs, pts, bboxes = (mat[k] for k in keys)

        images, annotations = [], []
        for idx in range(pts.shape[1]):
            uid += 1
            img = np.array(mat[imgs[0, idx]]).transpose()
            kpts = pts[:, idx].reshape(3, -1).transpose().astype(np.float64)
            kpts[:, 2] = 2 - kpts[:, 2]  # occlusion flag -> COCO visibility
            kpts[:, :2] -= 1  # matlab 1-index -> 0-index
            np.clip(kpts, 0, None, out=kpts)
            bbox = np.clip(np.asarray(bboxes[:, idx], np.float64), 0, None)

            file_name = f"{uid:06d}.jpg"
            cv2.imwrite(osp.join(image_root, file_name), cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
            images.append(dict(id=uid, file_name=file_name, height=int(img.shape[0]), width=int(img.shape[1])))
            annotations.append(dict(
                id=uid, image_id=uid, category_id=1, iscrowd=0,
                keypoints=kpts.reshape(-1).tolist(),
                num_keypoints=len(kpts),
                bbox=bbox.tolist(),
                area=float(bbox[2] * bbox[3]),
            ))

        coco = dict(
            info=dict(description="COFW converted to COCO keypoint format",
                      version="1.0", year=time.strftime("%Y")),
            images=images,
            annotations=annotations,
            categories=[dict(supercategory="person", id=1, name="face")],
        )
        out = osp.join(ann_root, json_name)
        with open(out, "w") as f:
            json.dump(coco, f)
        print(f"wrote {len(images)} images to {out}")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("dataset_dir", help="COFW root containing the .mat files")
    args = parser.parse_args()
    convert(args.dataset_dir)


if __name__ == "__main__":
    main()
