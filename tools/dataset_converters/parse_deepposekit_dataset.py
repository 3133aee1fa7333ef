"""Convert DeepPoseKit datasets (fly / locust / zebra) to COCO keypoint format.

Counterpart of reference ``tools/dataset_converters/parse_deepposekit_dataset.py``:
each dataset ships one HDF5 (``annotation_data_release.h5``) holding images,
keypoint annotations, per-keypoint annotated flags, and the skeleton parent
array; images are dumped as numbered jpgs and a shuffled 90/10 train/test
split is written.

    python tools/dataset_converters/parse_deepposekit_dataset.py data/DeepPoseKit-Data [--datasets fly locust zebra]
"""

import argparse
import json
import os
import os.path as osp
import time

import cv2
import numpy as np

KEYPOINTS = {
    "fly": [
        "head", "eyeL", "eyeR", "neck", "thorax", "abdomen",
        "forelegR1", "forelegR2", "forelegR3", "forelegR4",
        "midlegR1", "midlegR2", "midlegR3", "midlegR4",
        "hindlegR1", "hindlegR2", "hindlegR3", "hindlegR4",
        "forelegL1", "forelegL2", "forelegL3", "forelegL4",
        "midlegL1", "midlegL2", "midlegL3", "midlegL4",
        "hindlegL1", "hindlegL2", "hindlegL3", "hindlegL4",
        "wingL", "wingR",
    ],
    "locust": [
        "head", "neck", "thorax", "abdomen1", "abdomen2",
        "anttipL", "antbaseL", "eyeL",
        "forelegL1", "forelegL2", "forelegL3", "forelegL4",
        "midlegL1", "midlegL2", "midlegL3", "midlegL4",
        "hindlegL1", "hindlegL2", "hindlegL3", "hindlegL4",
        "anttipR", "antbaseR", "eyeR",
        "forelegR1", "forelegR2", "forelegR3", "forelegR4",
        "midlegR1", "midlegR2", "midlegR3", "midlegR4",
        "hindlegR1", "hindlegR2", "hindlegR3", "hindlegR4",
    ],
    "zebra": [
        "snout", "head", "neck", "forelegL1", "forelegR1",
        "hindlegL1", "hindlegR1", "tailbase", "tailtip",
    ],
}


def save_split(keypoints_all, annotated_all, imgs_all, names, skeleton_info,
               img_root, save_path, start_id=0):
    images, annotations = [], []
    uid = start_id
    for kpts2d, annotated, img in zip(keypoints_all, annotated_all, imgs_all):
        keypoints = np.concatenate([kpts2d, annotated[:, None] * 2], axis=1)
        valid = keypoints[:, 2] > 0
        if not valid.any():
            continue
        min_x, min_y = keypoints[valid, :2].min(0)
        max_x, max_y = keypoints[valid, :2].max(0)
        file_name = f"{uid}.jpg"
        cv2.imwrite(osp.join(img_root, file_name), img)
        images.append(dict(id=uid, file_name=file_name, height=int(img.shape[0]), width=int(img.shape[1])))
        annotations.append(dict(
            id=uid, image_id=uid, category_id=1, iscrowd=0,
            keypoints=keypoints.reshape(-1).tolist(),
            num_keypoints=int(valid.sum()),
            bbox=[float(min_x), float(min_y), float(max_x - min_x + 1), float(max_y - min_y + 1)],
            area=float((max_x - min_x + 1) * (max_y - min_y + 1)),
        ))
        uid += 1

    # skeleton: (child, parent) pairs, 1-indexed, dropping roots (parent -1)
    kpt_num = keypoints_all.shape[1]
    skeleton = np.concatenate(
        [np.arange(kpt_num)[:, None], np.asarray(skeleton_info)[:, 0][:, None]], axis=1
    ) + 1
    skeleton = skeleton[skeleton.min(axis=1) > 0]

    coco = dict(
        info=dict(description="DeepPoseKit converted to COCO keypoint format",
                  version="1.0", year=time.strftime("%Y")),
        images=images,
        annotations=annotations,
        categories=[dict(supercategory="animal", id=1, name="animal",
                         keypoints=names, skeleton=skeleton.tolist())],
    )
    os.makedirs(osp.dirname(osp.abspath(save_path)), exist_ok=True)
    with open(save_path, "w") as f:
        json.dump(coco, f)
    print(f"wrote {len(images)} images to {save_path}")


def convert_dataset(dataset_dir: str, dataset: str, seed: int = 0):
    import h5py

    with h5py.File(osp.join(dataset_dir, "annotation_data_release.h5"), "r") as f:
        annotations = np.array(f["annotations"])
        annotated = np.array(f["annotated"])
        images = np.array(f["images"])
        skeleton_info = np.array(f["skeleton"])

    n = annotations.shape[0]
    order = np.arange(n)
    np.random.RandomState(seed).shuffle(order)
    n_val = n // 10
    train_idx, val_idx = order[: n - n_val], order[n - n_val:]

    img_root = osp.join(dataset_dir, "images")
    os.makedirs(img_root, exist_ok=True)
    names = KEYPOINTS[dataset]
    save_split(annotations[train_idx], annotated[train_idx], images[train_idx], names,
               skeleton_info, img_root, osp.join(dataset_dir, "annotations", f"{dataset}_train.json"))
    save_split(annotations[val_idx], annotated[val_idx], images[val_idx], names,
               skeleton_info, img_root, osp.join(dataset_dir, "annotations", f"{dataset}_test.json"),
               start_id=len(train_idx))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("data_root", help="DeepPoseKit-Data root (contains datasets/<name>)")
    parser.add_argument("--datasets", nargs="+", default=["fly", "locust", "zebra"],
                        choices=list(KEYPOINTS))
    args = parser.parse_args()
    for name in args.datasets:
        convert_dataset(osp.join(args.data_root, "datasets", name), name)


if __name__ == "__main__":
    main()
