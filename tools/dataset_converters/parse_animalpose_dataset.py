"""Convert Animal-Pose VOC-style XML annotations to COCO keypoint format.

Counterpart of reference ``tools/dataset_converters/parse_animalpose_dataset.py``
(ElementTree instead of xmltodict). Each XML holds one instance: the image
name, a ``visible_bounds`` bbox, and 20 named keypoints with visibility
flags.

    python tools/dataset_converters/parse_animalpose_dataset.py data/animalpose
"""

import argparse
import json
import os
import os.path as osp
import time
import xml.etree.ElementTree as ET

import cv2
import numpy as np

KEYPOINTS = [
    "L_Eye", "R_Eye", "L_EarBase", "R_EarBase", "Nose", "Throat", "TailBase",
    "Withers", "L_F_Elbow", "R_F_Elbow", "L_B_Elbow", "R_B_Elbow",
    "L_F_Knee", "R_F_Knee", "L_B_Knee", "R_B_Knee",
    "L_F_Paw", "R_F_Paw", "L_B_Paw", "R_B_Paw",
]
NAME2ID = {n: i for i, n in enumerate(KEYPOINTS)}
SKELETON = [
    [1, 2], [1, 3], [2, 4], [1, 5], [2, 5], [5, 6], [6, 8], [7, 8], [6, 9],
    [9, 13], [13, 17], [6, 10], [10, 14], [14, 18], [7, 11], [11, 15],
    [15, 19], [7, 12], [12, 16], [16, 20],
]


def list_xml_files(root_dir):
    out = []
    for dirpath, _, files in os.walk(root_dir):
        out.extend(osp.join(dirpath, f) for f in files if f.lower().endswith(".xml"))
    return sorted(out)


def parse_xml(path):
    root = ET.parse(path).getroot()
    image_name = root.findtext("image")
    vb = root.find("visible_bounds")
    bbox = [float(vb.get("xmin")), float(vb.get("ymin")), float(vb.get("width")), float(vb.get("height"))]
    keypoints = np.zeros((20, 3), np.float32)
    for kp in root.find("keypoints").findall("keypoint"):
        kid = NAME2ID[kp.get("name")]
        if int(kp.get("visible")):
            keypoints[kid] = [float(kp.get("x")), float(kp.get("y")), 2]
    return image_name, bbox, keypoints


def convert(ann_root, img_root, out_file):
    images, annotations = [], []
    img_ids = {}
    ann_id = 1
    for path in list_xml_files(ann_root):
        image_name, bbox, keypoints = parse_xml(path)
        parts = image_name.split("_")
        img_id = int(parts[0] + parts[1]) if len(parts) > 1 and parts[0].isdigit() else abs(hash(image_name)) % 10**8
        if img_id not in img_ids:
            file_name = osp.join("VOC2012", "JPEGImages", image_name + ".jpg")
            img = cv2.imread(osp.join(img_root, file_name))
            if img is None:
                continue
            images.append(dict(id=img_id, file_name=file_name, height=int(img.shape[0]), width=int(img.shape[1])))
            img_ids[img_id] = True
        annotations.append(dict(
            id=ann_id, image_id=img_id, category_id=1, iscrowd=0,
            keypoints=keypoints.reshape(-1).tolist(),
            num_keypoints=int((keypoints[:, 2] > 0).sum()),
            bbox=bbox, area=float(bbox[2] * bbox[3]),
        ))
        ann_id += 1

    coco = dict(
        info=dict(description="Animal-Pose converted to COCO keypoint format",
                  version="1.0", year=time.strftime("%Y")),
        images=images,
        annotations=annotations,
        categories=[dict(supercategory="animal", id=1, name="animal",
                         keypoints=KEYPOINTS, skeleton=SKELETON)],
    )
    os.makedirs(osp.dirname(osp.abspath(out_file)), exist_ok=True)
    with open(out_file, "w") as f:
        json.dump(coco, f)
    print(f"wrote {len(images)} images / {len(annotations)} annotations to {out_file}")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("dataset_dir", help="Animal-Pose root (PASCAL2011_animal_annotation/ + images)")
    parser.add_argument("--ann-dir", default="PASCAL2011_animal_annotation")
    parser.add_argument("--out-file", default=None)
    args = parser.parse_args()
    out = args.out_file or osp.join(args.dataset_dir, "annotations", "animalpose_trainval.json")
    convert(osp.join(args.dataset_dir, args.ann_dir), args.dataset_dir, out)


if __name__ == "__main__":
    main()
