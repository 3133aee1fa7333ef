"""UBody: extract video frames and split per-scene keypoint annotations
into train/val COCO jsons.

Counterpart of reference ``tools/dataset_converters/ubody_kpts_to_coco.py``:
(1) dump every scene video to numbered frames via ffmpeg; (2) walk each
scene's ``keypoint_annotation.json`` and route annotations into train/val
by the intra-scene split list (videos named in the split -> val),
re-indexing ids and writing per-scene plus global jsons.

    python tools/dataset_converters/ubody_kpts_to_coco.py --data-root data/UBody
"""

import argparse
import json
import os
import os.path as osp
import sys
from copy import deepcopy

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__)))))


def extract_frames(video_root: str) -> None:
    for dirpath, _, files in os.walk(video_root):
        for f in files:
            if not f.lower().endswith((".mp4", ".avi", ".mov")):
                continue
            video_path = osp.join(dirpath, f)
            image_path = osp.splitext(video_path)[0].replace(f"{osp.sep}videos{osp.sep}", f"{osp.sep}images{osp.sep}")
            os.makedirs(image_path, exist_ok=True)
            cmd = f"ffmpeg -i {video_path} -f image2 -r 30 -b:v 5626k {image_path}/%06d.png"
            print(cmd)
            os.system(cmd)  # noqa: S605


def split_dataset(annotation_path: str, split_path: str) -> None:
    from probpose_code_tpu.datasets.coco_api import COCO

    splits = set(str(s) for s in np.load(split_path))
    categories = [{"supercategory": "person", "id": 1, "name": "person"}]
    train_annos, val_annos, train_imgs, val_imgs = [], [], [], []
    t_id = v_id = 0

    for scene in sorted(os.listdir(annotation_path)):
        ann_file = osp.join(annotation_path, scene, "keypoint_annotation.json")
        if not osp.exists(ann_file):
            continue
        data = COCO(ann_file)
        print(f"processing {scene}...")
        scene_train, scene_val = dict(images=[], annotations=[]), dict(images=[], annotations=[])
        for aid in data.anns:
            ann = data.anns[aid]
            img = data.loadImgs(ann["image_id"])[0]
            file_name = img["file_name"].lstrip("/")
            video_name = file_name.split("/")[-2]
            if "Trim" in video_name:
                video_name = video_name.split("_Trim")[0]
            img_path = osp.join(annotation_path.replace("annotations", "images"), scene, file_name)
            if not osp.exists(img_path):
                continue

            img = dict(img, file_name=osp.join(scene, file_name))
            ann_g, img_g = deepcopy(ann), deepcopy(img)
            if video_name in splits:
                scene_val["annotations"].append(ann)
                scene_val["images"].append(img)
                ann_g["id"] = ann_g["image_id"] = img_g["id"] = v_id
                val_annos.append(ann_g)
                val_imgs.append(img_g)
                v_id += 1
            else:
                scene_train["annotations"].append(ann)
                scene_train["images"].append(img)
                ann_g["id"] = ann_g["image_id"] = img_g["id"] = t_id
                train_annos.append(ann_g)
                train_imgs.append(img_g)
                t_id += 1

        for name, blob in (("train_annotations.json", scene_train), ("val_annotations.json", scene_val)):
            with open(osp.join(annotation_path, scene, name), "w") as f:
                json.dump(dict(blob, categories=categories), f)

    with open(osp.join(annotation_path, "train_annotations.json"), "w") as f:
        json.dump(dict(images=train_imgs, annotations=train_annos, categories=categories), f)
    with open(osp.join(annotation_path, "val_annotations.json"), "w") as f:
        json.dump(dict(images=val_imgs, annotations=val_annos, categories=categories), f)
    print(f"train: {len(train_imgs)} images, val: {len(val_imgs)} images")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data-root", default="data/UBody")
    parser.add_argument("--skip-videos", action="store_true", help="skip the ffmpeg frame extraction")
    args = parser.parse_args()
    if not args.skip_videos:
        extract_frames(osp.join(args.data_root, "videos"))
    split_dataset(
        osp.join(args.data_root, "annotations"),
        osp.join(args.data_root, "splits", "intra_scene_test_list.npy"),
    )


if __name__ == "__main__":
    main()
