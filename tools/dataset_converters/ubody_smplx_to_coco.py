"""Convert keypoint annotations into COCO-person format.

Representative counterpart of the reference's ``tools/dataset_converters/``
scripts: reads a json of per-image keypoint arrays and emits a COCO-style
annotation file this framework's datasets consume.
"""

import os.path as _osp
import sys as _sys

_sys.path.insert(0, _osp.dirname(_osp.dirname(_osp.dirname(_osp.abspath(__file__)))))

import argparse
import json

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("src", help="source json: list of {image, width, height, keypoints[,bbox]}")
    parser.add_argument("dst", help="output COCO annotation json")
    parser.add_argument("--num-keypoints", type=int, default=17)
    args = parser.parse_args()

    with open(args.src) as f:
        items = json.load(f)
    images, annotations = [], []
    img_ids, aid = {}, 1
    for item in items:
        name = item["image"]
        if name not in img_ids:
            img_ids[name] = len(img_ids) + 1
            images.append(dict(id=img_ids[name], file_name=name,
                               width=item.get("width", 0), height=item.get("height", 0)))
        kpts = np.asarray(item["keypoints"], np.float32).reshape(-1, 3)[: args.num_keypoints]
        if "bbox" in item:
            x0, y0, w, h = item["bbox"]
        else:
            vis = kpts[:, 2] > 0
            xs, ys = kpts[vis, 0], kpts[vis, 1]
            x0, y0 = float(xs.min()), float(ys.min())
            w, h = float(xs.max() - x0), float(ys.max() - y0)
        annotations.append(dict(
            id=aid, image_id=img_ids[name], category_id=1, iscrowd=0,
            bbox=[x0, y0, w, h], area=w * h,
            keypoints=kpts.reshape(-1).tolist(),
            num_keypoints=int((kpts[:, 2] > 0).sum()),
        ))
        aid += 1
    with open(args.dst, "w") as f:
        json.dump(dict(info={}, licenses=None, images=images,
                       categories=[dict(id=1, name="person")], annotations=annotations), f)
    print(f"wrote {len(annotations)} annotations over {len(images)} images -> {args.dst}")


if __name__ == "__main__":
    main()
