"""Run a detector-results-free bbox file generator: export GT bboxes (or a
detection json) into the bbox-file format consumed by topdown evaluation
(reference ``tools/misc/generate_bbox_file.py``)."""

import argparse
import json


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("ann_file", help="COCO annotation json")
    parser.add_argument("out_file", help="output bbox json")
    parser.add_argument("--score", type=float, default=1.0, help="bbox score to assign")
    args = parser.parse_args()

    with open(args.ann_file) as f:
        coco = json.load(f)
    out = [
        dict(image_id=a["image_id"], category_id=a.get("category_id", 1),
             bbox=a["bbox"], score=args.score)
        for a in coco["annotations"]
    ]
    with open(args.out_file, "w") as f:
        json.dump(out, f)
    print(f"wrote {len(out)} boxes -> {args.out_file}")


if __name__ == "__main__":
    main()
