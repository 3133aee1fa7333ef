"""Convert a Label Studio keypoint export to COCO keypoint format.

Counterpart of reference ``tools/dataset_converters/labelstudio2coco.py``.
Annotation convention (same as the reference): per instance, the result
items appear in order keypoint-1 .. keypoint-K, then the bbox rectangle
and/or the instance polygon. Keypoints with (0, 0) coordinates become
v=0; Label Studio coordinates are percentages of original_width/height.

    python tools/dataset_converters/labelstudio2coco.py CONFIG.xml export.json out.json
"""

import argparse
import json
import pathlib
import xml.etree.ElementTree as ET

import numpy as np


def parse_categories(config_xml: str):
    root = ET.parse(config_xml).getroot()
    values = [label.get("value") for label in root.findall(".//KeyPointLabels/Label")]
    categories = [{"id": i + 1, "name": v} for i, v in enumerate(values)]
    return categories, {v: i + 1 for i, v in enumerate(values)}


def convert(config_xml: str, input_json: str, output_json: str) -> None:
    categories, name_to_id = parse_categories(config_xml)

    with open(input_json) as f:
        tasks = json.load(f)

    images, annotations = [], []
    for item in tasks:
        if not item.get("annotations"):
            continue
        image_name = item.get("file_upload") or item.get("data", {}).get("img", "")
        image_id = len(images)
        width = height = None
        kp_num = 0

        for i, label in enumerate(item["annotations"][0]["result"]):
            category_name = None
            for key in ("rectanglelabels", "polygonlabels", "labels", "keypointlabels"):
                if label.get("type") == key and label["value"].get(key):
                    category_name = label["value"][key][0]
                    break
            if category_name is None:
                continue
            if width is None:
                if "original_width" not in label:
                    continue
                width, height = label["original_width"], label["original_height"]
                images.append(dict(id=image_id, file_name=image_name, width=width, height=height))

            if label["type"] in ("rectanglelabels", "labels"):
                v = label["value"]
                x = v["x"] * label["original_width"] / 100
                y = v["y"] * label["original_height"] / 100
                w = v["width"] * label["original_width"] / 100
                h = v["height"] * label["original_height"] / 100
                annotations[-1]["bbox"] = [x, y, w, h]
                annotations[-1]["area"] = w * h
                annotations[-1]["num_keypoints"] = kp_num
            elif label["type"] == "polygonlabels":
                pts = [(px / 100 * width, py / 100 * height) for px, py in label["value"]["points"]]
                xs, ys = zip(*pts)
                annotations[-1]["segmentation"] = [[c for p in pts for c in p]]
                annotations[-1]["bbox"] = [min(xs), min(ys), max(xs) - min(xs), max(ys) - min(ys)]
                annotations[-1]["area"] = float(
                    0.5 * np.abs(np.dot(xs, np.roll(ys, 1)) - np.dot(ys, np.roll(xs, 1)))
                )
                annotations[-1]["num_keypoints"] = kp_num
            elif label["type"] == "keypointlabels":
                x = label["value"]["x"] * label["original_width"] / 100
                y = label["value"]["y"] * label["original_height"] / 100
                # Label Studio has no visibility flag: (0, 0) encodes v=0
                kp = [x, y, 0 if x == y == 0 else 2]
                prev = item["annotations"][0]["result"][i - 1] if i else None
                if prev is None or prev.get("type") != "keypointlabels":
                    kp_num = 0
                    annotations.append(dict(
                        id=len(annotations), image_id=image_id,
                        category_id=name_to_id[category_name],
                        keypoints=list(kp), ignore=0, iscrowd=0,
                    ))
                else:
                    annotations[-1]["keypoints"].extend(kp)
                kp_num += 1 if kp[2] else 0

    out = dict(images=images, annotations=annotations, categories=categories)
    path = pathlib.Path(output_json)
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f)
    print(f"wrote {len(images)} images / {len(annotations)} annotations to {output_json}")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("config", help="Label Studio labeling-interface XML")
    parser.add_argument("input", help="Label Studio export JSON")
    parser.add_argument("output", help="COCO output JSON")
    args = parser.parse_args()
    convert(args.config, args.input, args.output)


if __name__ == "__main__":
    main()
