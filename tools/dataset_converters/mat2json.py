"""Convert MPII-format .mat predictions into the json annotation layout.

Counterpart of reference ``tools/dataset_converters/mat2json.py``: merges
the ``preds`` array of a prediction .mat with the ground-truth json's image
records (replacing ``joints``/dropping ``joints_vis``) so downstream tools
consume one json.

    python tools/dataset_converters/mat2json.py pred.mat data/mpii/mpii_val.json out.json
"""

import argparse
import json
import time


def convert_mat(pred_mat_file: str, gt_json_file: str, output_json_file: str) -> None:
    from scipy.io import loadmat

    preds = loadmat(pred_mat_file)["preds"]
    with open(gt_json_file) as f:
        anno = json.load(f)
    assert len(anno) == preds.shape[0], (
        f"prediction count {preds.shape[0]} != annotation count {len(anno)}"
    )

    for pred, ann in zip(preds, anno):
        ann.pop("joints_vis", None)
        ann["joints"] = pred.tolist()

    out = dict(
        annotations=anno,
        info=dict(
            description="Converted MPII prediction.",
            year=time.strftime("%Y"),
            date_created=time.strftime("%Y/%m/%d"),
        ),
    )
    with open(output_json_file, "w") as f:
        json.dump(out, f, indent=4)
    print(f"wrote {len(anno)} annotations to {output_json_file}")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("pred_mat_file")
    parser.add_argument("gt_json_file")
    parser.add_argument("output_json_file")
    args = parser.parse_args()
    convert_mat(args.pred_mat_file, args.gt_json_file, args.output_json_file)


if __name__ == "__main__":
    main()
