"""3D interacting-hand demo (InterNet).

Counterpart of reference ``demo/hand3d_internet_demo.py``: runs an
InternetHead model on hand images, prints/saves the 3D keypoints, root
depth, and handedness, and draws the 2D projection.

    python demo/hand3d_internet_demo.py CONFIG [CHECKPOINT] --input IMG \
        [--output-root out/] [--save-predictions] [--kpt-thr 0.1]
"""

import os.path as _osp
import sys as _sys

_sys.path.insert(0, _osp.dirname(_osp.dirname(_osp.abspath(__file__))))  # repo root

import argparse
import json
import os

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("config")
    parser.add_argument("checkpoint", nargs="?", default=None)
    parser.add_argument("--input", required=True, help="image file or folder")
    parser.add_argument("--output-root", default="")
    parser.add_argument("--save-predictions", action="store_true")
    parser.add_argument("--kpt-thr", type=float, default=0.1)
    args = parser.parse_args()

    import cv2

    from probpose_code_tpu.apis.inferencers import Hand3DInferencer

    inferencer = Hand3DInferencer(args.config, args.checkpoint)
    if args.output_root:
        os.makedirs(args.output_root, exist_ok=True)

    results = inferencer(args.input)
    preds = []
    for i, res in enumerate(results):
        kpts = np.asarray(res["keypoints"])[0]  # (42, 3): x, y in px, z in depth bins
        scores = np.asarray(res["keypoint_scores"])[0]
        hand_type = np.asarray(res["hand_type"])
        handedness = {(1, 0): "right", (0, 1): "left", (1, 1): "interacting"}.get(
            tuple((hand_type > 0.5).astype(int)), "none"
        )
        preds.append(dict(
            keypoints=kpts.tolist(),
            keypoint_scores=scores.tolist(),
            rel_root_depth=res["rel_root_depth"],
            hand_type=handedness,
        ))
        print(f"[{i}] {handedness} hand(s), rel_root_depth={res['rel_root_depth']:.2f}, "
              f"mean score {scores.mean():.3f}")

        if args.output_root and os.path.isfile(args.input):
            img = cv2.imread(args.input)
            if img is not None:
                h, w = img.shape[:2]
                # keypoints are in model-input space; rescale to the image
                sx, sy = w / inferencer.model.input_size[0], h / inferencer.model.input_size[1]
                for (x, y, _z), s in zip(kpts, scores):
                    if s >= args.kpt_thr:
                        cv2.circle(img, (int(x * sx), int(y * sy)), 3, (0, 255, 0), -1)
                out_file = os.path.join(args.output_root, os.path.basename(args.input))
                cv2.imwrite(out_file, img)
                print(f"visualization saved to {out_file}")

    if args.save_predictions:
        assert args.output_root, "--save-predictions needs --output-root"
        pred_path = os.path.join(args.output_root, "results_hand3d.json")
        with open(pred_path, "w") as f:
            json.dump(preds, f, indent=2)
        print(f"predictions saved to {pred_path}")


if __name__ == "__main__":
    main()
