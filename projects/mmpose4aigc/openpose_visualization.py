"""OpenPose-format skeleton maps for AIGC conditioning (T2I-Adapter /
ControlNet style).

Port of reference ``projects/mmpose4aigc/openpose_visualization.py`` over
this framework's APIs: top-down inference (``init_model`` +
``inference_topdown``; bboxes from a caller-provided detector or
whole-image fallback), 17->18-keypoint conversion with the synthesized
neck joint, the mmpose->openpose index permutation, and the classic
stick-figure rendering on a black canvas (ellipse limbs at 0.6 alpha).

The drawing core is a pure function over a (N, 18, 3) array so it is
directly testable without weights.
"""

from __future__ import annotations

import math
import os
from argparse import ArgumentParser
from itertools import product

import cv2
import numpy as np

# openpose format (1-based joint ids)
limb_seq = [
    [2, 3], [2, 6], [3, 4], [4, 5], [6, 7], [7, 8], [2, 9], [9, 10],
    [10, 11], [2, 12], [12, 13], [13, 14], [2, 1], [1, 15], [15, 17],
    [1, 16], [16, 18],
]

colors = [
    [255, 0, 0], [255, 85, 0], [255, 170, 0], [255, 255, 0], [170, 255, 0],
    [85, 255, 0], [0, 255, 0], [0, 255, 85], [0, 255, 170], [0, 255, 255],
    [0, 170, 255], [0, 85, 255], [0, 0, 255], [85, 0, 255], [170, 0, 255],
    [255, 0, 255], [255, 0, 170], [255, 0, 85],
]

stickwidth = 4
num_openpose_kpt = 18


def coco17_to_openpose18(keypoints: np.ndarray, kpt_thr: float = 0.4) -> np.ndarray:
    """(N, 17, 3) COCO keypoints+scores -> (N, 18, 3) openpose layout with
    the neck synthesized from the shoulder midpoint (reference :94-105)."""
    neck = (keypoints[:, 5] + keypoints[:, 6]) / 2
    low = (keypoints[:, 5, 2] < kpt_thr) | (keypoints[:, 6, 2] < kpt_thr)
    neck[low, 2] = 0
    new_keypoints = np.insert(keypoints, 17, neck, axis=1)
    openpose_idx = [15, 14, 17, 16, 2, 6, 3, 7, 4, 8, 12, 9, 13, 10, 1]
    mmpose_idx = [1, 2, 3, 4, 6, 7, 8, 9, 10, 12, 13, 14, 15, 16, 17]
    new_keypoints[:, openpose_idx, :] = new_keypoints[:, mmpose_idx, :]
    return new_keypoints


def draw_openpose_skeleton(canvas_hw, keypoints18: np.ndarray, kpt_thr: float = 0.4) -> np.ndarray:
    """Stick-figure render of (N, 18, 3) openpose keypoints on a black
    canvas (reference :110-134); returns an RGB uint8 image."""
    h, w = canvas_hw
    black_img = np.zeros((h, w, 3), np.uint8)
    n = keypoints18.shape[0]
    for i, j in product(range(n), range(num_openpose_kpt)):
        x, y, conf = keypoints18[i][j]
        if conf > kpt_thr:
            cv2.circle(black_img, (int(x), int(y)), 4, colors[j], thickness=-1)
    cur = black_img.copy()
    for i, link_idx in product(range(n), range(len(limb_seq))):
        pair = np.array(limb_seq[link_idx]) - 1
        conf = keypoints18[i][pair, 2]
        if np.sum(conf > kpt_thr) == 2:
            Y = keypoints18[i][pair, 0]
            X = keypoints18[i][pair, 1]
            mX, mY = np.mean(X), np.mean(Y)
            length = ((X[0] - X[1]) ** 2 + (Y[0] - Y[1]) ** 2) ** 0.5
            angle = math.degrees(math.atan2(X[0] - X[1], Y[0] - Y[1]))
            poly = cv2.ellipse2Poly((int(mY), int(mX)), (int(length / 2), stickwidth), int(angle), 0, 360, 1)
            cv2.fillConvexPoly(cur, poly, colors[link_idx])
    return cv2.addWeighted(black_img, 0.4, cur, 0.6, 0)


def mmpose_to_openpose_visualization(args, img_path, pose_estimator, bboxes=None):
    """Predict + render one image; writes openpose_<name>.png."""
    from probpose_code_tpu.apis import inference_topdown
    from probpose_code_tpu.structures import merge_data_samples

    pose_results = inference_topdown(pose_estimator, img_path, bboxes)
    data_samples = merge_data_samples(pose_results)
    keypoints = np.concatenate(
        (
            data_samples.pred_instances.keypoints,
            np.asarray(data_samples.pred_instances.keypoint_scores).reshape(-1, 17, 1),
        ),
        axis=-1,
    )
    kpts18 = coco17_to_openpose18(keypoints, args.kpt_thr)
    img = cv2.imread(img_path)
    out = draw_openpose_skeleton(img.shape[:2], kpts18, args.kpt_thr)
    out_file = "openpose_" + os.path.splitext(os.path.basename(img_path))[0] + ".png"
    cv2.imwrite(out_file, out[:, :, ::-1])
    return out_file


def main():
    parser = ArgumentParser()
    parser.add_argument("pose_config")
    parser.add_argument("pose_checkpoint", nargs="?", default=None)
    parser.add_argument("--input", type=str, required=True)
    parser.add_argument("--bbox-thr", type=float, default=0.4)
    parser.add_argument("--nms-thr", type=float, default=0.3)
    parser.add_argument("--kpt-thr", type=float, default=0.4)
    args = parser.parse_args()

    from probpose_code_tpu.apis import init_model

    pose_estimator = init_model(args.pose_config, args.pose_checkpoint)
    print(mmpose_to_openpose_visualization(args, args.input, pose_estimator))


if __name__ == "__main__":
    main()
