"""Bottom-up (one-stage / multi-person) pose demo.

Counterpart of reference ``demo/bottomup_demo.py``: runs a bottom-up model
(YOLOX-Pose / RTMO / AE) on an image or video, draws every detected person.

    python demo/bottomup_demo.py CONFIG [CHECKPOINT] --input IMG \
        [--output-root out/] [--save-predictions] [--kpt-thr 0.3]
"""

import os.path as _osp
import sys as _sys

_sys.path.insert(0, _osp.dirname(_osp.dirname(_osp.abspath(__file__))))  # repo root

import argparse
import json
import os

import numpy as np


def process_one_image(model, visualizer, img, args, out_file=None):
    from probpose_code_tpu.apis import inference_bottomup
    from probpose_code_tpu.structures import merge_data_samples

    results = inference_bottomup(model, img)
    merged = merge_data_samples(results)
    if visualizer is not None and out_file is not None:
        visualizer.add_datasample(
            "result", img, merged, draw_bbox=True, kpt_thr=args.kpt_thr,
            draw_heatmap=args.draw_heatmap, out_file=out_file,
        )
    return merged.pred_instances


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("config")
    parser.add_argument("checkpoint", nargs="?", default=None)
    parser.add_argument("--input", required=True, help="image or video file")
    parser.add_argument("--output-root", default="", help="save visualizations here")
    parser.add_argument("--save-predictions", action="store_true")
    parser.add_argument("--draw-heatmap", action="store_true")
    parser.add_argument("--kpt-thr", type=float, default=0.3)
    args = parser.parse_args()

    import cv2

    from probpose_code_tpu.apis import init_model
    from probpose_code_tpu.visualization import PoseLocalVisualizer

    model = init_model(args.config, args.checkpoint)
    visualizer = None
    out_file = None
    if args.output_root:
        os.makedirs(args.output_root, exist_ok=True)
        out_file = os.path.join(args.output_root, os.path.basename(args.input))
        visualizer = PoseLocalVisualizer()
        visualizer.set_dataset_meta(model.metainfo)

    preds = []
    ext = os.path.splitext(args.input)[1].lower()
    if ext in (".mp4", ".avi", ".mov", ".webm"):
        cap = cv2.VideoCapture(args.input)
        writer = None
        idx = 0
        while cap.isOpened():
            ok, frame = cap.read()
            if not ok:
                break
            frame_out = out_file + f".frame{idx}.jpg" if out_file else None
            inst = process_one_image(model, visualizer, frame, args, frame_out)
            preds.append(dict(
                frame=idx,
                keypoints=np.asarray(inst.keypoints).tolist(),
                keypoint_scores=np.asarray(inst.keypoint_scores).tolist(),
            ))
            idx += 1
        cap.release()
        if writer is not None:
            writer.release()
    else:
        img = cv2.imread(args.input)
        assert img is not None, f"cannot read {args.input}"
        inst = process_one_image(model, visualizer, img, args, out_file)
        preds.append(dict(
            keypoints=np.asarray(inst.keypoints).tolist(),
            keypoint_scores=np.asarray(inst.keypoint_scores).tolist(),
        ))
        n = len(np.asarray(inst.keypoints))
        print(f"{n} instance(s) detected")

    if args.save_predictions:
        assert args.output_root, "--save-predictions needs --output-root"
        pred_path = os.path.join(
            args.output_root, f"results_{os.path.splitext(os.path.basename(args.input))[0]}.json"
        )
        with open(pred_path, "w") as f:
            json.dump(preds, f, indent=2)
        print(f"predictions saved to {pred_path}")
    if out_file:
        print(f"visualization saved to {out_file}")


if __name__ == "__main__":
    main()
