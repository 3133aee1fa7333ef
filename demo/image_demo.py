"""Single-image pose demo.

Counterpart of reference ``demo/image_demo.py``:

    python demo/image_demo.py IMG CONFIG [CHECKPOINT] \
        --out-file vis.jpg [--bboxes x1,y1,x2,y2 ...] [--kpt-thr 0.3]
"""


import os.path as _osp
import sys as _sys

_sys.path.insert(0, _osp.dirname(_osp.dirname(_osp.abspath(__file__))))  # repo root

import argparse

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("img")
    parser.add_argument("config")
    parser.add_argument("checkpoint", nargs="?", default=None)
    parser.add_argument("--out-file", default="vis_result.jpg")
    parser.add_argument("--bboxes", nargs="*", default=None, help="x1,y1,x2,y2 per instance")
    parser.add_argument("--kpt-thr", type=float, default=0.3)
    parser.add_argument("--draw-heatmap", action="store_true")
    args = parser.parse_args()

    import cv2

    from probpose_code_tpu.apis import inference_topdown, init_model
    from probpose_code_tpu.structures import merge_data_samples
    from probpose_code_tpu.visualization import PoseLocalVisualizer

    model = init_model(args.config, args.checkpoint)
    bboxes = None
    if args.bboxes:
        bboxes = np.array([[float(v) for v in b.split(",")] for b in args.bboxes], dtype=np.float32)

    results = inference_topdown(model, args.img, bboxes)
    merged = merge_data_samples(results)

    img = cv2.imread(args.img)
    vis = PoseLocalVisualizer()
    vis.set_dataset_meta(model.metainfo)
    vis.add_datasample(
        "result", img, merged, kpt_thr=args.kpt_thr, draw_heatmap=args.draw_heatmap, out_file=args.out_file
    )
    print(f"result saved to {args.out_file}")
    inst = merged.pred_instances
    print(f"{len(np.asarray(inst.keypoints))} instance(s); mean score "
          f"{float(np.asarray(inst.keypoint_scores).mean()):.3f}")


if __name__ == "__main__":
    main()
