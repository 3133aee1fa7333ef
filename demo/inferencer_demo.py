"""Inferencer CLI demo (counterpart of reference ``demo/inferencer_demo.py``).

    python demo/inferencer_demo.py INPUT --pose2d CONFIG \
        [--pose2d-weights CKPT] [--vis-out-dir vis] [--pred-out-dir preds]
"""


import os.path as _osp
import sys as _sys

_sys.path.insert(0, _osp.dirname(_osp.dirname(_osp.abspath(__file__))))  # repo root

import argparse


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("inputs")
    parser.add_argument("--pose2d", required=True)
    parser.add_argument("--pose2d-weights", default=None)
    parser.add_argument("--vis-out-dir", default=None)
    parser.add_argument("--pred-out-dir", default=None)
    parser.add_argument("--kpt-thr", type=float, default=0.3)
    args = parser.parse_args()

    from probpose_code_tpu.apis.inferencers import MMPoseInferencer

    inferencer = MMPoseInferencer(pose2d=args.pose2d, pose2d_weights=args.pose2d_weights)
    outputs = inferencer(
        args.inputs,
        vis_out_dir=args.vis_out_dir,
        pred_out_dir=args.pred_out_dir,
        kpt_thr=args.kpt_thr,
    )
    print(f"processed {len(outputs)} inputs")


if __name__ == "__main__":
    main()
