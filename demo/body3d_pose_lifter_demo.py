"""3D pose lifting demo: 2D keypoints per frame -> lifted 3D pose.

Counterpart of the reference ``demo/body3d_pose_lifter_demo.py``.
Usage: python demo/body3d_pose_lifter_demo.py LIFTER_CONFIG [LIFTER_CKPT]
       [--pose2d-config CFG --pose2d-ckpt CKPT] IMAGE...
"""

import os.path as _osp
import sys as _sys

_sys.path.insert(0, _osp.dirname(_osp.dirname(_osp.abspath(__file__))))

import argparse

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("lifter_config")
    parser.add_argument("lifter_checkpoint", nargs="?", default=None)
    parser.add_argument("inputs", nargs="*", help="images / videos (or omit for a synthetic demo)")
    parser.add_argument("--pose2d-config", default=None)
    parser.add_argument("--pose2d-ckpt", default=None)
    parser.add_argument("--seq-len", type=int, default=27)
    args = parser.parse_args()

    from probpose_code_tpu.apis import Pose3DInferencer

    inf = Pose3DInferencer(
        args.lifter_config, args.lifter_checkpoint,
        pose2d_model=args.pose2d_config, pose2d_weights=args.pose2d_ckpt,
        seq_len=args.seq_len,
    )
    if args.inputs:
        results = inf(args.inputs)
    else:  # synthetic keypoint stream
        rng = np.random.RandomState(0)
        frames = [rng.rand(17, 2).astype(np.float32) * 100 for _ in range(5)]
        results = inf(frames)
    for i, r in enumerate(results):
        k3 = r["keypoints_3d"]
        print(f"frame {i}: 3D keypoints {k3.shape}, z range [{k3[..., 2].min():.3f}, {k3[..., 2].max():.3f}]")


if __name__ == "__main__":
    main()
