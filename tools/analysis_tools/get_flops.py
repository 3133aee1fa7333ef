"""Report model FLOPs / parameters via XLA cost analysis.

Counterpart of reference ``tools/analysis_tools/get_flops.py`` (mmengine
FlopCountAnalysis), using ``jax.jit(...).lower().cost_analysis()`` on the
compiled forward program — the number XLA actually schedules.

Usage: python tools/analysis_tools/get_flops.py CONFIG [--shape H W]
"""


import os.path as _osp
import sys as _sys

_sys.path.insert(0, _osp.dirname(_osp.dirname(_osp.dirname(_osp.abspath(__file__)))))  # repo root

import argparse


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("config")
    parser.add_argument("--shape", type=int, nargs=2, default=None, help="input H W")
    parser.add_argument("--batch", type=int, default=1)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from probpose_code_tpu.config import Config
    from probpose_code_tpu.datasets.metainfo import parse_pose_metainfo
    from probpose_code_tpu.models import PoseModel

    cfg = Config.fromfile(args.config)
    model = PoseModel(cfg.model, metainfo=parse_pose_metainfo({"dataset_name": "coco"}))
    if args.shape:
        h, w = args.shape
    else:
        w, h = model.input_size
    variables = model.init(input_shape=(args.batch, h, w, 3))

    def forward(variables, images):
        return model.forward(variables, images)

    images = jnp.zeros((args.batch, h, w, 3), jnp.float32)
    lowered = jax.jit(forward).lower(variables, images)
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]

    n_params = model.num_params()
    flops = cost.get("flops", float("nan"))
    print(f"Input shape: ({args.batch}, {h}, {w}, 3)")
    print(f"Params: {n_params / 1e6:.2f} M")
    print(f"FLOPs (XLA, forward): {flops / 1e9:.2f} G")
    for key in ("bytes accessed", "transcendentals"):
        if key in cost:
            print(f"{key}: {cost[key]:.3e}")


if __name__ == "__main__":
    main()
