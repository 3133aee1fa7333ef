"""Benchmark: ProbPose-S 256x192 end-to-end inference throughput on TPU.

Measures the full serving predict program — normalize, ViT-S/16 forward,
5-branch ProbMapHead, bisection sparsemax, expected-OKS device decode — in
crops/sec on one chip. This is the BASELINE.md north-star workload (target
>= 5,000 crops/sec/chip on TPU v5e; ``vs_baseline`` = value / 5000).

The serving path runs WITHOUT flip-TTA (TTA is an eval-protocol accuracy
trick that doubles compute; set BENCH_FLIP=1 to measure the eval path).
Backbone/head matmuls run in bfloat16 (params float32, decode float32).

Methodology notes (the axon relay both memoizes identical executions and
signals block_until_ready optimistically, so naive timing loops lie):
- inputs are device-resident,
- every call's input depends on the previous call's output (data chaining),
  which forces sequential, non-deduplicated execution,
- the clock stops at a host fetch of the final output (the only true sync),
- one relay round-trip (~30 ms) is amortized over BENCH_ITERS calls.

Env overrides: BENCH_BATCH (default 64 — swept optimum on v5e: 64 gives
~6.7k crops/s vs ~5.0k at 256), BENCH_ITERS (default 20),
BENCH_DTYPE (bfloat16|float32).
Prints ONE JSON line.
"""

import json
import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from probpose_code_tpu.config import Config
    from probpose_code_tpu.datasets.metainfo import parse_pose_metainfo
    from probpose_code_tpu.models import PoseModel

    batch = int(os.environ.get("BENCH_BATCH", "64"))
    iters = int(os.environ.get("BENCH_ITERS", "20"))
    dtype = os.environ.get("BENCH_DTYPE", "bfloat16")
    flip = os.environ.get("BENCH_FLIP", "0") == "1"

    cfg = Config.fromfile(
        os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "configs/body_2d_keypoint/topdown_probmap/coco/td-pm_ProbPose-small_8xb64-210e_coco-256x192.py",
        )
    )
    model_cfg = cfg.model
    model_cfg["backbone"]["dtype"] = dtype
    model_cfg["backbone"]["approximate_gelu"] = dtype == "bfloat16"
    model_cfg["head"]["dtype"] = dtype

    model = PoseModel(model_cfg, metainfo=parse_pose_metainfo({"dataset_name": "coco"}))
    variables = model.init()
    predict_raw = model.make_predict(flip_test=flip, jit=False)

    def predict_step(variables, images):
        out = predict_raw(variables, images)
        # chain: next input depends on this output (keeps content distinct
        # call-to-call and forces sequential execution)
        next_images = images + out["keypoints"].mean() * 1e-3 + 0.01
        return next_images, out["keypoint_scores"].sum()

    predict = jax.jit(predict_step)

    rng = np.random.RandomState(0)
    images = jax.device_put(jnp.asarray(rng.randint(0, 255, size=(batch, 256, 192, 3)).astype(np.float32)))

    # compile + warmup; np.asarray is the only true sync point on this stack
    images, acc = predict(variables, images)
    _ = np.asarray(acc)

    t0 = time.perf_counter()
    for _ in range(iters):
        images, acc = predict(variables, images)
    _ = np.asarray(acc)  # forces the whole chain
    dt = time.perf_counter() - t0

    crops_per_sec = batch * iters / dt
    print(
        json.dumps(
            {
                "metric": "probpose_s_256x192_infer_throughput" if not flip else "probpose_s_256x192_flip_tta_throughput",
                "value": round(crops_per_sec, 1),
                "unit": "crops/sec/chip",
                "vs_baseline": round(crops_per_sec / 5000.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
