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


def _enable_compile_cache():
    import jax

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def main():
    import jax
    import jax.numpy as jnp

    _enable_compile_cache()

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


def main_train():
    """Training-side bench: full train step (fwd + bwd + AdamW + on-device
    OKS/error targets) in crops/sec on one chip, plus the host input
    pipeline (affine warp + ProbMap encode) rate — SURVEY §7's "input
    pipeline throughput" number. Set BENCH_MODE=train to select.
    """
    import jax
    import jax.numpy as jnp

    _enable_compile_cache()

    from probpose_code_tpu.config import Config
    from probpose_code_tpu.datasets.metainfo import parse_pose_metainfo
    from probpose_code_tpu.engine.optim import build_optimizer
    from probpose_code_tpu.models import PoseModel
    from probpose_code_tpu.parallel import create_train_state, make_mesh, make_train_step, shard_batch

    batch = int(os.environ.get("BENCH_BATCH", "64"))
    iters = int(os.environ.get("BENCH_ITERS", "10"))
    dtype = os.environ.get("BENCH_DTYPE", "float32")  # reference trains f32

    cfg = Config.fromfile(
        os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "configs/body_2d_keypoint/topdown_probmap/coco/td-pm_ProbPose-small_8xb64-210e_coco-256x192.py",
        )
    )
    if dtype != "float32":
        cfg.model["backbone"]["dtype"] = dtype
        cfg.model["backbone"]["approximate_gelu"] = True
        cfg.model["head"]["dtype"] = dtype
    model = PoseModel(cfg.model, metainfo=parse_pose_metainfo({"dataset_name": "coco"}))
    variables = model.init()
    tx, _ = build_optimizer(
        variables["params"], cfg.optim_wrapper, param_scheduler=cfg.param_scheduler,
        steps_per_epoch=100, max_epochs=cfg.train_cfg["max_epochs"],
    )
    mesh = make_mesh(n_data=1, devices=jax.devices()[:1])
    state = create_train_state(variables, tx)
    train_step = make_train_step(model, tx, mesh=mesh)

    rng = np.random.RandomState(0)
    K, H, W = 17, 64, 48
    base = dict(
        inputs=jnp.asarray(rng.rand(batch, 256, 192, 3).astype(np.float32) * 255),
        heatmaps=jnp.asarray(rng.rand(batch, K, H, W).astype(np.float32)),
        keypoint_weights=jnp.ones((batch, K), jnp.float32),
        in_image=jnp.ones((batch, K), jnp.float32),
        annotated=jnp.ones((batch, K), jnp.float32),
        keypoints_visibility=jnp.asarray((rng.rand(batch, K) > 0.5).astype(np.float32)),
    )
    base = shard_batch(base, mesh)

    key = jax.random.PRNGKey(0)
    # compile + settle: the first few post-compile steps still pay relay /
    # cache-load costs (measured: step0 ~2.6s, steady-state ~85ms at B=64)
    for _ in range(4):
        state, metrics = train_step(state, base, key)
        _ = np.asarray(metrics["loss"])

    t0 = time.perf_counter()
    for i in range(iters):
        # data-chain: perturb inputs from the last loss so calls stay distinct
        base = dict(base, inputs=base["inputs"] + metrics["loss"] * 1e-6 + 0.01)
        state, metrics = train_step(state, base, key)
    _ = np.asarray(metrics["loss"])
    dt = time.perf_counter() - t0
    train_crops = batch * iters / dt

    # host input pipeline: LoadImage-equivalent array -> UDP affine warp ->
    # ProbMap encode, single process (the runner's per-worker rate)
    from probpose_code_tpu.datasets import Compose

    pipeline = Compose([
        dict(type="GetBBoxCenterScale"),
        dict(type="TopdownAffine", input_size=(192, 256), use_udp=True, input_padding=1.25),
        dict(type="GenerateTarget", encoder=dict(type="ProbMap", input_size=(192, 256), heatmap_size=(48, 64), sigma=-1)),
        dict(type="PackPoseInputs"),
    ])
    n_host = 200
    imgs = (rng.rand(4, 480, 640, 3) * 255).astype(np.uint8)
    t0 = time.perf_counter()
    for i in range(n_host):
        data = dict(
            img=imgs[i % 4], img_shape=(480, 640), ori_shape=(480, 640),
            bbox=np.array([[50.0, 40.0, 400.0, 440.0]], np.float32),
            bbox_score=np.ones(1, np.float32),
            keypoints=(rng.rand(1, K, 2) * [600, 440]).astype(np.float32),
            keypoints_visible=np.ones((1, K), np.float32),
            keypoints_visibility=np.ones((1, K), np.float32),
            flip_indices=list(range(K)), id=i, img_id=i,
        )
        out = pipeline(data)
    host_crops = n_host / (time.perf_counter() - t0)

    print(
        json.dumps(
            {
                "metric": "probpose_s_256x192_train_throughput",
                "value": round(train_crops, 1),
                "unit": "crops/sec/chip",
                "vs_baseline": round(train_crops / 5000.0, 3),
                "input_pipeline_crops_per_sec_per_worker": round(host_crops, 1),
            }
        )
    )


if __name__ == "__main__":
    if os.environ.get("BENCH_MODE", "infer") == "train":
        main_train()
    else:
        main()
