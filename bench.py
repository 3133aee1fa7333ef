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
- default (pipelined serving): every call reads a DIFFERENT input batch
  from a pool of BENCH_POOL distinct device-resident batches, plus a
  per-pass scalar perturbation — every execution is unique, so the relay
  cannot memoize, while independent dispatches pipeline like a real
  serving loop (dispatch overlaps device execution),
- the clock stops at a host fetch of a tally reduced over ALL outputs of
  the pass (the only true sync — nothing can be skipped),
- BENCH_CHAINED=1 selects the older strictly-serialized variant where
  each call's input depends on the previous call's output; it measures
  latency-bound (non-pipelined) throughput and reads ~12-15% lower,
- one relay round-trip (~30 ms) is amortized over BENCH_ITERS calls.

Env overrides: BENCH_BATCH (default 64 — swept optimum on v5e: 64 gives
~6.9k chained / ~7.8k pipelined vs ~5.0k at 256), BENCH_ITERS (default
20), BENCH_POOL (default 20), BENCH_DTYPE (bfloat16|float32),
BENCH_CHAINED (default 0). Prints ONE JSON line.
"""

import json
import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.abspath(__file__))
_HISTORY = os.path.join(_REPO, "BENCH_HISTORY.json")


def _enable_compile_cache():
    import jax

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def _bench_decode_us():
    """Expected-OKS decode cost in µs/heatmap (separable banded-matmul path,
    B=128 ProbPose-S heatmaps) — the secondary BASELINE.md metric."""
    import jax
    import jax.numpy as jnp

    from probpose_code_tpu.ops.decode import heatmap_expected_value_batch

    B, K, H, W = 128, 17, 64, 48
    # generated on device — a 27 MB h2d transfer can dominate the run when
    # the shared relay is contended
    hm = jax.jit(lambda k: jax.random.uniform(k, (B, K, H, W), jnp.float32))(jax.random.PRNGKey(0))

    def step(hm):
        locs, scores = heatmap_expected_value_batch(hm)
        return hm + scores.mean() * 1e-6, locs.sum()

    step = jax.jit(step)
    hm, acc = step(hm)
    _ = np.asarray(acc)
    iters = 30
    t0 = time.perf_counter()
    for _ in range(iters):
        hm, acc = step(hm)
    _ = np.asarray(acc)
    dt = time.perf_counter() - t0
    return dt / (iters * B * K) * 1e6


def _native_available() -> bool:
    from probpose_code_tpu.datasets import native_decode

    return native_decode.available()


def _check_history(metric: str, value: float, **tags) -> dict:
    """Regression guard: compare against the best recorded value for this
    metric in BENCH_HISTORY.json, warn on drops beyond the relay noise band,
    append the run. Extra ``tags`` (dtype, fused, ...) are stored with the
    history entry so entries are attributable to their configuration."""
    hist = []
    if os.path.exists(_HISTORY):
        try:
            hist = json.load(open(_HISTORY))
        except Exception:
            hist = []
    prior = [h["value"] for h in hist if h.get("metric") == metric]
    best = max(prior) if prior else None
    out = {}
    if best is not None:
        out["vs_best"] = round(value / best, 3)
        # the shared relay adds ~+-8% run-to-run noise even with best-of-3
        # timing (measured 5.5k-7.0k across identical runs), so the guard
        # fires only on drops beyond the noise band
        if value < best * 0.90:
            print(
                f"WARNING: {metric} regressed {100 * (1 - value / best):.1f}% vs best "
                f"recorded {best:.1f} (see BENCH_HISTORY.json)",
                file=sys.stderr,
            )
    import jax

    if jax.devices()[0].platform == "cpu":
        # CPU dry-runs (bench health checks) must not pollute the TPU history
        return out
    hist.append({"metric": metric, "value": round(value, 1),
                 "ts": time.strftime("%Y-%m-%d %H:%M:%S"), **tags})
    try:
        with open(_HISTORY, "w") as f:
            json.dump(hist, f, indent=1)
    except OSError:
        pass
    return out


def main():
    import jax
    import jax.numpy as jnp

    _enable_compile_cache()

    from probpose_code_tpu.config import Config
    from probpose_code_tpu.datasets.metainfo import parse_pose_metainfo
    from probpose_code_tpu.models import PoseModel

    flip = os.environ.get("BENCH_FLIP", "0") == "1"
    # swept optima on v5e: serving peaks at B=64, flip-TTA at B=32 (the
    # fused 2B forward doubles the effective batch the chip sees)
    batch = int(os.environ.get("BENCH_BATCH", "32" if flip else "64"))
    chained_mode = os.environ.get("BENCH_CHAINED", "0") == "1"
    # pipelined mode pays one relay round-trip (~28 ms) per timed pass at
    # the final tally fetch; 100 unique iters amortize it to <5% so the
    # measurement approaches the chip's true serving rate
    iters = int(os.environ.get("BENCH_ITERS", "20" if chained_mode else "100"))
    dtype = os.environ.get("BENCH_DTYPE", "bfloat16")

    # secondary workloads (BENCH_MODEL): the reference publishes RTMPose-m
    # at 430+ FPS on a GTX 1660 Ti / 90+ FPS CPU (projects/rtmpose/README.md)
    # — measuring the same-family serving path on the v5e chip
    workload = os.environ.get("BENCH_MODEL", "probpose-s")
    configs = {
        "probpose-s": "configs/body_2d_keypoint/topdown_probmap/coco/td-pm_ProbPose-small_8xb64-210e_coco-256x192.py",
        "rtmpose-m": "configs/body_2d_keypoint/rtmpose/coco/rtmpose-m_8xb256-420e_coco-256x192.py",
        "hrnet-w32-udp": "configs/body_2d_keypoint/topdown_heatmap/coco/td-hm_hrnet-w32_udp-8xb64-210e_coco-256x192.py",
    }
    cfg = Config.fromfile(os.path.join(os.path.dirname(os.path.abspath(__file__)), configs[workload]))
    model_cfg = cfg.model
    if workload == "probpose-s":
        # The shipped recipe IS the fast path since r5: it carries
        # dtype=bfloat16 + approximate_gelu, and fused_layers defaults to
        # auto (whole-layer Pallas kernels on TPU). The default bench run
        # therefore measures exactly what init_model builds; env knobs below
        # only override for A/B runs (BENCH_FUSED=0 pins the XLA graph,
        # BENCH_DTYPE=float32 the f32 graph).
        if "BENCH_DTYPE" in os.environ:
            model_cfg["backbone"]["dtype"] = dtype
            model_cfg["backbone"]["approximate_gelu"] = dtype == "bfloat16"
            model_cfg["head"]["dtype"] = dtype
        if "BENCH_FUSED" in os.environ:
            model_cfg["backbone"]["fused_layers"] = os.environ["BENCH_FUSED"] == "1"
        if os.environ.get("BENCH_QUANT"):  # int8 MXU matmuls in the backbone
            model_cfg["backbone"]["quant"] = os.environ["BENCH_QUANT"]
            model_cfg["backbone"]["fused_layers"] = False
    else:
        # conv-family serving precision: all backbones/heads are dtype-generic
        # flax modules, so the deployment precision is a bench knob, not a
        # recipe field (reference recipes state the TRAINING precision; the
        # v5e serving sweet spot is bf16 conv + f32 decode — decode already
        # runs f32 via make_predict's precision policy)
        model_cfg["backbone"]["dtype"] = dtype
        model_cfg["head"]["dtype"] = dtype

    model = PoseModel(model_cfg, metainfo=parse_pose_metainfo({"dataset_name": "coco"}))
    variables = model.init()
    predict_raw = model.make_predict(flip_test=flip, jit=False)

    chained = chained_mode
    passes = int(os.environ.get("BENCH_PASSES", "6"))

    def measure_pipelined(predict_fn, batch_size, n_iters, n_passes):
        """Pipelined throughput of one predict program: unique device-resident
        inputs per call (relay cannot memoize), one tally fetch per pass."""
        gen = jax.jit(
            lambda key: jax.random.uniform(key, (batch_size, 256, 192, 3), jnp.float32, 0.0, 255.0)
        )

        def step(variables, images, t):
            return predict_fn(variables, images + t)["keypoint_scores"].sum()

        step = jax.jit(step)
        tally = jax.jit(lambda xs: jnp.stack(xs).sum())
        pool_n = max(20, n_iters)
        pool = [gen(jax.random.fold_in(jax.random.PRNGKey(1), j)) for j in range(pool_n)]
        _ = np.asarray(step(variables, pool[0], jax.device_put(jnp.float32(0.0))))
        best = float("inf")
        for p in range(n_passes):
            t = jax.device_put(jnp.float32((p + 1) * 0.01))
            t0 = time.perf_counter()
            sums = [step(variables, pool[j % pool_n], t) for j in range(n_iters)]
            _ = np.asarray(tally(sums))
            best = min(best, time.perf_counter() - t0)
        return batch_size * n_iters / best

    # generate bench inputs ON DEVICE: a pool of B=64 f32 crop batches is
    # ~9.4 MB each, and h2d over the shared axon relay can run at well
    # under 1 GB/s when contended — transferring a 100-batch pool from the
    # host was observed to exceed the driver's bench timeout outright.
    # jax.random on the device costs microseconds and keeps every batch
    # unique (distinct fold_in keys), which is all the methodology needs.
    gen_batch = jax.jit(
        lambda key: jax.random.uniform(key, (batch, 256, 192, 3), jnp.float32, 0.0, 255.0)
    )

    # best-of-N timed passes: the shared relay adds up to ~10% run-to-run
    # noise (measured 5.5k-7.0k crops/s across identical runs); the fastest
    # pass is the least-contended estimate of the chip's rate. Each pass is
    # ~0.2 s, so N=6 stays cheap.
    best_dt = float("inf")
    if chained:
        def predict_step(variables, images):
            out = predict_raw(variables, images)
            # chain: next input depends on this output (keeps content
            # distinct call-to-call and forces sequential execution)
            next_images = images + out["keypoints"].mean() * 1e-3 + 0.01
            return next_images, out["keypoint_scores"].sum()

        predict = jax.jit(predict_step)
        images = gen_batch(jax.random.PRNGKey(0))
        # compile + warmup; np.asarray is the only true sync on this stack
        images, acc = predict(variables, images)
        _ = np.asarray(acc)
        for _ in range(passes):
            t0 = time.perf_counter()
            for _ in range(iters):
                images, acc = predict(variables, images)
            _ = np.asarray(acc)  # forces the whole chain
            best_dt = min(best_dt, time.perf_counter() - t0)
    else:
        # pipelined serving: independent batches from a pool of distinct
        # device-resident inputs; a per-pass scalar keeps every execution
        # unique across passes (no relay memoization); the single tally
        # fetch depends on every output, so nothing can be skipped
        def predict_step(variables, images, t):
            out = predict_raw(variables, images + t)
            return out["keypoint_scores"].sum()

        predict = jax.jit(predict_step)
        tally = jax.jit(lambda xs: jnp.stack(xs).sum())
        # every call within a pass must see a unique (input, t) pair or the
        # relay memoizes the repeats and inflates the rate — cover all iters
        pool_n = max(int(os.environ.get("BENCH_POOL", "20")), iters)
        pool = [gen_batch(jax.random.fold_in(jax.random.PRNGKey(0), j)) for j in range(pool_n)]
        _ = np.asarray(predict(variables, pool[0], jax.device_put(jnp.float32(0.0))))
        for p in range(passes):
            t = jax.device_put(jnp.float32((p + 1) * 0.01))
            t0 = time.perf_counter()
            sums = [predict(variables, pool[j % pool_n], t) for j in range(iters)]
            _ = np.asarray(tally(sums))
            best_dt = min(best_dt, time.perf_counter() - t0)

    crops_per_sec = batch * iters / best_dt
    stem = workload.replace("-", "_")
    if workload == "probpose-s":
        stem = "probpose_s"  # keep the historical metric names
    metric = f"{stem}_256x192_infer_throughput" if not flip else f"{stem}_256x192_flip_tta_throughput"
    record = {
        "metric": metric,
        "value": round(crops_per_sec, 1),
        "unit": "crops/sec/chip",
        "vs_baseline": round(crops_per_sec / 5000.0, 3),
    }
    if workload != "probpose-s":
        record["model"] = workload
        record["dtype"] = dtype
        try:
            # serving MFU from XLA's own FLOP count for the predict program
            # (v5e peak: 197 bf16 / 49 f32 TFLOP/s) — the bound statement
            # the conv-family perf docs cite
            images0 = gen_batch(jax.random.PRNGKey(0))
            cost = jax.jit(predict_raw).lower(variables, images0).compile().cost_analysis()
            if isinstance(cost, (list, tuple)):
                cost = cost[0]
            flops = float(cost.get("flops", 0.0))
            if flops > 0:
                peak = 197e12 if dtype == "bfloat16" else 49e12
                record["mfu"] = round(flops * (crops_per_sec / batch) / peak, 4)
                record["tflops_sustained"] = round(flops * (crops_per_sec / batch) / 1e12, 1)
        except Exception:
            pass
    if os.environ.get("BENCH_DECODE", "1") == "1":
        record["decode_us_per_heatmap"] = round(_bench_decode_us(), 3)
    if workload == "probpose-s" and not flip and os.environ.get("BENCH_TTA", "1") == "1":
        # the eval protocol always flips (reference topdown.py:109-114), so
        # the driver's record must carry the protocol-faithful number too;
        # swept optimum for the fused 2B flip forward is B=32
        tta_predict = model.make_predict(flip_test=True, jit=False)
        tta_rate = measure_pipelined(
            tta_predict,
            int(os.environ.get("BENCH_TTA_BATCH", "32")),
            int(os.environ.get("BENCH_TTA_ITERS", "50")),
            int(os.environ.get("BENCH_TTA_PASSES", "4")),
        )
        record["flip_tta_crops_per_sec"] = round(tta_rate, 1)
        record["tta_vs_baseline"] = round(tta_rate / 5000.0, 3)
        record.update({f"tta_{k}": v for k, v in
                       _check_history("probpose_s_256x192_flip_tta_throughput", tta_rate,
                                      dtype=dtype, fused=os.environ.get("BENCH_FUSED", "auto"),
                                      model=workload).items()})
    record.update(_check_history(metric, crops_per_sec, dtype=dtype,
                                 fused=os.environ.get("BENCH_FUSED", "auto"), model=workload))
    print(json.dumps(record))


def main_train():
    """Training-side bench — end-to-end through the REAL dataset pipeline.

    Builds a synthetic on-disk COCO (real JPEG decode), runs the full
    training data path — LoadImage -> augmentations -> deferred affine
    (canvas) -> loader prefetch -> host->device transfer -> jitted train
    step with on-device warp + ProbMap target encode + fwd/bwd/AdamW — and
    reports sustained crops/s on one chip. Set BENCH_MODE=train to select.

    The recommended split (measured on the 1-core bench host + v5e):
    host cv2 warp (0.4 ms/crop) + uint8 crop transfer + DEVICE target
    encode (ops.encode), because TPU gathers make a full device-side warp
    of rotated training crops scalar-bound (~28 ms/crop) while the host
    warp is trivially cheap. `BENCH_CANVAS>0` selects the deferred-canvas
    mode instead (device gather warp — useful to quantify, not to ship).

    Env: BENCH_BATCH (64), BENCH_STEPS (30), BENCH_DTYPE (bfloat16),
    BENCH_WORKERS (1; >1 only helps on multi-core hosts), BENCH_CANVAS (0),
    BENCH_DEVICE_PIPELINE (1; 0 = the reference-style all-host pipeline),
    BENCH_NATIVE (1 = C++ sparse JPEG region decode, csrc/image_pipeline.cpp;
    bit-exact with the cv2 path), BENCH_FAST_DECODE (0; 1 adds DCT-domain
    scaled decode for >=2x-downsampling crops — training-quality approx).
    """
    import tempfile

    import jax
    import jax.numpy as jnp

    _enable_compile_cache()

    from probpose_code_tpu.config import Config
    from probpose_code_tpu.datasets import DataLoader
    from probpose_code_tpu.datasets.metainfo import parse_pose_metainfo
    from probpose_code_tpu.engine.optim import build_optimizer
    from probpose_code_tpu.models import PoseModel
    from probpose_code_tpu.parallel import create_train_state, make_mesh, make_train_step, shard_batch
    from probpose_code_tpu.registry import DATASETS
    from probpose_code_tpu.testing import make_synthetic_coco

    batch = int(os.environ.get("BENCH_BATCH", "64"))
    steps = int(os.environ.get("BENCH_STEPS", "30"))
    dtype = os.environ.get("BENCH_DTYPE", "bfloat16")
    workers = int(os.environ.get("BENCH_WORKERS", "1"))
    canvas = int(os.environ.get("BENCH_CANVAS", "0"))
    device_pipeline = os.environ.get("BENCH_DEVICE_PIPELINE", "1") == "1"
    native = os.environ.get("BENCH_NATIVE", "1") == "1"
    fast_decode = os.environ.get("BENCH_FAST_DECODE", "0") == "1"

    root = os.path.join(tempfile.gettempdir(), "probpose_bench_coco")
    if not os.path.exists(os.path.join(root, "annotations.json")):
        make_synthetic_coco(root, num_images=256, instances_per_image=2, img_size=(480, 640))

    codec = dict(type="ProbMap", input_size=(192, 256), heatmap_size=(48, 64), sigma=-1)
    affine = dict(type="TopdownAffine", input_size=(192, 256), use_udp=True, input_padding=1.25)
    target = dict(type="GenerateTarget", encoder=codec)
    if device_pipeline:
        affine.update(with_bbox_mask=False)  # DoubleProbMap-only output
        target.update(device=True)
        if canvas:
            affine.update(device_warp=True, canvas_size=(canvas, canvas))
    if native and not canvas:
        affine.update(fast_decode=fast_decode)
    train_pipeline = [
        dict(type="LoadImage", lazy=native and not canvas),
        dict(type="GetBBoxCenterScale"),
        dict(type="RandomFlip", direction="horizontal"),
        dict(type="RandomHalfBody"),
        dict(type="RandomBBoxTransform"),
        affine,
        target,
        dict(type="PackPoseInputs"),
    ]
    ds = DATASETS.build(dict(
        type="CocoDataset", data_root=root, data_mode="topdown",
        ann_file="annotations.json", data_prefix=dict(img="images/"),
        pipeline=train_pipeline,
    ))
    # num_workers>1 forks persistent pipeline workers (datasets/loader.py);
    # data_samples skipped: the train step consumes only the dense arrays
    loader = DataLoader(
        ds, batch_size=batch, shuffle=True, num_workers=workers, prefetch=3,
        with_data_samples=False,
    )

    cfg = Config.fromfile(
        os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "configs/body_2d_keypoint/topdown_probmap/coco/td-pm_ProbPose-small_8xb64-210e_coco-256x192.py",
        )
    )
    # the recipe ships bf16 + tanh-GELU + auto fused_layers; for TRAINING
    # auto means the XLA graph (the measured winner: 1,787 crops/s / 0.337
    # MFU vs 1,759 / 0.310 with the vit_layer_train.py VJP kernel, v5e bf16
    # B=64). BENCH_FUSED=1 forces the differentiable kernel for A/B runs.
    if "BENCH_DTYPE" in os.environ:
        cfg.model["backbone"]["dtype"] = dtype
        cfg.model["backbone"]["approximate_gelu"] = dtype == "bfloat16"
        cfg.model["head"]["dtype"] = dtype
    if "BENCH_FUSED" in os.environ:
        cfg.model["backbone"]["fused_layers"] = os.environ["BENCH_FUSED"] == "1"
    model = PoseModel(cfg.model, metainfo=parse_pose_metainfo({"dataset_name": "coco"}))
    variables = model.init()
    tx, _ = build_optimizer(
        variables["params"], cfg.optim_wrapper, param_scheduler=cfg.param_scheduler,
        steps_per_epoch=100, max_epochs=cfg.train_cfg["max_epochs"],
    )
    mesh = make_mesh(n_data=1, devices=jax.devices()[:1])
    state = create_train_state(variables, tx)
    train_step = make_train_step(model, tx, mesh=mesh)
    key = jax.random.PRNGKey(0)

    def batches():
        epoch = 0
        while True:
            loader.set_epoch(epoch)
            for b in loader:
                b.pop("data_samples", None)
                yield shard_batch({k: jnp.asarray(v) for k, v in b.items()}, mesh)
            epoch += 1

    gen = batches()
    for _ in range(3):  # compile + warmup
        state, metrics = train_step(state, next(gen), key)
        _ = np.asarray(metrics["loss"])

    t0 = time.perf_counter()
    for _ in range(steps):
        state, metrics = train_step(state, next(gen), key)
    _ = np.asarray(metrics["loss"])
    dt = time.perf_counter() - t0
    train_crops = batch * steps / dt

    # device-only step rate on a resident batch — separates the chip's
    # capability from the host pipeline / transfer share of the e2e number
    resident = next(gen)
    state, metrics = train_step(state, resident, key)
    _ = np.asarray(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(10):
        state, metrics = train_step(state, resident, key)
    _ = np.asarray(metrics["loss"])
    device_rate = batch * 10 / (time.perf_counter() - t0)

    metric = "probpose_s_256x192_e2e_train_throughput"
    record = {
        "metric": metric,
        "value": round(train_crops, 1),
        "unit": "crops/sec/chip",
        "vs_baseline": round(train_crops / 1300.0, 3),  # VERDICT r2 bar: >=1.3k e2e bf16
        "dtype": dtype,
        "device_pipeline": device_pipeline,
        # report what actually ran: requesting the native path on a host
        # where the lib failed to build silently falls back to cv2
        "native_decode": bool(native and not canvas and _native_available()),
        "workers": workers,
        "device_step_crops_per_sec": round(device_rate, 1),
    }
    try:
        # MFU of the device step: XLA's own FLOP count for the compiled
        # program / v5e peak (197 bf16 TFLOP/s). Unavailable on backends
        # that don't surface cost analysis — omitted rather than guessed.
        cost = train_step.lower(state, resident, key).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
        if flops > 0:
            peak = 197e12 if dtype == "bfloat16" else 49e12
            record["device_step_mfu"] = round(flops * (device_rate / batch) / peak, 4)
            record["device_step_tflops"] = round(flops * (device_rate / batch) / 1e12, 1)
    except Exception:
        pass
    fused_tag = os.environ.get("BENCH_FUSED", "auto")
    record.update(_check_history(metric, train_crops, dtype=dtype, fused=fused_tag))
    # device-step rate is the chip-capability number the verdicts track —
    # record it under its own metric name (the e2e number above is host-bound
    # on single-core hosts)
    _check_history(
        "probpose_s_256x192_device_train_step", device_rate,
        dtype=dtype, fused=fused_tag,
        mfu=record.get("device_step_mfu"), batch=batch,
    )
    print(json.dumps(record))


def main_edpose_train():
    """EDPoseTPUHead training-step bench (BENCH_MODE=edpose).

    Measures the device step rate of the trainable DETR-family head at a
    production-ish geometry (R50 multi-scale + ChannelMapper-256, embed 256,
    100 queries, 2+2 decoder layers, DN groups, deep supervision) and — the
    VERDICT r4 #6 claim check — the cost share of the on-device exact
    Hungarian assignment (ops/lap.py) inside that step.

    Env: BENCH_BATCH (8), BENCH_SIZE (640), BENCH_STEPS (10).
    """
    import jax
    import jax.numpy as jnp

    _enable_compile_cache()

    from probpose_code_tpu.engine.optim import build_optimizer
    from probpose_code_tpu.models import PoseModel
    from probpose_code_tpu.ops.lap import hungarian_assign
    from probpose_code_tpu.parallel import create_train_state, make_mesh, make_train_step, shard_batch

    B = int(os.environ.get("BENCH_BATCH", "8"))
    S = int(os.environ.get("BENCH_SIZE", "640"))
    steps = int(os.environ.get("BENCH_STEPS", "10"))
    Q, G, K = 100, 14, 17

    cfg_model = dict(
        type="BottomupPoseEstimator",
        data_preprocessor=dict(type="PoseDataPreprocessor", mean=[0, 0, 0], std=[1, 1, 1]),
        backbone=dict(type="ResNet", depth=50, out_indices=(1, 2, 3)),
        neck=dict(type="ChannelMapper", in_channels=[512, 1024, 2048], out_channels=256),
        head=dict(type="EDPoseTPUHead", in_channels=256, num_keypoints=K,
                  embed_dims=256, num_queries=Q, num_human_layers=2,
                  num_keypoint_layers=2, num_heads=8, ffn_dim=1024),
        test_cfg=dict(input_size=(S, S), score_thr=0.0, nms_thr=0.65),
    )
    model = PoseModel(cfg_model)
    variables = model.init(input_shape=(1, S, S, 3))
    tx, _ = build_optimizer(
        variables["params"],
        dict(optimizer=dict(type="AdamW", lr=1e-4), clip_grad=dict(max_norm=0.1)),
    )
    mesh = make_mesh(n_data=1, devices=jax.devices()[:1])
    state = create_train_state(variables, tx)
    train_step = make_train_step(model, tx, mesh=mesh)

    rng = np.random.RandomState(0)
    xy = rng.rand(B, G, 2) * S * 0.6
    wh = rng.rand(B, G, 2) * S * 0.3 + 20
    gt_bboxes = np.concatenate([xy, xy + wh], -1).astype(np.float32)
    gt_kpts = (xy[:, :, None] + rng.rand(B, G, K, 2) * wh[:, :, None]).astype(np.float32)
    valid = np.zeros((B, G), bool)
    valid[:, :5] = True
    batch = shard_batch({
        "inputs": jnp.asarray(rng.rand(B, S, S, 3).astype(np.float32) * 255),
        "gt_bboxes": jnp.asarray(gt_bboxes),
        "gt_labels": jnp.zeros((B, G), jnp.int32),
        "gt_keypoints": jnp.asarray(gt_kpts),
        "gt_keypoints_visible": jnp.asarray((rng.rand(B, G, K) > 0.3).astype(np.float32)),
        "gt_vis_weights": jnp.ones((B, G, K), jnp.float32),
        "gt_areas": jnp.asarray((wh[..., 0] * wh[..., 1]).astype(np.float32)),
        "gt_valid": jnp.asarray(valid),
    }, mesh)
    key = jax.random.PRNGKey(0)

    for _ in range(2):  # compile + warmup
        state, metrics = train_step(state, batch, key)
        _ = np.asarray(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(steps):
        state, metrics = train_step(state, batch, key)
    _ = np.asarray(metrics["loss"])
    step_ms = (time.perf_counter() - t0) / steps * 1e3

    # Hungarian share: the solver alone on the step's (B, Q, G) cost shape
    hung = jax.jit(hungarian_assign)
    cost = jnp.asarray(rng.rand(B, Q, G).astype(np.float32))
    gv = jnp.asarray(valid.astype(np.float32))
    _ = np.asarray(hung(cost, gv))
    t0 = time.perf_counter()
    for _ in range(50):
        out = hung(cost, gv)
    _ = np.asarray(out)
    hung_ms = (time.perf_counter() - t0) / 50 * 1e3

    metric = "edpose_r50_640_device_train_step"
    rate = B / (step_ms / 1e3)
    record = {
        "metric": metric,
        "value": round(rate, 1),
        "unit": "img/sec/chip",
        "vs_baseline": 0.0,  # reference EDPose is inference-only: no train baseline
        "step_ms": round(step_ms, 2),
        "hungarian_ms": round(hung_ms, 3),
        "hungarian_share": round(hung_ms / step_ms, 4),
        "batch": B, "size": S,
    }
    try:
        cost_a = train_step.lower(state, batch, key).compile().cost_analysis()
        if isinstance(cost_a, (list, tuple)):
            cost_a = cost_a[0]
        flops = float(cost_a.get("flops", 0.0))
        if flops > 0:
            record["device_step_tflops"] = round(flops / (step_ms / 1e3) / 1e12, 1)
    except Exception:
        pass
    record.update(_check_history(
        metric, rate, batch=B, size=S,
        hungarian_share=record["hungarian_share"]))
    print(json.dumps(record))


if __name__ == "__main__":
    bench_mode = os.environ.get("BENCH_MODE", "infer")
    if bench_mode == "train":
        main_train()
    elif bench_mode == "edpose":
        main_edpose_train()
    else:
        main()
