"""End-to-end Runner test: train a tiny ProbPose on mini-COCO + validate.

This exercises the full reference recipe shape: config -> Runner -> sharded
train epochs -> checkpoint -> val loop with CocoMetric (classic + Ex-OKS).
"""

import json

import numpy as np
import pytest

from probpose_code_tpu.config import Config
from probpose_code_tpu.engine import Runner

pytest.importorskip("orbax.checkpoint")


@pytest.fixture(scope="module")
def mini_coco(tmp_path_factory):
    import sys

    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent.parent))
    from test_datasets.test_coco_pipeline import mini_coco as _fixture  # noqa: F401

    # re-create the dataset inline (fixtures aren't importable across dirs)
    import cv2

    root = tmp_path_factory.mktemp("minicoco_runner")
    img_dir = root / "images"
    img_dir.mkdir()
    rng = np.random.RandomState(7)
    images, annotations = [], []
    ann_id = 1
    for img_id in range(1, 7):
        h, w = 256, 320
        img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        fname = f"{img_id:06d}.jpg"
        cv2.imwrite(str(img_dir / fname), img)
        images.append(dict(id=img_id, file_name=fname, width=w, height=h))
        for _ in range(2):
            x, y = rng.randint(10, w // 2), rng.randint(10, h // 2)
            bw, bh = rng.randint(60, 120), rng.randint(80, 140)
            kpts, nk = [], 0
            for k in range(17):
                kx, ky = x + rng.rand() * bw, y + rng.rand() * bh
                v = int(rng.choice([0, 1, 2], p=[0.15, 0.25, 0.6]))
                nk += v > 0
                kpts.extend([float(kx), float(ky), v])
            annotations.append(
                dict(id=ann_id, image_id=img_id, category_id=1,
                     bbox=[float(x), float(y), float(bw), float(bh)],
                     area=float(bw * bh), iscrowd=0, keypoints=kpts, num_keypoints=int(nk))
            )
            ann_id += 1
    ds = dict(images=images, annotations=annotations,
              categories=[dict(id=1, name="person")])
    ann_file = root / "annotations.json"
    ann_file.write_text(json.dumps(ds))
    return dict(ann_file=str(ann_file), img_dir=str(img_dir))


def make_cfg(mini_coco, work_dir):
    from tests.test_models.test_probpose_model import TINY_PROBPOSE_CFG

    codec = dict(type="ProbMap", input_size=(192, 256), heatmap_size=(48, 64), sigma=-1)
    train_pipeline = [
        dict(type="LoadImage"),
        dict(type="GetBBoxCenterScale"),
        dict(type="RandomFlip", direction="horizontal"),
        dict(type="TopdownAffine", input_size=(192, 256), use_udp=True, input_padding=1.25),
        dict(type="GenerateTarget", encoder=codec),
        dict(type="PackPoseInputs"),
    ]
    val_pipeline = [
        dict(type="LoadImage"),
        dict(type="GetBBoxCenterScale"),
        dict(type="TopdownAffine", input_size=(192, 256), use_udp=True, input_padding=1.25),
        dict(type="PackPoseInputs"),
    ]
    dataset = dict(
        type="CocoDataset",
        ann_file=mini_coco["ann_file"],
        data_mode="topdown",
        data_prefix=dict(img=mini_coco["img_dir"]),
        pipeline=train_pipeline,
    )
    val_dataset = {**dataset, "pipeline": val_pipeline, "test_mode": True}
    return Config.fromdict(
        dict(
            work_dir=str(work_dir),
            model=TINY_PROBPOSE_CFG,
            train_cfg=dict(max_epochs=2, val_interval=2),
            optim_wrapper=dict(
                optimizer=dict(type="AdamW", lr=1e-3, weight_decay=0.01),
                clip_grad=dict(max_norm=1.0),
            ),
            param_scheduler=[
                dict(type="LinearLR", begin=0, end=3, start_factor=0.1, by_epoch=False),
            ],
            env_cfg=dict(mesh=dict(data=4, model=1)),
            default_hooks=dict(logger=dict(interval=1), checkpoint=dict(interval=2, save_best="COCO/AP")),
            train_dataloader=dict(batch_size=4, num_workers=2, dataset=dataset),
            val_dataloader=dict(batch_size=4, num_workers=2, dataset=val_dataset),
            val_evaluator=dict(
                type="CocoMetric",
                ann_file=mini_coco["ann_file"],
                prefix="COCO",
                extended=[False, True],
                score_thresh_type="prob",
                keypoint_score_thr=0.45,
            ),
        )
    )


def test_runner_train_and_val(mini_coco, tmp_path):
    cfg = make_cfg(mini_coco, tmp_path / "work")
    runner = Runner.from_cfg(cfg)
    state = runner.train()
    assert int(state.step) == 2 * len(runner.train_loader)

    # checkpoint written
    import os

    files = os.listdir(runner.work_dir)
    assert any(f.startswith("epoch_2") for f in files), files

    # val produced COCO metrics incl. Ex-OKS names
    metrics = runner.val()
    assert "COCO/AP" in metrics
    assert "COCO/Ex_AP" in metrics


def test_runner_custom_hooks_protocol(mini_coco, tmp_path):
    """The reference training protocol every RTMPose-style recipe writes:
    EMAHook (ExpMomentumEMA, update_buffers) + PipelineSwitchHook swapping
    to a stage-2 pipeline partway through. Exercises the donated-buffer
    safety of the EMA seed and the live pipeline swap."""
    cfg = make_cfg(mini_coco, tmp_path / "work_hooks")
    stage2 = [
        dict(type="LoadImage"),
        dict(type="GetBBoxCenterScale"),
        dict(type="TopdownAffine", input_size=(192, 256), use_udp=True, input_padding=1.25),
        dict(type="GenerateTarget", encoder=dict(type="ProbMap", input_size=(192, 256),
                                                 heatmap_size=(48, 64), sigma=-1)),
        dict(type="PackPoseInputs"),
    ]
    cfg["custom_hooks"] = [
        dict(type="EMAHook", ema_type="ExpMomentumEMA", momentum=0.1, gamma=4,
             update_buffers=True, priority=49),
        dict(type="PipelineSwitchHook", switch_epoch=1, switch_pipeline=stage2),
    ]
    runner = Runner.from_cfg(cfg)
    runner.train()

    ema = runner.hooks[0]
    assert ema.ema_params is not None
    import jax
    import numpy as np

    # EMA tree mirrors the live params and holds finite values
    live = jax.tree_util.tree_leaves(runner.state.params)
    tracked = jax.tree_util.tree_leaves(ema.ema_params)
    assert len(live) == len(tracked)
    assert all(np.isfinite(np.asarray(t)).all() for t in tracked)
    # the pipeline switch actually replaced the train pipeline (no RandomFlip)
    names = [type(t).__name__ for t in runner.train_loader.dataset.pipeline.transforms]
    assert "RandomFlip" not in names

    # EMA weights were actually APPLIED: the saved checkpoint holds the EMA
    # params (reference EMAHook swaps EMA in around val/checkpoint), which
    # after training differ from the live params and match the hook's tree.
    import os

    from probpose_code_tpu.engine.checkpoint import load_checkpoint

    ckpts = sorted(f[: -len(".orbax")] for f in os.listdir(runner.work_dir)
                   if f.startswith("epoch_") and f.endswith(".orbax"))
    saved = load_checkpoint(os.path.join(runner.work_dir, ckpts[-1]))
    saved_leaves = jax.tree_util.tree_leaves(saved["params"])
    ema_leaves = jax.tree_util.tree_leaves(ema.ema_params)
    for s, e in zip(saved_leaves, ema_leaves):
        np.testing.assert_allclose(np.asarray(s), np.asarray(e), rtol=1e-6)
    # live params were restored after the swap (training can continue)
    assert any(
        not np.allclose(np.asarray(l), np.asarray(e))
        for l, e in zip(live, ema_leaves)
    )


def test_runner_profiler_hook_e2e(mini_coco, tmp_path):
    """ProfilerHook wired through a real training run writes a device trace
    under work_dir/profiler_trace (SURVEY §5 tracing subsystem)."""
    import os

    cfg = make_cfg(mini_coco, tmp_path / "work_prof")
    cfg["custom_hooks"] = [dict(type="ProfilerHook", begin_iter=1, num_iters=1)]
    runner = Runner.from_cfg(cfg)
    runner.train()
    trace_root = os.path.join(runner.work_dir, "profiler_trace")
    found = [fn for _, _, fns in os.walk(trace_root) for fn in fns]
    assert found, "profiler trace missing"
