"""Human36mDataset sequence construction on a synthetic npz bundle."""

import os

import numpy as np

from probpose_code_tpu.datasets import Human36mDataset


def _make_npz(tmp_path, n=40):
    rng = np.random.RandomState(0)
    imgname = np.array([f"S1_Walking_1.54138969_{i:06d}.jpg" for i in range(n // 2)] +
                       [f"S1_Eating_1.54138969_{i:06d}.jpg" for i in range(n // 2)])
    path = os.path.join(str(tmp_path), "h36m_test.npz")
    np.savez(path, imgname=imgname,
             S=rng.rand(n, 17, 4).astype(np.float32),
             part=rng.rand(n, 17, 3).astype(np.float32),
             center=rng.rand(n, 2).astype(np.float32) * 400,
             scale=rng.rand(n).astype(np.float32) * 3)
    return path


def test_h36m_padded_sequences(tmp_path):
    path = _make_npz(tmp_path)
    ds = Human36mDataset(ann_file=path, seq_len=27, causal=False, pad_video_seq=True, pipeline=[])
    assert len(ds) == 40  # one sequence per frame when padded
    s = ds.get_data_info(0)
    assert s["keypoints"].shape == (27, 17, 2)
    assert s["lifting_target"].shape == (17, 3)


def test_h36m_action_breakdown_through_pipeline(tmp_path):
    """The MPJPE per-action breakdown must work through the REAL path:
    dataset ``target_img_path`` -> PackPoseInputs meta_keys (as written by the
    reference lifting recipes) -> metric. Guards the round-3 regression where
    the dataset never emitted the key and the metric silently produced no
    ``MPJPE_<action>`` entries."""
    from probpose_code_tpu.evaluation.metrics.keypoint_3d_metrics import MPJPE

    # the reference val pipeline for every lifting recipe
    pipeline = [
        dict(type="GenerateTarget",
             encoder=dict(type="VideoPoseLifting", num_keypoints=17,
                          zero_center=True, root_index=0)),
        dict(type="PackPoseInputs", meta_keys=("id", "category_id",
                                               "target_img_path",
                                               "flip_indices", "target_root")),
    ]
    path = _make_npz(tmp_path)
    ds = Human36mDataset(ann_file=path, seq_len=1, causal=False, pipeline=pipeline)
    assert ds.get_data_info(0)["target_img_path"]
    metric = MPJPE(mode="mpjpe")
    for i in range(len(ds)):
        sample = ds[i]["data_samples"]
        gt = np.asarray(sample.gt_instances["lifting_target"])
        sample.pred_instances = dict(keypoints=gt[None] + 0.01)
        metric.process(None, [sample])
    res = metric.evaluate(len(ds))
    assert "mpjpe/MPJPE_Walking" in res, res.keys()
    assert "mpjpe/MPJPE_Eating" in res, res.keys()


def test_h36m_videos_not_mixed(tmp_path):
    path = _make_npz(tmp_path)
    ds = Human36mDataset(ann_file=path, seq_len=9, causal=True, pipeline=[])
    for info in ds.data_list:
        subjects = {p.split(".")[0] for p in info["img_paths"]}
        assert len(subjects) == 1  # never crosses video boundaries


def test_runner_lifter_train_and_val(tmp_path):
    """PoseLifter end-to-end through the Runner: H36M-style npz -> lifting
    pipeline -> sharded train epoch -> runner.val() with the MPJPE metric
    (guards the gap where make_predict had no lifter branch at all)."""
    import pytest

    pytest.importorskip("orbax.checkpoint")
    from probpose_code_tpu.config import Config
    from probpose_code_tpu.engine import Runner

    codec = dict(type="VideoPoseLifting", num_keypoints=17, zero_center=True, root_index=0)
    pipeline = [
        dict(type="GenerateTarget", encoder=codec),
        dict(type="PackPoseInputs", meta_keys=("id", "category_id", "target_img_path",
                                               "flip_indices", "target_root")),
    ]
    path = _make_npz(tmp_path)
    dataset = dict(type="Human36mDataset", ann_file=path, seq_len=9, causal=False,
                   pipeline=pipeline)
    cfg = Config.fromdict(dict(
        work_dir=str(tmp_path / "work_lift"),
        model=dict(
            type="PoseLifter",
            backbone=dict(type="TCN", in_channels=2 * 17, stem_channels=64,
                          num_blocks=1, kernel_sizes=(3, 3), dropout=0.1),
            head=dict(type="TemporalRegressionHead", in_channels=64, num_joints=17,
                      loss=dict(type="MPJPELoss"), decoder=codec),
        ),
        train_cfg=dict(max_epochs=1, val_interval=1),
        optim_wrapper=dict(optimizer=dict(type="Adam", lr=1e-3)),
        env_cfg=dict(mesh=dict(data=2, model=1)),
        default_hooks=dict(logger=dict(interval=4), checkpoint=dict(interval=5)),
        train_dataloader=dict(batch_size=4, num_workers=2, dataset=dataset),
        val_dataloader=dict(batch_size=4, num_workers=2, dataset={**dataset, "test_mode": True}),
        val_evaluator=dict(type="MPJPE", mode="mpjpe"),
    ))
    runner = Runner.from_cfg(cfg)
    runner.train()
    metrics = runner.val()
    assert "mpjpe/MPJPE" in metrics and np.isfinite(metrics["mpjpe/MPJPE"])
    # the per-action breakdown flows through the real packed meta
    assert any(k.startswith("mpjpe/MPJPE_") for k in metrics), metrics.keys()
