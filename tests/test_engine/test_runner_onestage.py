"""Runner end-to-end one-stage (RTMO) training on the 8-device CPU mesh."""

import numpy as np
import pytest

from probpose_code_tpu.engine.runner import Runner
from probpose_code_tpu.registry import DATASETS


@DATASETS.register_module()
class _TinyOneStageDataset:
    """Synthetic bottomup dataset emitting packed one-stage samples."""

    def __init__(self, n: int = 16, size: int = 96, **kwargs):
        rng = np.random.RandomState(0)
        self.items = []
        for _ in range(n):
            m = rng.randint(1, 3)
            self.items.append(dict(
                inputs=(rng.rand(size, size, 3) * 255).astype(np.float32),
                gt_bboxes=np.stack([rng.rand(m) * 30, rng.rand(m) * 30,
                                    50 + rng.rand(m) * 40, 50 + rng.rand(m) * 40], -1).astype(np.float32),
                gt_labels=np.zeros(m, np.int32),
                gt_keypoints=(rng.rand(m, 17, 2) * size).astype(np.float32),
                gt_keypoints_visible=np.ones((m, 17), np.float32),
                gt_vis_weights=np.ones((m, 17), np.float32),
                gt_areas=np.full(m, 2000.0, np.float32),
                img_meta={},
            ))

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        return self.items[i]

    @property
    def metainfo(self):
        from probpose_code_tpu.datasets.metainfo import parse_pose_metainfo

        return parse_pose_metainfo({"dataset_name": "coco"})


def _tiny_rtmo_model():
    return dict(
        type="BottomupPoseEstimator",
        data_preprocessor=dict(mean=[0, 0, 0], std=[1, 1, 1]),
        backbone=dict(type="CSPDarknet", deepen_factor=0.33, widen_factor=0.125, out_indices=(2, 3, 4)),
        neck=dict(type="HybridEncoder", in_channels=[32, 64, 128], deepen_factor=0.33, widen_factor=0.5,
                  hidden_dim=32, output_indices=[1, 2], feedforward_channels=64, num_heads=2,
                  projector_channels=32),
        head=dict(type="RTMOHead", num_keypoints=17, featmap_strides=(16, 32),
                  head_module_cfg=dict(num_classes=1, in_channels=32, cls_feat_channels=32,
                                       channels_per_group=16, pose_vec_channels=32,
                                       widen_factor=0.5, stacked_convs=1),
                  assigner=dict(type="SimOTAAssigner", dynamic_k_indicator="oks",
                                oks_calculator=dict(type="PoseOKS", metainfo="coco")),
                  prior_generator=dict(type="MlvlPointGenerator", centralize_points=True, strides=[16, 32]),
                  dcc_cfg=dict(in_channels=32, feat_channels=16, num_bins=(12, 12), spe_channels=16,
                               gau_cfg=dict(s=16, expansion_factor=2)),
                  loss_cls=dict(type="VariFocalLoss", reduction="sum", use_target_weight=True),
                  loss_bbox=dict(type="IoULoss", mode="square", reduction="sum", loss_weight=5.0),
                  loss_oks=dict(type="OKSLoss", reduction="none", metainfo="coco", loss_weight=30.0),
                  loss_vis=dict(type="BCELoss", use_target_weight=True, reduction="mean"),
                  loss_mle=dict(type="MLECCLoss", use_target_weight=True)),
        test_cfg=dict(input_size=(96, 96), score_thr=0.1, nms_pre=20),
    )


def test_runner_trains_rtmo_one_epoch(tmp_path):
    cfg = dict(
        model=_tiny_rtmo_model(),
        work_dir=str(tmp_path),
        train_cfg=dict(max_epochs=1, val_interval=10),
        optim_wrapper=dict(optimizer=dict(type="AdamW", lr=1e-3)),
        param_scheduler=[],
        train_dataloader=dict(batch_size=8, num_workers=1,
                              dataset=dict(type="_TinyOneStageDataset", n=16, size=96)),
        default_hooks=dict(checkpoint=dict(interval=100)),
    )
    from probpose_code_tpu.config import Config

    runner = Runner(Config(cfg))
    state = runner.train()
    assert int(state.step) == 2  # 16 samples / batch 8
