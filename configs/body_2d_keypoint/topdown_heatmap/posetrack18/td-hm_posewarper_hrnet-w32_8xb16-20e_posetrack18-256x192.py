# PoseWarper: multi-frame pose estimation on PoseTrack18 video clips —
# HRNet backbone per frame, deformable-offset temporal alignment of the
# supporting frames onto the key frame, heatmap head on the aggregate.
# TPU-native counterpart of the reference config
# configs/body_2d_keypoint/topdown_heatmap/posetrack18/td-hm_posewarper_hrnet-w48_8xb16-20e_posetrack18-384x288.py
# (HRNet-w32 at 256x192 here).
_base_ = ["../../../_base_/default_runtime.py"]

train_cfg = dict(max_epochs=20, val_interval=1)

optim_wrapper = dict(optimizer=dict(type="Adam", lr=1e-4))

param_scheduler = [
    dict(type="MultiStepLR", begin=0, end=20, milestones=[10, 15], gamma=0.1, by_epoch=True),
]

auto_scale_lr = dict(base_batch_size=128)

codec = dict(type="MSRAHeatmap", input_size=(192, 256), heatmap_size=(48, 64), sigma=2)

model = dict(
    type="TopdownPoseEstimator",
    data_preprocessor=dict(
        type="PoseDataPreprocessor", mean=[123.675, 116.28, 103.53], std=[58.395, 57.12, 57.375], bgr_to_rgb=True
    ),
    backbone=dict(
        type="HRNet",
        in_channels=3,
        extra=dict(
            stage1=dict(num_modules=1, num_branches=1, block="BOTTLENECK", num_blocks=(4,), num_channels=(64,)),
            stage2=dict(num_modules=1, num_branches=2, block="BASIC", num_blocks=(4, 4), num_channels=(32, 64)),
            stage3=dict(num_modules=4, num_branches=3, block="BASIC", num_blocks=(4, 4, 4), num_channels=(32, 64, 128)),
            stage4=dict(
                num_modules=3, num_branches=4, block="BASIC", num_blocks=(4, 4, 4, 4), num_channels=(32, 64, 128, 256)
            ),
        ),
    ),
    neck=dict(type="PoseWarperNeck", in_channels=32, out_channels=32, inner_channels=128),
    head=dict(
        type="HeatmapHead",
        in_channels=32,
        out_channels=17,
        deconv_out_channels=None,
        final_layer=dict(kernel_size=1),
        loss=dict(type="KeypointMSELoss", use_target_weight=True),
        decoder=codec,
    ),
    test_cfg=dict(flip_test=False),
)

train_pipeline = [
    dict(type="LoadImage"),
    dict(type="GetBBoxCenterScale"),
    dict(type="RandomBBoxTransform", rotate_factor=45),
    dict(type="TopdownAffine", input_size=codec["input_size"]),
    dict(type="GenerateTarget", encoder=codec),
    dict(type="PackPoseInputs"),
]
val_pipeline = [
    dict(type="LoadImage"),
    dict(type="GetBBoxCenterScale"),
    dict(type="TopdownAffine", input_size=codec["input_size"]),
    dict(type="PackPoseInputs"),
]

data_root = "data/posetrack18/"
train_dataloader = dict(
    batch_size=16,
    num_workers=2,
    sampler=dict(type="DefaultSampler", shuffle=True),
    dataset=dict(
        type="PoseTrack18VideoDataset",
        data_root=data_root,
        data_mode="topdown",
        ann_file="annotations/posetrack18_train.json",
        frame_weights=[0.0, 1.0],
        frame_sampler_mode="random",
        frame_range=2,
        num_sampled_frame=1,
        pipeline=train_pipeline,
    ),
)
val_dataloader = dict(
    batch_size=16,
    num_workers=2,
    drop_last=False,
    sampler=dict(type="DefaultSampler", shuffle=False, round_up=False),
    dataset=dict(
        type="PoseTrack18VideoDataset",
        data_root=data_root,
        data_mode="topdown",
        ann_file="annotations/posetrack18_val.json",
        frame_weights=[0.3, 0.1, 0.25, 0.25, 0.1],
        frame_sampler_mode="fixed",
        frame_indices=[-2, -1, 0, 1, 2],
        test_mode=True,
        pipeline=val_pipeline,
    ),
)
test_dataloader = val_dataloader

val_evaluator = dict(type="PoseTrack18Metric", ann_file=data_root + "annotations/posetrack18_val.json")
test_evaluator = val_evaluator
