# InterNet (ResNet-50 + 3D heatmap volume + root depth + handedness) on
# InterHand2.6M 256x256.
# TPU-native counterpart of the reference config
# configs/hand_3d_keypoint/internet/interhand3d/internet_res50_4xb16-20e_interhand3d-256x256.py
_base_ = ["../../../_base_/default_runtime.py"]

train_cfg = dict(max_epochs=20, val_interval=1)

optim_wrapper = dict(optimizer=dict(type="Adam", lr=2e-4))

param_scheduler = [
    dict(type="MultiStepLR", begin=0, end=20, milestones=[15, 17], gamma=0.1, by_epoch=True),
]

auto_scale_lr = dict(base_batch_size=128)

codec = dict(
    type="Hand3DHeatmap",
    image_size=(256, 256),
    root_heatmap_size=64,
    heatmap_size=(64, 64, 64),
    sigma=2.5,
    max_bound=255,
    depth_size=64,
)

model = dict(
    type="TopdownPoseEstimator",
    data_preprocessor=dict(
        type="PoseDataPreprocessor", mean=[123.675, 116.28, 103.53], std=[58.395, 57.12, 57.375], bgr_to_rgb=True
    ),
    backbone=dict(type="ResNet", depth=50, out_indices=(3,)),
    head=dict(
        type="InternetHead",
        in_channels=2048,
        num_keypoints=42,
        depth_size=codec["depth_size"],
        root_heatmap_size=codec["root_heatmap_size"],
        decoder=codec,
    ),
    test_cfg=dict(flip_test=False, input_size=(256, 256)),
)

train_pipeline = [
    dict(type="LoadImage"),
    dict(type="GetBBoxCenterScale"),
    dict(type="HandRandomFlip", prob=0.5),
    dict(type="RandomBBoxTransform", rotate_factor=90.0),
    dict(type="TopdownAffine", input_size=codec["image_size"]),
    dict(type="GenerateTarget", encoder=codec),
    dict(type="PackPoseInputs"),
]
val_pipeline = [
    dict(type="LoadImage"),
    dict(type="GetBBoxCenterScale"),
    dict(type="TopdownAffine", input_size=codec["image_size"]),
    dict(type="PackPoseInputs"),
]

data_root = "data/interhand2.6m/"
train_dataloader = dict(
    batch_size=16,
    num_workers=2,
    sampler=dict(type="DefaultSampler", shuffle=True),
    dataset=dict(
        type="InterHand3DDataset",
        data_root=data_root,
        data_mode="topdown",
        ann_file="annotations/all/InterHand2.6M_train_data.json",
        camera_param_file="annotations/all/InterHand2.6M_train_camera.json",
        joint_file="annotations/all/InterHand2.6M_train_joint_3d.json",
        use_gt_root_depth=True,
        data_prefix=dict(img="images/train/"),
        pipeline=train_pipeline,
    ),
)
val_dataloader = dict(
    batch_size=16,
    num_workers=2,
    drop_last=False,
    sampler=dict(type="DefaultSampler", shuffle=False, round_up=False),
    dataset=dict(
        type="InterHand3DDataset",
        data_root=data_root,
        data_mode="topdown",
        ann_file="annotations/machine_annot/InterHand2.6M_val_data.json",
        camera_param_file="annotations/machine_annot/InterHand2.6M_val_camera.json",
        joint_file="annotations/machine_annot/InterHand2.6M_val_joint_3d.json",
        use_gt_root_depth=True,
        test_mode=True,
        data_prefix=dict(img="images/val/"),
        pipeline=val_pipeline,
    ),
)
test_dataloader = val_dataloader

val_evaluator = dict(type="InterHandMetric", modes=["MPJPE", "MRRPE", "HandednessAcc"])
test_evaluator = val_evaluator
