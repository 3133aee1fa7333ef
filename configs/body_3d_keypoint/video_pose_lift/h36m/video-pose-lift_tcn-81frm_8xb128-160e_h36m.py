# video-pose-lift_tcn-81frm_8xb128-160e_h36m
# TPU-native counterpart of the reference recipe of the same name
# (/root/reference/configs/body_3d_keypoint/video_pose_lift/h36m/).
_base_ = ["../../../_base_/default_runtime.py"]

train_cfg = dict(max_epochs=160, val_interval=10)

optim_wrapper = dict(optimizer=dict(type="Adam", lr=1e-3))

param_scheduler = [
    dict(type="ExponentialLR", gamma=0.975, by_epoch=True, end=80),
]

auto_scale_lr = dict(base_batch_size=1024)

default_hooks = dict(checkpoint=dict(save_best="MPJPE", rule="less"))

codec = dict(type="VideoPoseLifting", num_keypoints=17, zero_center=True, normalize_camera=True)

model = dict(
    type="PoseLifter",
    backbone=dict(
        type="TCN",
        in_channels=2 * 17,
        stem_channels=1024,
        num_blocks=3,
        kernel_sizes=(3,) * (3 + 1),
        dropout=0.25,
        use_stride_conv=True,
    ),
    head=dict(
        type="TemporalRegressionHead",
        in_channels=1024,
        num_joints=17,
        loss=dict(type="MPJPELoss", use_target_weight=True),
        decoder=codec,
    ),
)

train_pipeline = [
    dict(
        type="RandomFlipAroundRoot",
        keypoints_flip_cfg=dict(center_mode="static", center_x=0.0),
        target_flip_cfg=dict(center_mode="static", center_x=0.0),
        flip_prob=0.5,
        flip_camera=True,
    ),
    dict(type="GenerateTarget", encoder=codec),
    dict(type="PackPoseInputs", meta_keys=("id", "category_id", "target_img_path", "flip_indices", "target_root")),
]
val_pipeline = [
    dict(type="GenerateTarget", encoder=codec),
    dict(type="PackPoseInputs", meta_keys=("id", "category_id", "target_img_path", "flip_indices", "target_root")),
]

data_root = "data/h36m/"
train_dataloader = dict(
    batch_size=128,
    num_workers=2,
    sampler=dict(type="DefaultSampler", shuffle=True),
    dataset=dict(
        type="Human36mDataset",
        ann_file=data_root + "annotation_body3d/fps50/h36m_train.npz",
        seq_len=81,
        causal=False,
        pad_video_seq=True,
        camera_param_file=data_root + "annotation_body3d/cameras.pkl",
        data_root=data_root,
        data_prefix=dict(img="images/"),
        pipeline=train_pipeline,
    ),
)
val_dataloader = dict(
    batch_size=128,
    num_workers=2,
    drop_last=False,
    sampler=dict(type="DefaultSampler", shuffle=False, round_up=False),
    dataset=dict(
        type="Human36mDataset",
        ann_file=data_root + "annotation_body3d/fps50/h36m_test.npz",
        seq_len=81,
        causal=False,
        pad_video_seq=True,
        camera_param_file=data_root + "annotation_body3d/cameras.pkl",
        data_root=data_root,
        data_prefix=dict(img="images/"),
        test_mode=True,
        pipeline=val_pipeline,
    ),
)
test_dataloader = val_dataloader

val_evaluator = [dict(type="MPJPE", mode="mpjpe"), dict(type="MPJPE", mode="p-mpjpe")]
test_evaluator = val_evaluator
