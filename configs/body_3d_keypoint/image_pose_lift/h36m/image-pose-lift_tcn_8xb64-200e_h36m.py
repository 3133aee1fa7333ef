# SimpleBaseline3D: single-frame FC-residual lifting of 2D keypoints to 3D
# (TCN with kernel size 1 = fully-connected residual blocks).
# TPU-native counterpart of the reference config
# configs/body_3d_keypoint/image_pose_lift/h36m/image-pose-lift_tcn_8xb64-200e_h36m.py
_base_ = ["../../../_base_/default_runtime.py"]

train_cfg = dict(max_epochs=200, val_interval=10)

optim_wrapper = dict(optimizer=dict(type="Adam", lr=1e-3))

param_scheduler = [dict(type="StepLR", step_size=100000, gamma=0.96, end=80, by_epoch=False)]

auto_scale_lr = dict(base_batch_size=512)

codec = dict(
    type="ImagePoseLifting", num_keypoints=17, root_index=0, remove_root=True
)

model = dict(
    type="PoseLifter",
    backbone=dict(
        type="TCN",
        in_channels=2 * 17,
        stem_channels=1024,
        num_blocks=2,
        kernel_sizes=(1, 1, 1),
        dropout=0.5,
    ),
    head=dict(
        type="TemporalRegressionHead",
        in_channels=1024,
        num_joints=16,
        loss=dict(type="MSELoss"),
        decoder=codec,
    ),
)

train_pipeline = [
    dict(type="GenerateTarget", encoder=codec),
    dict(type="PackPoseInputs", meta_keys=(
            "id",
            "category_id",
            "target_img_path",
            "flip_indices",
            "target_root",
            "target_root_index",
            "target_mean",
            "target_std",
        )),
]
val_pipeline = train_pipeline

data_root = "data/h36m/"
train_dataloader = dict(
    batch_size=64,
    num_workers=4,
    sampler=dict(type="DefaultSampler", shuffle=True),
    dataset=dict(
        type="Human36mDataset",
        data_root=data_root,
        ann_file="annotation_body3d/fps50/h36m_train.npz",
        seq_len=1,
        keypoint_2d_src="gt",
        camera_param_file="annotation_body3d/cameras.pkl",
        pipeline=train_pipeline,
    ),
)
val_dataloader = dict(
    batch_size=64,
    num_workers=4,
    drop_last=False,
    sampler=dict(type="DefaultSampler", shuffle=False, round_up=False),
    dataset=dict(
        type="Human36mDataset",
        data_root=data_root,
        ann_file="annotation_body3d/fps50/h36m_test.npz",
        seq_len=1,
        keypoint_2d_src="gt",
        camera_param_file="annotation_body3d/cameras.pkl",
        test_mode=True,
        pipeline=val_pipeline,
    ),
)
test_dataloader = val_dataloader

val_evaluator = [
    dict(type="MPJPE", mode="mpjpe"),
    dict(type="MPJPE", mode="p-mpjpe"),
]
test_evaluator = val_evaluator
