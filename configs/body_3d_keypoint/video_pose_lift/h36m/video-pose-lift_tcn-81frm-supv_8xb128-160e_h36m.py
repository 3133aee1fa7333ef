# VideoPose3D: temporal dilated TCN lifting 2D keypoint sequences to 3D.
# TPU-native counterpart of the reference config of the same name.
_base_ = ["../../../_base_/default_runtime.py"]

train_cfg = dict(max_epochs=160, val_interval=10)
optim_wrapper = dict(optimizer=dict(type="Adam", lr=1e-3))
param_scheduler = [dict(type="ExponentialLR", gamma=0.975, end=80, by_epoch=True)]
auto_scale_lr = dict(base_batch_size=1024)

codec = dict(type="VideoPoseLifting", num_keypoints=17, zero_center=True, root_index=0)

model = dict(
    type="PoseLifter",
    backbone=dict(
        type="TCN",
        in_channels=2 * 17,
        stem_channels=1024,
        num_blocks=2,
        kernel_sizes=(3, 3, 3),
        dropout=0.25,
    ),
    head=dict(
        type="TemporalRegressionHead",
        in_channels=1024,
        num_joints=17,
        loss=dict(type="MPJPELoss"),
        decoder=codec,
    ),
)

train_pipeline = [
    dict(
        type="RandomFlipAroundRoot",
        keypoints_flip_cfg=dict(),
        target_flip_cfg=dict(),
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
    batch_size=128, num_workers=4, sampler=dict(type="DefaultSampler", shuffle=True),
    dataset=dict(type="Human36mDataset", data_root=data_root,
                 ann_file="annotation_body3d/fps50/h36m_train.npz",
                 seq_len=81, causal=False, keypoint_2d_src="gt",
                 camera_param_file="annotation_body3d/cameras.pkl",
                 pipeline=train_pipeline),
)
val_dataloader = dict(
    batch_size=128, num_workers=4, drop_last=False,
    sampler=dict(type="DefaultSampler", shuffle=False, round_up=False),
    dataset=dict(type="Human36mDataset", data_root=data_root,
                 ann_file="annotation_body3d/fps50/h36m_test.npz",
                 seq_len=81, causal=False, keypoint_2d_src="gt",
                 camera_param_file="annotation_body3d/cameras.pkl",
                 test_mode=True, pipeline=val_pipeline),
)
test_dataloader = val_dataloader
val_evaluator = [dict(type="MPJPE", mode="mpjpe"), dict(type="MPJPE", mode="p-mpjpe")]
test_evaluator = val_evaluator
