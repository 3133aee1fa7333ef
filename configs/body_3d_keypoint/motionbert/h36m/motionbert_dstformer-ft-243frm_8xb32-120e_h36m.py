# MotionBERT: DSTFormer dual-stream spatio-temporal transformer lifting 2D
# keypoint sequences to 3D (243-frame clips).
# TPU-native counterpart of the reference config
# configs/body_3d_keypoint/motionbert/h36m/motionbert_dstformer-243frm_8xb32-240e_h36m.py
_base_ = ["../../../_base_/default_runtime.py"]

train_cfg = dict(max_epochs=120, val_interval=10)

optim_wrapper = dict(optimizer=dict(type="AdamW", lr=2e-4, weight_decay=0.01))

param_scheduler = [dict(type="ExponentialLR", gamma=0.99, end=120, by_epoch=True)]

auto_scale_lr = dict(base_batch_size=512)

codec = dict(
    type="MotionBERTLabel", num_keypoints=17, concat_vis=True, rootrel=True, mode="train"
)

model = dict(
    type="PoseLifter",
    backbone=dict(
        type="DSTFormer",
        in_channels=3,
        feat_size=512,
        depth=5,
        num_heads=8,
        mlp_ratio=2,
        seq_len=243,
        num_joints=17,
        init_cfg=dict(type="Pretrained", checkpoint="checkpoints/motionbert_pretrain.ckpt"),
    ),
    head=dict(
        type="MotionRegressionHead",
        in_channels=512,
        out_channels=3,
        embedding_size=512,
        loss=dict(type="MPJPEVelocityJointLoss"),
        decoder=codec,
    ),
)

train_pipeline = [
    dict(type="GenerateTarget", encoder=codec),
    dict(
        type="RandomFlipAroundRoot",
        keypoints_flip_cfg=dict(center_mode="static", center_x=0.0),
        target_flip_cfg=dict(center_mode="static", center_x=0.0),
        flip_label=True,
    ),
    dict(type="PackPoseInputs", meta_keys=("id", "category_id", "target_img_path", "flip_indices", "factor", "camera_param")),
]
val_pipeline = [
    dict(type="GenerateTarget", encoder=codec),
    dict(type="PackPoseInputs", meta_keys=("id", "category_id", "target_img_path", "flip_indices", "factor", "camera_param")),
]

data_root = "data/h36m/"
train_dataloader = dict(
    batch_size=32,
    num_workers=4,
    sampler=dict(type="DefaultSampler", shuffle=True),
    dataset=dict(
        type="Human36mDataset",
        data_root=data_root,
        ann_file="annotation_body3d/fps50/h36m_train.npz",
        seq_len=1,
        multiple_target=243,
        multiple_target_step=81,
        camera_param_file="annotation_body3d/cameras.pkl",
        pipeline=train_pipeline,
    ),
)
val_dataloader = dict(
    batch_size=32,
    num_workers=4,
    drop_last=False,
    sampler=dict(type="DefaultSampler", shuffle=False, round_up=False),
    dataset=dict(
        type="Human36mDataset",
        data_root=data_root,
        ann_file="annotation_body3d/fps50/h36m_test.npz",
        seq_len=1,
        multiple_target=243,
        multiple_target_step=243,
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
