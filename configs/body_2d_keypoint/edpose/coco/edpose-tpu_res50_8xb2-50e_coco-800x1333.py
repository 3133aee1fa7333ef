# ED-Pose, TPU-native trainable redesign (EDPoseTPUHead): deformable
# attention via XLA gathers, denoising query groups + Hungarian matching
# through pure_callback (heads/edpose_head.py) — the reference EDPose is
# inference-only, so this variant is what trains in this framework; the
# reference-architecture/checkpoint-compatible recipe is
# edpose_res50_8xb2-50e_coco-800x1333.py.
_base_ = ["../../../_base_/default_runtime.py"]

train_cfg = dict(max_epochs=50, val_interval=10)
optim_wrapper = dict(
    optimizer=dict(type="AdamW", lr=1e-4, weight_decay=1e-4),
    paramwise_cfg=dict(custom_keys=dict(backbone=dict(lr_mult=0.1))),
    clip_grad=dict(max_norm=0.1, norm_type=2),
)
param_scheduler = [dict(type="MultiStepLR", begin=0, end=50, milestones=[33], gamma=0.1, by_epoch=True)]
auto_scale_lr = dict(base_batch_size=16)

input_size = (800, 800)

model = dict(
    type="BottomupPoseEstimator",
    data_preprocessor=dict(
        type="PoseDataPreprocessor", mean=[123.675, 116.28, 103.53], std=[58.395, 57.12, 57.375], bgr_to_rgb=True
    ),
    backbone=dict(type="ResNet", depth=50, out_indices=(3,)),
    head=dict(
        type="EDPoseTPUHead",
        in_channels=2048,
        num_keypoints=17,
        embed_dims=256,
        num_queries=100,
        num_human_layers=2,
        num_keypoint_layers=2,
    ),
    test_cfg=dict(input_size=input_size, score_thr=0.1),
)

train_pipeline = [
    dict(type="LoadImage"),
    dict(type="BottomupRandomAffine", input_size=input_size),
    dict(type="RandomFlip", direction="horizontal"),
    dict(type="FilterAnnotations", by_kpt=True, by_box=True, keep_empty=False),
    dict(type="PackOneStageInputs"),
]
val_pipeline = [
    dict(type="LoadImage"),
    dict(type="BottomupResize", input_size=input_size),
    dict(type="PackOneStageInputs"),
]
data_root = "data/coco/"
train_dataloader = dict(
    batch_size=2, num_workers=4, sampler=dict(type="DefaultSampler", shuffle=True),
    dataset=dict(type="CocoDataset", data_root=data_root, data_mode="bottomup",
                 ann_file="annotations/person_keypoints_train2017.json",
                 data_prefix=dict(img="train2017/"), pipeline=train_pipeline),
)
val_dataloader = dict(
    batch_size=1, num_workers=4, drop_last=False,
    sampler=dict(type="DefaultSampler", shuffle=False, round_up=False),
    dataset=dict(type="CocoDataset", data_root=data_root, data_mode="bottomup",
                 ann_file="annotations/person_keypoints_val2017.json",
                 data_prefix=dict(img="val2017/"), test_mode=True, pipeline=val_pipeline),
)
test_dataloader = val_dataloader
val_evaluator = dict(type="CocoMetric", ann_file=data_root + "annotations/person_keypoints_val2017.json",
                     nms_mode="none", score_mode="bbox")
test_evaluator = val_evaluator
