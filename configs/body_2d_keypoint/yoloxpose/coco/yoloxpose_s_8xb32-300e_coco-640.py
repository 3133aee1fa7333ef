# YOLOX-Pose-s: one-stage multi-person pose estimation (CSPDarknet +
# YOLOXPAFPN + YOLOXPoseHead).
# TPU-native counterpart of the reference config of the same name.
_base_ = ["../../../_base_/default_runtime.py"]

input_size = (640, 640)
metafile = "coco"

max_epochs = 300
stage2_num_epochs = 20
base_lr = 4e-3

train_cfg = dict(max_epochs=max_epochs, val_interval=20, dynamic_intervals=[(280, 1)])

optim_wrapper = dict(
    optimizer=dict(type="AdamW", lr=base_lr, weight_decay=0.05),
    paramwise_cfg=dict(
        norm_decay_mult=0,
        bias_decay_mult=0,
        custom_keys=dict({"neck.encoder": dict(lr_mult=0.05)}),
    ),
    clip_grad=dict(max_norm=0.1, norm_type=2),
)

param_scheduler = [
    dict(type="QuadraticWarmupLR", by_epoch=True, begin=0, end=5, convert_to_iter_based=True),
    dict(
        type="CosineAnnealingLR",
        eta_min=base_lr * 0.05,
        begin=max_epochs // 2,
        end=max_epochs - stage2_num_epochs,
        T_max=max_epochs // 2,
        by_epoch=True,
        convert_to_iter_based=True,
    ),
    dict(type="ConstantLR", by_epoch=True, factor=1, begin=max_epochs - stage2_num_epochs, end=max_epochs),
]

auto_scale_lr = dict(base_batch_size=256)

# model
widen_factor = 0.5
deepen_factor = 0.33

model = dict(
    type="BottomupPoseEstimator",
    data_preprocessor=dict(
        type="PoseDataPreprocessor",
        pad_size_divisor=32,
        mean=[0, 0, 0],
        std=[1, 1, 1],
        batch_augments=[
            dict(type="BatchSyncRandomResize", random_size_range=(480, 800), size_divisor=32, interval=1),
        ],
    ),
    backbone=dict(
        type="CSPDarknet",
        deepen_factor=deepen_factor,
        widen_factor=widen_factor,
        out_indices=(2, 3, 4),
        spp_kernal_sizes=(5, 9, 13),
    ),
    neck=dict(
        type="YOLOXPAFPN",
        in_channels=[128, 256, 512],
        out_channels=128,
        num_csp_blocks=1,
    ),
    head=dict(
        type="YOLOXPoseHead",
        num_keypoints=17,
        featmap_strides=(8, 16, 32),
        head_module_cfg=dict(
            num_classes=1,
            in_channels=128,
            feat_channels=128,
            widen_factor=1.0,
            stacked_convs=2,
        ),
        assigner=dict(
            type="SimOTAAssigner",
            dynamic_k_indicator="oks",
            oks_calculator=dict(type="PoseOKS", metainfo=metafile),
        ),
        prior_generator=dict(type="MlvlPointGenerator", offset=0, strides=[8, 16, 32]),
        loss_cls=dict(type="BCELoss", reduction="sum", loss_weight=1.0),
        loss_obj=dict(type="BCELoss", reduction="sum", loss_weight=1.0),
        loss_bbox=dict(type="IoULoss", mode="square", eps=1e-16, reduction="sum", loss_weight=5.0),
        loss_oks=dict(type="OKSLoss", metainfo=metafile, loss_weight=30.0),
        loss_vis=dict(type="BCELoss", use_target_weight=True, loss_weight=1.0),
    ),
    test_cfg=dict(input_size=input_size, score_thr=0.01, nms_thr=0.65, nms_pre=300),
)

# hooks (RTMO two-stage training schedule)
custom_hooks = [
    dict(type="YOLOXPoseModeSwitchHook", num_last_epochs=stage2_num_epochs, priority=48),
    dict(type="EMAHook", ema_type="ExpMomentumEMA", momentum=0.0002, update_buffers=True, priority=49),
]

# pipelines
train_pipeline_stage1 = [
    dict(type="LoadImage"),
    dict(type="Mosaic", img_scale=(640, 640), pad_val=114.0),
    dict(
        type="BottomupRandomAffine",
        input_size=(640, 640),
        shift_factor=0.1,
        rotate_factor=10,
        scale_factor=(0.75, 1.0),
        pad_val=114,
        distribution="uniform",
        transform_mode="perspective",
    ),
    dict(type="YOLOXMixUp", img_scale=(640, 640), ratio_range=(0.8, 1.6), pad_val=114.0),
    dict(type="YOLOXHSVRandomAug"),
    dict(type="RandomFlip"),
    dict(type="FilterAnnotations", by_kpt=True, by_box=True, keep_empty=False),
    dict(type="PackOneStageInputs"),
]
train_pipeline_stage2 = [
    dict(type="LoadImage"),
    dict(
        type="BottomupRandomAffine",
        input_size=(640, 640),
        shift_prob=0,
        rotate_prob=0,
        scale_prob=0,
        scale_type="long",
        pad_val=(114, 114, 114),
    ),
    dict(type="YOLOXHSVRandomAug"),
    dict(type="RandomFlip"),
    dict(type="BottomupGetHeatmapMask", get_invalid=True),
    dict(type="FilterAnnotations", by_kpt=True, by_box=True, keep_empty=False),
    dict(type="PackOneStageInputs"),
]

val_pipeline = [
    dict(type="LoadImage"),
    dict(type="BottomupResize", input_size=input_size, pad_val=(114, 114, 114)),
    dict(type="PackOneStageInputs"),
]

data_root = "data/coco/"
train_dataloader = dict(
    batch_size=32,
    num_workers=8,
    sampler=dict(type="DefaultSampler", shuffle=True),
    dataset=dict(
        type="CocoDataset",
        data_root=data_root,
        data_mode="bottomup",
        ann_file="annotations/person_keypoints_train2017.json",
        data_prefix=dict(img="train2017/"),
        pipeline=train_pipeline_stage1,
    ),
)
val_dataloader = dict(
    batch_size=8,
    num_workers=8,
    drop_last=False,
    sampler=dict(type="DefaultSampler", shuffle=False, round_up=False),
    dataset=dict(
        type="CocoDataset",
        data_root=data_root,
        data_mode="bottomup",
        ann_file="annotations/person_keypoints_val2017.json",
        data_prefix=dict(img="val2017/"),
        test_mode=True,
        pipeline=val_pipeline,
    ),
)
test_dataloader = val_dataloader

val_evaluator = dict(
    type="CocoMetric",
    ann_file=data_root + "annotations/person_keypoints_val2017.json",
    score_mode="bbox",
    nms_mode="none",
)
test_evaluator = val_evaluator
