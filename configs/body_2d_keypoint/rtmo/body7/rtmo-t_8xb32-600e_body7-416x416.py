# RTMO-t: 416x416 one-stage pose on Body7.
# TPU-native counterpart of the reference config
# configs/body_2d_keypoint/rtmo/body7/rtmo-t_8xb32-600e_body7-416x416.py
_base_ = ["../coco/rtmo-s_8xb32-600e_coco-640x640.py"]

input_size = (416, 416)
widen_factor = 0.375
deepen_factor = 0.33

model = dict(
    data_preprocessor=dict(
        batch_augments=[
            dict(type="BatchSyncRandomResize", random_size_range=(320, 640), size_divisor=32, interval=1),
        ],
    ),
    backbone=dict(deepen_factor=deepen_factor, widen_factor=widen_factor),
    neck=dict(in_channels=[96, 192, 384], deepen_factor=deepen_factor, widen_factor=widen_factor),
    head=dict(head_module_cfg=dict(widen_factor=widen_factor)),
    test_cfg=dict(input_size=input_size),
)

train_pipeline_stage1 = [
    dict(type="LoadImage"),
    dict(type="Mosaic", img_scale=(416, 416), pad_val=114.0),
    dict(
        type="BottomupRandomAffine",
        input_size=(416, 416),
        shift_factor=0.1,
        rotate_factor=10,
        scale_factor=(0.75, 1.0),
        pad_val=114,
        distribution="uniform",
        transform_mode="perspective",
    ),
    dict(type="YOLOXMixUp", img_scale=(416, 416), ratio_range=(0.8, 1.6), pad_val=114.0),
    dict(type="YOLOXHSVRandomAug"),
    dict(type="RandomFlip"),
    dict(type="FilterAnnotations", by_kpt=True, by_box=True, keep_empty=False),
    dict(type="PackOneStageInputs"),
]
train_pipeline_stage2 = [
    dict(type="LoadImage"),
    dict(
        type="BottomupRandomAffine",
        input_size=(416, 416),
        shift_prob=0,
        rotate_prob=0,
        scale_prob=0,
        scale_type="long",
        pad_val=(114, 114, 114),
        bbox_keep_corner=False,
        clip_border=True,
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
    dict(
        type="PackPoseInputs",
        meta_keys=("id", "img_id", "img_path", "ori_shape", "img_shape", "input_size", "input_center", "input_scale"),
    ),
]

data_root = "data/"
dataset_coco = dict(
    type="CocoDataset", data_root=data_root, data_mode="bottomup",
    ann_file="coco/annotations/person_keypoints_train2017.json",
    data_prefix=dict(img="detection/coco/train2017/"),
    pipeline=[],
)
dataset_aic = dict(
    type="AicDataset", data_root=data_root, data_mode="bottomup",
    ann_file="aic/annotations/aic_train.json",
    data_prefix=dict(img="pose/ai_challenge/ai_challenger_keypoint_train_20170902/keypoint_train_images_20170902/"),
    pipeline=[dict(type="KeypointConverter", num_keypoints=17, mapping=[
        (0, 6), (1, 8), (2, 10), (3, 5), (4, 7), (5, 9), (6, 12), (7, 14), (8, 16), (9, 11), (10, 13),
        (11, 15),
    ])],
)
dataset_crowdpose = dict(
    type="CrowdPoseDataset", data_root=data_root, data_mode="bottomup",
    ann_file="crowdpose/annotations/mmpose_crowdpose_trainval.json",
    data_prefix=dict(img="pose/CrowdPose/images/"),
    pipeline=[dict(type="KeypointConverter", num_keypoints=17, mapping=[
        (0, 5), (1, 6), (2, 7), (3, 8), (4, 9), (5, 10), (6, 11), (7, 12), (8, 13), (9, 14), (10, 15),
        (11, 16),
    ])],
)
dataset_mpii = dict(
    type="MpiiDataset", data_root=data_root, data_mode="bottomup",
    ann_file="mpii/annotations/mpii_train.json",
    data_prefix=dict(img="pose/MPI/images/"),
    pipeline=[dict(type="KeypointConverter", num_keypoints=17, mapping=[
        (0, 16), (1, 14), (2, 12), (3, 11), (4, 13), (5, 15), (10, 10), (11, 8), (12, 6), (13, 5),
        (14, 7), (15, 9),
    ])],
)
dataset_jhmdb = dict(
    type="JhmdbDataset", data_root=data_root, data_mode="bottomup",
    ann_file="jhmdb/annotations/Sub1_train.json",
    data_prefix=dict(img="pose/JHMDB/"),
    pipeline=[dict(type="KeypointConverter", num_keypoints=17, mapping=[
        (3, 6), (4, 5), (5, 12), (6, 11), (7, 8), (8, 7), (9, 14), (10, 13), (11, 10), (12, 9),
        (13, 16), (14, 15),
    ])],
)
dataset_halpe = dict(
    type="HalpeDataset", data_root=data_root, data_mode="bottomup",
    ann_file="halpe/annotations/halpe_train_v1.json",
    data_prefix=dict(img="pose/Halpe/hico_20160224_det/images/train2015"),
    pipeline=[],
)
dataset_posetrack = dict(
    type="PoseTrack18Dataset", data_root=data_root, data_mode="bottomup",
    ann_file="posetrack18/annotations/posetrack18_train.json",
    data_prefix=dict(img="pose/PoseChallenge2018/"),
    pipeline=[dict(type="KeypointConverter", num_keypoints=17, mapping=[
        (0, 0), (3, 3), (4, 4), (5, 5), (6, 6), (7, 7), (8, 8), (9, 9), (10, 10), (11, 11), (12, 12),
        (13, 13), (14, 14), (15, 15), (16, 16),
    ])],
)
train_dataloader = dict(
    dataset=dict(
        _delete_=True,
        type="CombinedDataset",
        metainfo=dict(dataset_name="coco"),
        datasets=[
            dataset_coco,
            dataset_aic,
            dataset_crowdpose,
            dataset_mpii,
            dataset_jhmdb,
            dataset_halpe,
            dataset_posetrack,
        ],
        pipeline=train_pipeline_stage1,
        test_mode=False,
    ),
)

val_dataloader = dict(dataset=dict(pipeline=val_pipeline))
test_dataloader = val_dataloader

custom_hooks = [
    dict(
        type="YOLOXPoseModeSwitchHook",
        num_last_epochs=20,
        new_train_dataset=dataset_coco,
        new_train_pipeline=train_pipeline_stage2,
        priority=48,
    ),
    dict(
        type="RTMOModeSwitchHook",
        epoch_attributes={
            280: {"proxy_target_cc": True, "loss_mle.loss_weight": 5.0, "loss_oks.loss_weight": 10.0},
        },
        priority=48,
    ),
    dict(type="SyncNormHook", priority=48),
    dict(
        type="EMAHook", ema_type="ExpMomentumEMA", momentum=0.0002, update_buffers=True, strict_load=False, priority=49
    ),
]
