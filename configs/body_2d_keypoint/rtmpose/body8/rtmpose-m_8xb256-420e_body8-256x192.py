# RTMPose-m on Body8: CombinedDataset over 8 body keypoint datasets with
# KeypointConverter remaps onto the COCO-17 skeleton. This is the recipe
# behind the "human"/"body"/"body17" model-index aliases.
# TPU-native counterpart of the reference config of the same name
# (/root/reference/configs/body_2d_keypoint/rtmpose/body8/).
_base_ = ["../coco/rtmpose-m_8xb256-420e_coco-256x192.py"]

data_root = "data/"
num_keypoints = 17

# keypoint-index remaps onto COCO-17 (reference body8 config tables)
aic_coco = [(0, 6), (1, 8), (2, 10), (3, 5), (4, 7), (5, 9), (6, 12), (7, 14), (8, 16), (9, 11), (10, 13), (11, 15)]
crowdpose_coco = [(0, 5), (1, 6), (2, 7), (3, 8), (4, 9), (5, 10), (6, 11), (7, 12), (8, 13), (9, 14), (10, 15), (11, 16)]
mpii_coco = [(0, 16), (1, 14), (2, 12), (3, 11), (4, 13), (5, 15), (10, 10), (11, 8), (12, 6), (13, 5), (14, 7), (15, 9)]
jhmdb_coco = [(3, 6), (4, 5), (5, 12), (6, 11), (7, 8), (8, 7), (9, 14), (10, 13), (11, 10), (12, 9), (13, 16), (14, 15)]
halpe_coco = [(i, i) for i in range(17)]
ochuman_coco = [(i, i) for i in range(17)]
posetrack_coco = [(0, 0)] + [(i, i) for i in range(3, 17)]

_convert = lambda mapping: [dict(type="KeypointConverter", num_keypoints=num_keypoints, mapping=mapping)]  # noqa: E731

dataset_coco = dict(
    type="CocoDataset", data_root=data_root, data_mode="topdown",
    ann_file="coco/annotations/person_keypoints_train2017.json",
    data_prefix=dict(img="detection/coco/train2017/"), pipeline=[],
)
dataset_aic = dict(
    type="AicDataset", data_root=data_root, data_mode="topdown",
    ann_file="aic/annotations/aic_train.json",
    data_prefix=dict(img="pose/ai_challenge/ai_challenger_keypoint_train_20170902/keypoint_train_images_20170902/"),
    pipeline=_convert(aic_coco),
)
dataset_crowdpose = dict(
    type="CrowdPoseDataset", data_root=data_root, data_mode="topdown",
    ann_file="crowdpose/annotations/mmpose_crowdpose_trainval.json",
    data_prefix=dict(img="pose/CrowdPose/images/"), pipeline=_convert(crowdpose_coco),
)
dataset_mpii = dict(
    type="MpiiDataset", data_root=data_root, data_mode="topdown",
    ann_file="mpii/annotations/mpii_train.json",
    data_prefix=dict(img="pose/MPI/images/"), pipeline=_convert(mpii_coco),
)
dataset_jhmdb = dict(
    type="JhmdbDataset", data_root=data_root, data_mode="topdown",
    ann_file="jhmdb/annotations/Sub1_train.json",
    data_prefix=dict(img="pose/JHMDB/"), pipeline=_convert(jhmdb_coco),
)
dataset_halpe = dict(
    type="HalpeDataset", data_root=data_root, data_mode="topdown",
    ann_file="halpe/annotations/halpe_train_v1.json",
    data_prefix=dict(img="pose/Halpe/hico_20160224_det/images/train2015"),
    pipeline=_convert(halpe_coco),
)
dataset_posetrack = dict(
    type="PoseTrack18Dataset", data_root=data_root, data_mode="topdown",
    ann_file="posetrack18/annotations/posetrack18_train.json",
    data_prefix=dict(img="pose/PoseChallenge2018/"), pipeline=_convert(posetrack_coco),
)
dataset_ochuman = dict(
    type="OCHumanDataset", data_root=data_root, data_mode="topdown",
    ann_file="ochuman/annotations/ochuman_coco_format_val_range_0.00_1.00.json",
    data_prefix=dict(img="pose/OCHuman/images/"), pipeline=_convert(ochuman_coco),
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
            dataset_ochuman,
        ],
        pipeline=[],  # set below (shared with the coco rtmpose-m recipe)
        test_mode=False,
    ),
)

# the CombinedDataset shares the base recipe's train pipeline; config merge
# is data-level, so restate it here (identical to the coco rtmpose-m one)
codec = dict(
    type="SimCCLabel", input_size=(192, 256), sigma=(4.9, 5.66), simcc_split_ratio=2.0, normalize=False, use_dark=False
)
train_pipeline = [
    dict(type="LoadImage"),
    dict(type="GetBBoxCenterScale"),
    dict(type="RandomFlip", direction="horizontal"),
    dict(type="RandomHalfBody"),
    dict(type="RandomBBoxTransform", scale_factor=[0.6, 1.4], rotate_factor=80),
    dict(type="TopdownAffine", input_size=codec["input_size"]),
    dict(type="YOLOXHSVRandomAug"),
    dict(type="PhotometricDistortion"),
    dict(
        type="Albumentation",
        transforms=[
            dict(type="Blur", p=0.1),
            dict(type="MedianBlur", p=0.1),
            dict(
                type="CoarseDropout",
                max_holes=1,
                max_height=0.4,
                max_width=0.4,
                min_holes=1,
                min_height=0.2,
                min_width=0.2,
                p=1.0,
            ),
        ],
    ),
    dict(type="GenerateTarget", encoder=codec),
    dict(type="PackPoseInputs"),
]

train_pipeline_stage2 = [
    dict(type="LoadImage"),
    dict(type="GetBBoxCenterScale"),
    dict(type="RandomFlip", direction="horizontal"),
    dict(type="RandomHalfBody"),
    dict(type="RandomBBoxTransform", shift_factor=0.0, scale_factor=[0.5, 1.5], rotate_factor=90),
    dict(type="TopdownAffine", input_size=codec["input_size"]),
    dict(type="YOLOXHSVRandomAug"),
    dict(
        type="Albumentation",
        transforms=[
            dict(type="Blur", p=0.1),
            dict(type="MedianBlur", p=0.1),
            dict(
                type="CoarseDropout",
                max_holes=1,
                max_height=0.4,
                max_width=0.4,
                min_holes=1,
                min_height=0.2,
                min_width=0.2,
                p=0.5,
            ),
        ],
    ),
    dict(type="GenerateTarget", encoder=codec),
    dict(type="PackPoseInputs"),
]
train_dataloader["dataset"]["pipeline"] = train_pipeline

max_epochs = 420
stage2_num_epochs = 20
custom_hooks = [
    dict(type="EMAHook", ema_type="ExpMomentumEMA", momentum=0.0002, update_buffers=True, priority=49),
    dict(
        type="PipelineSwitchHook",
        switch_epoch=max_epochs - stage2_num_epochs,
        switch_pipeline=train_pipeline_stage2,
    ),
]
