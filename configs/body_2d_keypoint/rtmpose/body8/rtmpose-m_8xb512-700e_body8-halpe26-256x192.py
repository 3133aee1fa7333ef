# rtmpose-m_8xb512-700e_body8-halpe26-256x192
# TPU-native counterpart of the reference config
# configs/body_2d_keypoint/rtmpose/body8/rtmpose-m_8xb512-700e_body8-halpe26-256x192.py
_base_ = ["../../../_base_/default_runtime.py"]

max_epochs = 700
base_lr = 4e-3

train_cfg = dict(max_epochs=max_epochs, val_interval=10)

optim_wrapper = dict(
    optimizer=dict(type="AdamW", lr=base_lr, weight_decay=0.05),
    paramwise_cfg=dict(norm_decay_mult=0, bias_decay_mult=0),
)

param_scheduler = [
    dict(type="LinearLR", start_factor=1.0e-5, by_epoch=False, begin=0, end=1000),
    dict(
        type="CosineAnnealingLR",
        eta_min=base_lr * 0.05,
        begin=max_epochs // 2,
        end=max_epochs,
        by_epoch=True,
    ),
]

auto_scale_lr = dict(base_batch_size=1024)

codec = dict(
    type="SimCCLabel", input_size=(192, 256), sigma=(4.9, 5.66), simcc_split_ratio=2.0, normalize=False,
    use_dark=False,
)

model = dict(
    type="TopdownPoseEstimator",
    data_preprocessor=dict(
        type="PoseDataPreprocessor", mean=[123.675, 116.28, 103.53], std=[58.395, 57.12, 57.375], bgr_to_rgb=True
    ),
    backbone=dict(
        type="CSPNeXt",
        arch="P5",
        expand_ratio=0.5,
        deepen_factor=0.67,
        widen_factor=0.75,
        out_indices=(4,),
        channel_attention=True,
    ),
    head=dict(
        type="RTMCCHead",
        in_channels=768,
        out_channels=26,
        input_size=codec["input_size"],
        in_featuremap_size=(6, 8),
        simcc_split_ratio=codec["simcc_split_ratio"],
        final_layer_kernel_size=7,
        gau_cfg=dict(
            hidden_dims=256,
            s=128,
            expansion_factor=2,
            dropout_rate=0.0,
            drop_path=0.0,
            act_fn="SiLU",
            use_rel_bias=False,
            pos_enc=False,
        ),
        loss=dict(type="KLDiscretLoss", use_target_weight=True, beta=10.0, label_softmax=True),
        decoder=codec,
    ),
    test_cfg=dict(flip_test=True),
)

train_pipeline = [
    dict(type="LoadImage"),
    dict(type="GetBBoxCenterScale"),
    dict(type="RandomFlip", direction="horizontal"),
    dict(type="RandomHalfBody"),
    dict(type="RandomBBoxTransform", scale_factor=(0.6, 1.4), rotate_factor=60),
    dict(type="TopdownAffine", input_size=codec["input_size"]),
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
    dict(type="GenerateTarget", encoder=codec, use_dataset_keypoint_weights=True),
    dict(type="PackPoseInputs"),
]

train_pipeline_stage2 = [
    dict(type="LoadImage"),
    dict(type="GetBBoxCenterScale"),
    dict(type="RandomFlip", direction="horizontal"),
    dict(type="RandomHalfBody"),
    dict(type="RandomBBoxTransform", shift_factor=0.0, scale_factor=[0.5, 1.5], rotate_factor=90),
    dict(type="TopdownAffine", input_size=codec["input_size"]),
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
val_pipeline = [
    dict(type="LoadImage"),
    dict(type="GetBBoxCenterScale"),
    dict(type="TopdownAffine", input_size=codec["input_size"]),
    dict(type="PackPoseInputs"),
]

data_root = "data/"

dataset_coco = dict(
    type="CocoDataset", data_root=data_root, data_mode="topdown",
    ann_file="coco/annotations/person_keypoints_train2017.json",
    data_prefix=dict(img="detection/coco/train2017/"),
    pipeline=[dict(type="KeypointConverter", num_keypoints=26, mapping=[
        (0, 0), (1, 1), (2, 2), (3, 3), (4, 4), (5, 5), (6, 6), (7, 7), (8, 8), (9, 9), (10, 10),
        (11, 11), (12, 12), (13, 13), (14, 14), (15, 15), (16, 16), (17, 20), (18, 22), (19, 24),
        (20, 21), (21, 23), (22, 25),
    ])],
)
dataset_aic = dict(
    type="AicDataset", data_root=data_root, data_mode="topdown",
    ann_file="aic/annotations/aic_train.json",
    data_prefix=dict(img="pose/ai_challenge/ai_challenger_keypoint_train_20170902/keypoint_train_images_20170902/"),
    pipeline=[dict(type="KeypointConverter", num_keypoints=26, mapping=[
        (0, 6), (1, 8), (2, 10), (3, 5), (4, 7), (5, 9), (6, 12), (7, 14), (8, 16), (9, 11), (10, 13),
        (11, 15), (12, 17), (13, 18),
    ])],
)
dataset_crowdpose = dict(
    type="CrowdPoseDataset", data_root=data_root, data_mode="topdown",
    ann_file="crowdpose/annotations/mmpose_crowdpose_trainval.json",
    data_prefix=dict(img="pose/CrowdPose/images/"),
    pipeline=[dict(type="KeypointConverter", num_keypoints=26, mapping=[
        (0, 5), (1, 6), (2, 7), (3, 8), (4, 9), (5, 10), (6, 11), (7, 12), (8, 13), (9, 14), (10, 15),
        (11, 16), (12, 17), (13, 18),
    ])],
)
dataset_mpii = dict(
    type="MpiiDataset", data_root=data_root, data_mode="topdown",
    ann_file="mpii/annotations/mpii_train.json",
    data_prefix=dict(img="pose/MPI/images/"),
    pipeline=[dict(type="KeypointConverter", num_keypoints=26, mapping=[
        (0, 16), (1, 14), (2, 12), (3, 11), (4, 13), (5, 15), (8, 18), (9, 17), (10, 10), (11, 8),
        (12, 6), (13, 5), (14, 7), (15, 9),
    ])],
)
dataset_jhmdb = dict(
    type="JhmdbDataset", data_root=data_root, data_mode="topdown",
    ann_file="jhmdb/annotations/Sub1_train.json",
    data_prefix=dict(img="pose/JHMDB/"),
    pipeline=[dict(type="KeypointConverter", num_keypoints=26, mapping=[
        (0, 18), (2, 17), (3, 6), (4, 5), (5, 12), (6, 11), (7, 8), (8, 7), (9, 14), (10, 13),
        (11, 10), (12, 9), (13, 16), (14, 15),
    ])],
)
dataset_halpe = dict(
    type="HalpeDataset", data_root=data_root, data_mode="topdown",
    ann_file="halpe/annotations/halpe_train_v1.json",
    data_prefix=dict(img="pose/Halpe/hico_20160224_det/images/train2015"),
    pipeline=[],
)
dataset_posetrack = dict(
    type="PoseTrack18Dataset", data_root=data_root, data_mode="topdown",
    ann_file="posetrack18/annotations/posetrack18_train.json",
    data_prefix=dict(img="pose/PoseChallenge2018/"),
    pipeline=[dict(type="KeypointConverter", num_keypoints=26, mapping=[
        (0, 0), (2, 17), (3, 3), (4, 4), (5, 5), (6, 6), (7, 7), (8, 8), (9, 9), (10, 10), (11, 11),
        (12, 12), (13, 13), (14, 14), (15, 15), (16, 16),
    ])],
)

train_dataloader = dict(
    batch_size=512,
    num_workers=4,
    sampler=dict(type="DefaultSampler", shuffle=True),
    dataset=dict(
        type="CombinedDataset",
        metainfo=dict(dataset_name="halpe26"),
        datasets=[
            dataset_coco,
            dataset_aic,
            dataset_crowdpose,
            dataset_mpii,
            dataset_jhmdb,
            dataset_halpe,
            dataset_posetrack,
        ],
        pipeline=train_pipeline,
        test_mode=False,
    ),
)
val_dataloader = dict(
    batch_size=64,
    num_workers=4,
    drop_last=False,
    sampler=dict(type="DefaultSampler", shuffle=False, round_up=False),
    dataset=dict(
        type="CombinedDataset",
        metainfo=dict(dataset_name="halpe26"),
        datasets=[
            dict(dataset_coco, ann_file="coco/annotations/person_keypoints_val2017.json",
                 data_prefix=dict(img="detection/coco/val2017/")),
            dict(dataset_aic, ann_file="aic/annotations/aic_val.json",
                 data_prefix=dict(img="pose/ai_challenge/ai_challenger_keypoint_validation_20170911/"
                                      "keypoint_validation_images_20170911/")),
            dict(dataset_crowdpose, ann_file="crowdpose/annotations/mmpose_crowdpose_test.json"),
            dict(dataset_mpii, ann_file="mpii/annotations/mpii_val.json"),
            dict(dataset_jhmdb, ann_file="jhmdb/annotations/Sub1_test.json"),
            dict(dataset_halpe, ann_file="halpe/annotations/halpe_val_v1.json"),
            dict(type="OCHumanDataset", data_root=data_root, data_mode="topdown",
                 ann_file="ochuman/annotations/ochuman_coco_format_val_range_0.00_1.00.json",
                 data_prefix=dict(img="pose/OCHuman/images/"),
                 pipeline=dataset_coco["pipeline"]),
            dict(dataset_posetrack, ann_file="posetrack18/annotations/posetrack18_val.json"),
        ],
        pipeline=val_pipeline,
        test_mode=True,
    ),
)
test_dataloader = val_dataloader

default_hooks = dict(checkpoint=dict(save_best="AUC", rule="greater", max_keep_ckpts=1))

val_evaluator = [dict(type="PCKAccuracy", thr=0.1), dict(type="AUC")]
test_evaluator = val_evaluator

stage2_num_epochs = 30
custom_hooks = [
    dict(type="EMAHook", ema_type="ExpMomentumEMA", momentum=0.0002, update_buffers=True, priority=49),
    dict(
        type="PipelineSwitchHook",
        switch_epoch=max_epochs - stage2_num_epochs,
        switch_pipeline=train_pipeline_stage2,
    ),
]
