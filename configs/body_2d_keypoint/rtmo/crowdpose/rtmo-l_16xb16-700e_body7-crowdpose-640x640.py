# RTMO-l trained on Body7 remapped onto the CrowdPose-14 skeleton.
# TPU-native counterpart of the reference config
# configs/body_2d_keypoint/rtmo/crowdpose/rtmo-l_16xb16-700e_body7-crowdpose-640x640.py
_base_ = ["../coco/rtmo-l_16xb16-600e_coco-640x640.py"]

train_cfg = dict(max_epochs=700, val_interval=20, dynamic_intervals=[(670, 1)])

model = dict(
    head=dict(
        num_keypoints=14,
        assigner=dict(oks_calculator=dict(metainfo="crowdpose")),
        loss_oks=dict(metainfo="crowdpose"),
    ),
)

train_pipeline_stage1 = _base_.train_pipeline_stage1

data_root = "data/"
dataset_coco = dict(
    type="CocoDataset", data_root=data_root, data_mode="bottomup",
    ann_file="coco/annotations/person_keypoints_train2017.json",
    data_prefix=dict(img="detection/coco/train2017/"),
    pipeline=[dict(type="KeypointConverter", num_keypoints=14, mapping=[
        (5, 0), (6, 1), (7, 2), (8, 3), (9, 4), (10, 5), (11, 6), (12, 7), (13, 8), (14, 9), (15, 10),
        (16, 11),
    ])],
)
dataset_aic = dict(
    type="AicDataset", data_root=data_root, data_mode="bottomup",
    ann_file="aic/annotations/aic_train.json",
    data_prefix=dict(img="pose/ai_challenge/ai_challenger_keypoint_train_20170902/keypoint_train_images_20170902/"),
    pipeline=[dict(type="KeypointConverter", num_keypoints=14, mapping=[
        (3, 0), (0, 1), (4, 2), (1, 3), (5, 4), (2, 5), (9, 6), (6, 7), (10, 8), (7, 9), (11, 10),
        (8, 11), (12, 12), (13, 13),
    ])],
)
dataset_crowdpose = dict(
    type="CrowdPoseDataset", data_root=data_root, data_mode="bottomup",
    ann_file="crowdpose/annotations/mmpose_crowdpose_trainval.json",
    data_prefix=dict(img="pose/CrowdPose/images/"),
    pipeline=[],
)
dataset_mpii = dict(
    type="MpiiDataset", data_root=data_root, data_mode="bottomup",
    ann_file="mpii/annotations/mpii_train.json",
    data_prefix=dict(img="pose/MPI/images/"),
    pipeline=[dict(type="KeypointConverter", num_keypoints=14, mapping=[
        (13, 0), (12, 1), (14, 2), (11, 3), (15, 4), (10, 5), (3, 6), (2, 7), (4, 8), (1, 9), (5, 10),
        (0, 11), (9, 12), (7, 13),
    ])],
)
dataset_jhmdb = dict(
    type="JhmdbDataset", data_root=data_root, data_mode="bottomup",
    ann_file="jhmdb/annotations/Sub1_train.json",
    data_prefix=dict(img="pose/JHMDB/"),
    pipeline=[dict(type="KeypointConverter", num_keypoints=14, mapping=[
        (4, 0), (3, 1), (8, 2), (7, 3), (12, 4), (11, 5), (6, 6), (5, 7), (10, 8), (9, 9), (14, 10),
        (13, 11), (2, 12), (0, 13),
    ])],
)
dataset_halpe = dict(
    type="HalpeDataset", data_root=data_root, data_mode="bottomup",
    ann_file="halpe/annotations/halpe_train_v1.json",
    data_prefix=dict(img="pose/Halpe/hico_20160224_det/images/train2015"),
    pipeline=[dict(type="KeypointConverter", num_keypoints=14, mapping=[
        (5, 0), (6, 1), (7, 2), (8, 3), (9, 4), (10, 5), (11, 6), (12, 7), (13, 8), (14, 9), (15, 10),
        (16, 11),
    ])],
)
dataset_posetrack = dict(
    type="PoseTrack18Dataset", data_root=data_root, data_mode="bottomup",
    ann_file="posetrack18/annotations/posetrack18_train.json",
    data_prefix=dict(img="pose/PoseChallenge2018/"),
    pipeline=[dict(type="KeypointConverter", num_keypoints=14, mapping=[
        (5, 0), (6, 1), (7, 2), (8, 3), (9, 4), (10, 5), (11, 6), (12, 7), (13, 8), (14, 9), (15, 10),
        (16, 11), (2, 12), (1, 13),
    ])],
)
train_dataloader = dict(
    dataset=dict(
        _delete_=True,
        type="CombinedDataset",
        metainfo=dict(dataset_name="crowdpose"),
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

val_dataloader = dict(
    dataset=dict(
        _delete_=True,
        type="CrowdPoseDataset",
        data_root="data/crowdpose/",
        data_mode="bottomup",
        ann_file="annotations/mmpose_crowdpose_test.json",
        data_prefix=dict(img="images/"),
        test_mode=True,
        pipeline=_base_.val_pipeline,
    ),
)
test_dataloader = val_dataloader

val_evaluator = dict(
    type="CocoMetric",
    ann_file="data/crowdpose/annotations/mmpose_crowdpose_test.json",
    use_area=False,
    iou_type="keypoints_crowd",
    prefix="crowdpose",
)
test_evaluator = val_evaluator
