# RTMO-m trained on the Body7 CombinedDataset (7 body keypoint sets
# remapped onto COCO-17). TPU-native counterpart of the reference config
# configs/body_2d_keypoint/rtmo/body7/rtmo-m_16xb16-600e_body7-640x640.py
_base_ = ["../coco/rtmo-m_16xb16-600e_coco-640x640.py"]

# the combined dataset reuses the base recipe's stage-1 train pipeline
train_pipeline_stage1 = _base_.train_pipeline_stage1

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
