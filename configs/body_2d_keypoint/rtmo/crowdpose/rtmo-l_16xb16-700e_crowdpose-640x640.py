# RTMO-l on CrowdPose (14 keypoints).
# TPU-native counterpart of the reference config
# configs/body_2d_keypoint/rtmo/crowdpose/rtmo-l_16xb16-700e_crowdpose-640x640.py
_base_ = ["../coco/rtmo-l_16xb16-600e_coco-640x640.py"]

train_cfg = dict(max_epochs=700, val_interval=20, dynamic_intervals=[(670, 1)])

model = dict(
    head=dict(
        num_keypoints=14,
        assigner=dict(oks_calculator=dict(metainfo="crowdpose")),
        loss_oks=dict(metainfo="crowdpose"),
    ),
)

train_dataloader = dict(
    dataset=dict(
        _delete_=True,
        type="CrowdPoseDataset",
        data_root="data/crowdpose/",
        data_mode="bottomup",
        ann_file="annotations/mmpose_crowdpose_trainval.json",
        data_prefix=dict(img="images/"),
        pipeline=_base_.train_pipeline_stage1,
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
