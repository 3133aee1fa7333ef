# DEKR on CrowdPose (14 keypoints); reference config of the same name.
_base_ = ["../coco/dekr_hrnet-w48_8xb10-140e_coco-512x512.py"]

train_cfg = dict(max_epochs=300, val_interval=20)

codec = dict(type="SPR", input_size=(640, 640), heatmap_size=(160, 160), sigma=(4, 2), generate_keypoint_heatmaps=True)

model = dict(head=dict(
    num_keypoints=14,
    decoder=codec,
    # crowdpose-trained rescore net (reference crowdpose dekr recipes)
    rescore_cfg=dict(
        in_channels=59,
        norm_indexes=(0, 1),
        init_cfg=dict(type="Pretrained",
                      checkpoint="https://download.openmmlab.com/mmpose/pretrain_models/kpt_rescore_crowdpose-300c7efe.pth"),
    ),
))

train_dataloader = dict(
    dataset=dict(
        _delete_=True,
        type="CrowdPoseDataset",
        data_root="data/crowdpose/",
        data_mode="bottomup",
        ann_file="annotations/mmpose_crowdpose_trainval.json",
        data_prefix=dict(img="images/"),
        pipeline=_base_.train_pipeline,
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
    _delete_=True,
    type="CocoMetric",
    ann_file="data/crowdpose/annotations/mmpose_crowdpose_test.json",
    use_area=False,
    iou_type="keypoints_crowd",
    prefix="crowdpose",
)
test_evaluator = val_evaluator

default_hooks = dict(checkpoint=dict(save_best="crowdpose/AP", rule="greater"))
