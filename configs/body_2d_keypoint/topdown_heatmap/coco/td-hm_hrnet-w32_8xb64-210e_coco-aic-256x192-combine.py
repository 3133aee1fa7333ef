# HRNet-w32 on the combined 19-keypoint COCO+AIC skeleton
# (COCO-17 plus AIC head-top and neck; metainfo coco_aic).
# TPU-native counterpart of the reference config of the same name.
_base_ = ["./td-hm_hrnet-w32_8xb64-210e_coco-256x192.py"]

model = dict(head=dict(out_channels=19))

dataset_coco = dict(
    type="CocoDataset", data_root="data/coco/", data_mode="topdown",
    ann_file="annotations/person_keypoints_train2017.json",
    data_prefix=dict(img="train2017/"),
    pipeline=[dict(type="KeypointConverter", num_keypoints=19, mapping=[
        (0, 0), (1, 1), (2, 2), (3, 3), (4, 4), (5, 5), (6, 6), (7, 7), (8, 8), (9, 9), (10, 10),
        (11, 11), (12, 12), (13, 13), (14, 14), (15, 15), (16, 16),
    ])],
)
dataset_aic = dict(
    type="AicDataset", data_root="data/aic/", data_mode="topdown",
    ann_file="annotations/aic_train.json",
    data_prefix=dict(img="ai_challenger_keypoint_train_20170902/keypoint_train_images_20170902/"),
    pipeline=[dict(type="KeypointConverter", num_keypoints=19, mapping=[
        (0, 6), (1, 8), (2, 10), (3, 5), (4, 7), (5, 9), (6, 12), (7, 14), (8, 16), (9, 11), (10, 13),
        (11, 15), (12, 17), (13, 18),
    ])],
)

train_dataloader = dict(
    dataset=dict(
        _delete_=True,
        type="CombinedDataset",
        metainfo=dict(dataset_name="coco_aic"),
        datasets=[dataset_coco, dataset_aic],
        pipeline=_base_.train_pipeline,
        test_mode=False,
    ),
)
