# CSPNeXt-m UDP trained on COCO+AIC (AIC remapped onto COCO-17).
# TPU-native counterpart of the reference config of the same name.
_base_ = ["./cspnext-m_udp_8xb256-210e_coco-256x192.py"]

dataset_coco = dict(
    type="CocoDataset", data_root="data/coco/", data_mode="topdown",
    ann_file="annotations/person_keypoints_train2017.json",
    data_prefix=dict(img="train2017/"),
    pipeline=[],
)
dataset_aic = dict(
    type="AicDataset", data_root="data/aic/", data_mode="topdown",
    ann_file="annotations/aic_train.json",
    data_prefix=dict(img="ai_challenger_keypoint_train_20170902/keypoint_train_images_20170902/"),
    pipeline=[dict(type="KeypointConverter", num_keypoints=17, mapping=[
        (0, 6), (1, 8), (2, 10), (3, 5), (4, 7), (5, 9), (6, 12), (7, 14), (8, 16), (9, 11), (10, 13),
        (11, 15),
    ])],
)

train_dataloader = dict(
    dataset=dict(
        _delete_=True,
        type="CombinedDataset",
        metainfo=dict(dataset_name="coco"),
        datasets=[dataset_coco, dataset_aic],
        pipeline=_base_.train_pipeline,
        test_mode=False,
    ),
)
