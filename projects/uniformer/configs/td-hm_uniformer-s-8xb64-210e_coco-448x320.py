# UniFormer-S 448x320 (reference projects/uniformer config of the same name).
_base_ = ["./td-hm_uniformer-b-8xb128-210e_coco-256x192.py"]
codec = dict(type="MSRAHeatmap", input_size=(320, 448), heatmap_size=(80, 112), sigma=3)
model = dict(
    backbone=dict(depths=[3, 4, 8, 3], drop_path_rate=0.2),
    head=dict(decoder=codec),
)
train_pipeline = [
    dict(type="LoadImage"),
    dict(type="GetBBoxCenterScale"),
    dict(type="RandomFlip", direction="horizontal"),
    dict(type="RandomHalfBody"),
    dict(type="RandomBBoxTransform"),
    dict(type="TopdownAffine", input_size=codec["input_size"]),
    dict(type="GenerateTarget", encoder=codec),
    dict(type="PackPoseInputs"),
]
val_pipeline = [
    dict(type="LoadImage"),
    dict(type="GetBBoxCenterScale"),
    dict(type="TopdownAffine", input_size=codec["input_size"]),
    dict(type="PackPoseInputs"),
]
train_dataloader = dict(batch_size=64, dataset=dict(pipeline=train_pipeline))
val_dataloader = dict(batch_size=256, dataset=dict(pipeline=val_pipeline))
test_dataloader = val_dataloader
