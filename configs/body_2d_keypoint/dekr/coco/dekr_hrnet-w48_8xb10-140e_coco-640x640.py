# DEKR + HRNet-w48 at 640x640 (reference config of the same name).
_base_ = ["./dekr_hrnet-w48_8xb10-140e_coco-512x512.py"]

codec = dict(type="SPR", input_size=(640, 640), heatmap_size=(160, 160), sigma=(4, 2), generate_keypoint_heatmaps=True)

model = dict(head=dict(decoder=codec))

train_pipeline = [
    dict(type="LoadImage"),
    dict(type="BottomupRandomAffine", input_size=codec["input_size"]),
    dict(type="RandomFlip", direction="horizontal"),
    dict(type="GenerateTarget", encoder=codec),
    dict(type="BottomupGetHeatmapMask"),
    dict(type="PackPoseInputs"),
]
val_pipeline = [
    dict(type="LoadImage"),
    dict(type="BottomupResize", input_size=codec["input_size"], size_factor=32, resize_mode="expand"),
    dict(
        type="PackPoseInputs",
        meta_keys=("id", "img_id", "img_path", "ori_shape", "img_shape", "input_size", "input_center", "input_scale",
                   "flip_indices", "skeleton_links"),
    ),
]

train_dataloader = dict(dataset=dict(pipeline=train_pipeline))
val_dataloader = dict(dataset=dict(pipeline=val_pipeline))
test_dataloader = val_dataloader
