# YOLOX-Pose tiny: 416x416 inputs, widen 0.375.
# TPU-native counterpart of the reference config of the same name.
_base_ = ["./yoloxpose_s_8xb32-300e_coco-640.py"]

input_size = (416, 416)
widen_factor = 0.375
deepen_factor = 0.33

model = dict(
    data_preprocessor=dict(
        batch_augments=[
            dict(type="BatchSyncRandomResize", random_size_range=(320, 640), size_divisor=32, interval=1),
        ],
    ),
    backbone=dict(deepen_factor=deepen_factor, widen_factor=widen_factor),
    neck=dict(in_channels=[96, 192, 384], out_channels=96, num_csp_blocks=1),
    head=dict(head_module_cfg=dict(in_channels=96, feat_channels=96)),
    test_cfg=dict(input_size=input_size),
)

train_pipeline_stage1 = [
    dict(type="LoadImage"),
    dict(type="Mosaic", img_scale=(416, 416), pad_val=114.0),
    dict(
        type="BottomupRandomAffine",
        input_size=(416, 416),
        shift_factor=0.1,
        rotate_factor=10,
        scale_factor=(0.75, 1.0),
        pad_val=114,
        distribution="uniform",
        transform_mode="perspective",
    ),
    dict(type="YOLOXHSVRandomAug"),
    dict(type="RandomFlip"),
    dict(type="FilterAnnotations", by_kpt=True, by_box=True, keep_empty=False),
    dict(type="PackOneStageInputs"),
]

val_pipeline = [
    dict(type="LoadImage"),
    dict(type="BottomupResize", input_size=input_size, pad_val=(114, 114, 114)),
    dict(
        type="PackPoseInputs",
        meta_keys=("id", "img_id", "img_path", "ori_shape", "img_shape", "input_size", "input_center", "input_scale"),
    ),
]

train_dataloader = dict(batch_size=64, dataset=dict(pipeline=train_pipeline_stage1))
val_dataloader = dict(dataset=dict(pipeline=val_pipeline))
test_dataloader = val_dataloader

auto_scale_lr = dict(base_batch_size=256)
