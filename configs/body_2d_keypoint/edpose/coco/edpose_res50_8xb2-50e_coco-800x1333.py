# ED-Pose (ResNet-50): reference-architecture DETR-style multi-person pose.
# Mirrors the reference config of the same name (encoder/decoder/out_head
# schema): 6-layer deformable encoder, two-stage proposals, EDPoseDecoder
# with human->keypoint query expansion at layer 2, EDPoseLabel decode.
# Reference checkpoints convert via engine.checkpoint (EDPose family);
# like the reference, this head is inference-only (edpose_head.py:1215) —
# for training use edpose-tpu_res50_8xb2-50e_coco-800x1333.py.
#
# Eval resolution: the reference resizes each image so the short side is
# 800 and the long side <= 1333 (dynamic shapes). XLA compiles one program
# per shape, so this recipe uses BottomupResize(fit) into a (1333, 800)
# frame — identical scale for landscape images (the COCO majority),
# aspect-bucketed shapes (size_factor=32) otherwise; portrait images run
# at a smaller scale than the reference.
_base_ = ["../../../_base_/default_runtime.py"]

train_cfg = dict(max_epochs=50, val_interval=10)
optim_wrapper = dict(optimizer=dict(type="Adam", lr=1e-3))
param_scheduler = [
    dict(type="LinearLR", begin=0, end=500, start_factor=0.001, by_epoch=False),
    dict(type="MultiStepLR", begin=0, end=140, milestones=[33, 45], gamma=0.1, by_epoch=True),
]
auto_scale_lr = dict(base_batch_size=80)
default_hooks = dict(checkpoint=dict(save_best="coco/AP", rule="greater"))

# codec settings
codec = dict(type="EDPoseLabel", num_select=50, num_keypoints=17)

input_size = (1333, 800)

# model settings
model = dict(
    type="BottomupPoseEstimator",
    data_preprocessor=dict(
        type="PoseDataPreprocessor",
        mean=[123.675, 116.28, 103.53],
        std=[58.395, 57.12, 57.375],
        bgr_to_rgb=True,
    ),
    backbone=dict(type="ResNet", depth=50, num_stages=4, out_indices=(1, 2, 3),
                  norm_cfg=dict(type="FrozenBatchNorm2d", requires_grad=False)),
    neck=dict(
        type="ChannelMapper",
        in_channels=[512, 1024, 2048],
        kernel_size=1,
        out_channels=256,
        act_cfg=None,
        norm_cfg=dict(type="GN", num_groups=32),
        num_outs=4,
    ),
    head=dict(
        type="EDPoseHead",
        num_queries=900,
        num_feature_levels=4,
        num_keypoints=17,
        as_two_stage=True,
        encoder=dict(
            num_layers=6,
            layer_cfg=dict(  # DeformableDetrTransformerEncoderLayer
                self_attn_cfg=dict(embed_dims=256, num_heads=8, num_levels=4, num_points=4, batch_first=True),
                ffn_cfg=dict(embed_dims=256, feedforward_channels=2048, num_fcs=2, ffn_drop=0.0),
            ),
        ),
        decoder=dict(
            num_layers=6,
            embed_dims=256,
            layer_cfg=dict(  # DeformableDetrTransformerDecoderLayer
                self_attn_cfg=dict(embed_dims=256, num_heads=8, batch_first=True),
                cross_attn_cfg=dict(embed_dims=256, batch_first=True, num_levels=4, num_points=4),
                ffn_cfg=dict(embed_dims=256, feedforward_channels=2048, ffn_drop=0.1),
            ),
            query_dim=4,
            num_feature_levels=4,
            num_group=100,
            num_dn=100,
            num_box_decoder_layers=2,
            return_intermediate=True,
        ),
        out_head=dict(num_classes=2),
        positional_encoding=dict(num_pos_feats=128, temperatureH=20, temperatureW=20, normalize=True),
        denosing_cfg=dict(
            dn_box_noise_scale=0.4,
            dn_label_noise_ratio=0.5,
            dn_labelbook_size=100,
            dn_attn_mask_type_list=["match2dn", "dn2dn", "group2group"],
        ),
        data_decoder=codec,
    ),
    test_cfg=dict(multiscale_test=False, flip_test=False, num_select=50, input_size=input_size),
    train_cfg=dict(),
)

# base dataset settings
dataset_type = "CocoDataset"
data_mode = "bottomup"
data_root = "data/coco/"

val_pipeline = [
    dict(type="LoadImage"),
    dict(type="BottomupResize", input_size=input_size),
    dict(type="PackPoseInputs",
         meta_keys=("id", "img_id", "img_path", "crowd_index", "ori_shape", "img_shape",
                    "input_size", "input_center", "input_scale", "flip", "flip_direction",
                    "flip_indices", "raw_ann_info", "skeleton_links")),
]
train_pipeline = val_pipeline  # head is inference-only (see module docstring)

train_dataloader = dict(
    batch_size=1, num_workers=1,
    sampler=dict(type="DefaultSampler", shuffle=False),
    dataset=dict(type=dataset_type, data_root=data_root, data_mode=data_mode,
                 ann_file="annotations/person_keypoints_train2017.json",
                 data_prefix=dict(img="train2017/"), pipeline=train_pipeline),
)
val_dataloader = dict(
    batch_size=1, num_workers=8, drop_last=False,
    sampler=dict(type="DefaultSampler", shuffle=False, round_up=False),
    dataset=dict(type=dataset_type, data_root=data_root, data_mode=data_mode,
                 ann_file="annotations/person_keypoints_val2017.json",
                 data_prefix=dict(img="val2017/"), test_mode=True, pipeline=val_pipeline),
)
test_dataloader = val_dataloader

val_evaluator = dict(
    type="CocoMetric",
    ann_file=data_root + "annotations/person_keypoints_val2017.json",
    nms_mode="none",
    score_mode="keypoint",
)
test_evaluator = val_evaluator
