# ProbPose-S (ViT-S/16 + ProbMapHead, expected-OKS maps) on COCO 256x192.
# TPU-native counterpart of the reference recipe
# configs/body_2d_keypoint/topdown_probmap/coco/td-pm_ProbPose-small_8xb64-210e_coco-256x192.py
COCO_ROOT = "data/coco/"
CropCOCO_ROOT = "data/cropcoco/"

TRAIN_BATCH_SIZE = 64
TEST_BATCH_SIZE = 64
INPUT_PADDING = 1.25

COCO_NAME = "COCO"
CropCOCO_NAME = "CropCOCO"

_base_ = ["../../../_base_/default_runtime.py"]

train_cfg = dict(max_epochs=210, val_interval=10)

optim_wrapper = dict(
    optimizer=dict(type="AdamW", lr=TRAIN_BATCH_SIZE / 64 * 5e-5, betas=(0.9, 0.999), weight_decay=0.1),
    paramwise_cfg=dict(
        num_layers=12,
        layer_decay_rate=0.8,
        custom_keys={
            "bias": dict(decay_multi=0.0),
            "pos_embed": dict(decay_mult=0.0),
            "norm": dict(decay_mult=0.0),
        },
    ),
    constructor="LayerDecayOptimWrapperConstructor",
    clip_grad=dict(max_norm=1.0, norm_type=2),
)

param_scheduler = [
    dict(type="LinearLR", begin=0, end=500, start_factor=0.001, by_epoch=False),
    dict(type="MultiStepLR", begin=0, end=210, milestones=[170, 200], gamma=0.1, by_epoch=True),
]

auto_scale_lr = dict(base_batch_size=512)

default_hooks = dict(checkpoint=dict(save_best="{}/AP".format(COCO_NAME), rule="greater", max_keep_ckpts=1))

codec = dict(type="ProbMap", input_size=(192, 256), heatmap_size=(48, 64), sigma=-1)

model = dict(
    type="TopdownPoseEstimator",
    data_preprocessor=dict(
        type="PoseDataPreprocessor", mean=[123.675, 116.28, 103.53], std=[58.395, 57.12, 57.375], bgr_to_rgb=True
    ),
    backbone=dict(
        type="mmpretrain.VisionTransformer",
        arch={"embed_dims": 384, "num_layers": 12, "num_heads": 12, "feedforward_channels": 384 * 4},
        img_size=(256, 192),
        patch_size=16,
        qkv_bias=True,
        drop_path_rate=0.1,
        with_cls_token=False,
        out_type="featmap",
        patch_cfg=dict(padding=2),
        init_cfg=None,
        # TPU-native fast path, shipped ON: bf16 residual stream (params stay
        # f32; softmax/LN accumulate f32) and tanh-GELU; fused_layers is left
        # at its auto default, which routes every transformer layer through
        # the whole-layer SERVING Pallas kernel (ops/pallas/vit_layer.py) on
        # TPU and falls back to the identical-math XLA graph elsewhere.
        # Training stays on the XLA graph under auto — the differentiable
        # kernel measured slightly slower (1,759 vs 1,787 crops/s, v5e bf16
        # B=64); set fused_layers=True to force it. This is the exact graph
        # bench.py measures (5.9k flip-TTA / 12.0k no-TTA crops/s/chip on
        # v5e) — the shipped recipe IS the fast path, mirroring the
        # reference whose shipped config is its fast path.
        dtype="bfloat16",
        approximate_gelu=True,
    ),
    head=dict(
        type="ProbMapHead",
        dtype="bfloat16",
        in_channels=384,
        out_channels=17,
        deconv_out_channels=(256, 256),
        deconv_kernel_sizes=(4, 4),
        keypoint_loss=dict(type="OKSHeatmapLoss", use_target_weight=True, smoothing_weight=0.05),
        probability_loss=dict(type="BCELoss", use_target_weight=True, use_sigmoid=True),
        visibility_loss=dict(type="BCELoss", use_target_weight=True, use_sigmoid=True),
        oks_loss=dict(type="MSELoss", use_target_weight=True),
        error_loss=dict(type="L1LogLoss", use_target_weight=True),
        detach_probability=True,
        detach_visibility=True,
        normalize=1.0,
        freeze_error=True,
        freeze_oks=False,
        decoder=codec,
    ),
    test_cfg=dict(flip_test=True, flip_mode="heatmap", shift_heatmap=False),
)

train_pipeline = [
    dict(type="LoadImage"),
    dict(type="GetBBoxCenterScale"),
    dict(type="RandomFlip", direction="horizontal"),
    dict(type="RandomHalfBody"),
    dict(type="RandomBBoxTransform"),
    dict(type="TopdownAffine", input_size=codec["input_size"], use_udp=True, input_padding=INPUT_PADDING),
    dict(type="GenerateTarget", encoder=codec),
    dict(type="PackPoseInputs"),
]
val_pipeline = [
    dict(type="LoadImage"),
    dict(type="GetBBoxCenterScale"),
    dict(type="TopdownAffine", input_size=codec["input_size"], use_udp=True, input_padding=INPUT_PADDING),
    dict(type="PackPoseInputs"),
]

dataset_type = "CocoDataset"
data_mode = "topdown"

coco_val = dict(
    type="CocoDataset",
    data_root=COCO_ROOT,
    data_mode="topdown",
    ann_file="annotations/person_keypoints_val2017.json",
    test_mode=True,
    pipeline=[],
    data_prefix=dict(img="val2017/"),
)
coco_train = dict(
    type="CocoDataset",
    data_root=COCO_ROOT,
    data_mode="topdown",
    ann_file="annotations/person_keypoints_train2017.json",
    test_mode=False,
    pipeline=train_pipeline,
    data_prefix=dict(img="train2017/"),
)
CropCOCO_val = dict(
    type="CocoCropDataset",
    data_root=CropCOCO_ROOT,
    data_mode="topdown",
    ann_file="annotations/person_keypoints_val2017.json",
    test_mode=True,
    pipeline=[],
    data_prefix=dict(img="val2017/"),
)
combined_val_dataset = dict(
    type="CombinedDataset",
    metainfo=dict(dataset_name="coco"),
    datasets=[CropCOCO_val, coco_val],
    pipeline=val_pipeline,
    test_mode=True,
)

train_dataloader = dict(
    batch_size=TRAIN_BATCH_SIZE,
    num_workers=4,
    sampler=dict(type="DefaultSampler", shuffle=True),
    dataset=coco_train,
)
val_dataloader = dict(
    batch_size=TEST_BATCH_SIZE,
    num_workers=4,
    drop_last=False,
    sampler=dict(type="DefaultSampler", shuffle=False, round_up=False),
    dataset=combined_val_dataset,
)
test_dataloader = val_dataloader

val_evaluator = dict(
    type="MultiDatasetEvaluator",
    metrics=[
        dict(
            type="CocoMetric",
            ann_file=CropCOCO_ROOT + "annotations/person_keypoints_val2017.json",
            prefix=CropCOCO_NAME,
            extended=[False, True],
            match_by_bbox=[False, False],
            ignore_border_points=[False, False],
            padding=INPUT_PADDING,
            score_thresh_type="prob",
            keypoint_score_thr=0.45,
        ),
        dict(
            type="CocoMetric",
            ann_file=COCO_ROOT + "annotations/person_keypoints_val2017.json",
            prefix=COCO_NAME,
            extended=[False, True],
            match_by_bbox=[False, False],
            ignore_border_points=[False, False],
            padding=INPUT_PADDING,
            score_thresh_type="prob",
            keypoint_score_thr=0.45,
        ),
    ],
    datasets=combined_val_dataset["datasets"],
)
test_evaluator = val_evaluator
