# DoubleProbPose-S (ViT-S/16 + DoubleProbMapHead) on COCO 256x192.
# Dual expected-OKS windows: tight in-window (padding 1.0) + expanded
# out-window (padding 1.25) so out-of-image keypoints stay supervisable.
# TPU-native counterpart of the reference DoubleProbMapHead
# (mmpose/models/heads/hybrid_heads/DP_head.py, codec
# mmpose/codecs/double_probmap.py) — the reference ships the head without a
# recipe; hyperparameters mirror the ProbPose-S config.
_base_ = ["./td-pm_ProbPose-small_8xb64-210e_coco-256x192.py"]

codec = dict(
    type="DoubleProbMap",
    input_size=(192, 256),
    heatmap_size=(48, 64),
    sigma=-1,
    in_heatmap_padding=1.0,
    out_heatmap_padding=1.25,
)

model = dict(
    head=dict(
        _delete_=True,
        type="DoubleProbMapHead",
        in_channels=384,
        out_channels=17,
        deconv_out_channels=(256, 256),
        deconv_kernel_sizes=(4, 4),
        keypoint_loss=dict(type="OKSHeatmapLoss", use_target_weight=True, smoothing_weight=0.05),
        probability_loss=dict(type="BCELoss", use_target_weight=True, use_sigmoid=True),
        visibility_loss=dict(type="BCELoss", use_target_weight=True, use_sigmoid=True),
        oks_loss=dict(type="MSELoss", use_target_weight=True),
        error_loss=dict(type="L1LogLoss", use_target_weight=True),
        split_heatmaps_by="in/all",
        detach_probability=True,
        detach_visibility=True,
        detach_second_heatmaps=False,
        freeze_error=True,
        freeze_oks=False,
        decoder=codec,
    ),
)

train_pipeline = [
    dict(type="LoadImage"),
    dict(type="GetBBoxCenterScale"),
    dict(type="RandomFlip", direction="horizontal"),
    dict(type="RandomHalfBody"),
    dict(type="RandomBBoxTransform"),
    dict(type="TopdownAffine", input_size=codec["input_size"], use_udp=True, input_padding=1.25),
    dict(type="GenerateTarget", encoder=codec),
    dict(type="PackPoseInputs"),
]
train_dataloader = dict(dataset=dict(pipeline=train_pipeline))
