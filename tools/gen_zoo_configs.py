#!/usr/bin/env python
"""Generate the model-zoo recipe configs (reference ``configs/`` parity).

The reference ships 465 config files (SURVEY §1 layer 11); each is a
self-contained declarative recipe. This script deterministically emits the
TPU-native counterparts for every (family x backbone x dataset x input-size)
combination whose components exist in the package — the same schema the
hand-written flagship configs use, so `tests/test_configs_zoo.py` smoke-
covers every emitted file (load + model build).

Re-run after adding a family:  python tools/gen_zoo_configs.py
Idempotent; never overwrites a file that exists with different content
unless --force.
"""

from __future__ import annotations

import argparse
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CFG = os.path.join(REPO, "configs")

# ---------------------------------------------------------------------------
# backbone snippets: name -> (model backbone dict source, head in_channels,
#                             head extra lines, batch-size hint)
# ---------------------------------------------------------------------------

HRNET_EXTRA = """dict(
        type="HRNet",
        in_channels=3,
        extra=dict(
            stage1=dict(num_modules=1, num_branches=1, block="BOTTLENECK", num_blocks=(4,), num_channels=(64,)),
            stage2=dict(num_modules=1, num_branches=2, block="BASIC", num_blocks=(4, 4), num_channels=({c1}, {c2})),
            stage3=dict(num_modules=4, num_branches=3, block="BASIC", num_blocks=(4, 4, 4), num_channels=({c1}, {c2}, {c3})),
            stage4=dict(
                num_modules=3, num_branches=4, block="BASIC", num_blocks=(4, 4, 4, 4), num_channels=({c1}, {c2}, {c3}, {c4})
            ),
        ),
    )"""

SIMPLE_HEAD = 'deconv_out_channels=None,\n        final_layer=dict(kernel_size=1),'

# (backbone_src, head_in, head_extra, bs)
BACKBONES = {
    "res50": ('dict(type="ResNet", depth=50, out_indices=(3,))', 2048, "", 64),
    "res101": ('dict(type="ResNet", depth=101, out_indices=(3,))', 2048, "", 64),
    "res152": ('dict(type="ResNet", depth=152, out_indices=(3,))', 2048, "", 32),
    "resnetv1d50": ('dict(type="ResNetV1d", depth=50, out_indices=(3,))', 2048, "", 64),
    "resnetv1d101": ('dict(type="ResNetV1d", depth=101, out_indices=(3,))', 2048, "", 64),
    "resnetv1d152": ('dict(type="ResNetV1d", depth=152, out_indices=(3,))', 2048, "", 32),
    "resnext50": ('dict(type="ResNeXt", depth=50, out_indices=(3,))', 2048, "", 64),
    "resnext101": ('dict(type="ResNeXt", depth=101, out_indices=(3,))', 2048, "", 64),
    "resnext152": ('dict(type="ResNeXt", depth=152, out_indices=(3,))', 2048, "", 32),
    "seresnet50": ('dict(type="SEResNet", depth=50)', 2048, "", 64),
    "seresnet101": ('dict(type="SEResNet", depth=101)', 2048, "", 64),
    "seresnet152": ('dict(type="SEResNet", depth=152)', 2048, "", 32),
    "scnet50": ('dict(type="SCNet", depth=50)', 2048, "", 64),
    "scnet101": ('dict(type="SCNet", depth=101)', 2048, "", 32),
    "resnest50": ('dict(type="ResNeSt", depth=50)', 2048, "", 64),
    "resnest101": ('dict(type="ResNeSt", depth=101)', 2048, "", 64),
    "resnest200": ('dict(type="ResNeSt", depth=200)', 2048, "", 16),
    "resnest269": ('dict(type="ResNeSt", depth=269)', 2048, "", 16),
    "hrnet-w32": (HRNET_EXTRA.format(c1=32, c2=64, c3=128, c4=256), 32, SIMPLE_HEAD, 64),
    "hrnet-w48": (HRNET_EXTRA.format(c1=48, c2=96, c3=192, c4=384), 48, SIMPLE_HEAD, 32),
    "mobilenetv2": ('dict(type="MobileNetV2", widen_factor=1.0, out_indices=(7,))', 1280, "", 64),
    "shufflenetv1": ('dict(type="ShuffleNetV1", groups=3, out_indices=(2,))', 960, "", 64),
    "shufflenetv2": ('dict(type="ShuffleNetV2", widen_factor=1.0, out_indices=(3,))', 1024, "", 64),
    "litehrnet-18": ('dict(type="LiteHRNet")', 40, SIMPLE_HEAD, 64),
    "litehrnet-30": (
        'dict(\n        type="LiteHRNet",\n        extra=dict(\n'
        "            stem=dict(stem_channels=32, out_channels=32, expand_ratio=1),\n"
        "            num_stages=3,\n"
        "            stages_spec=dict(\n"
        "                num_modules=(3, 8, 3), num_branches=(2, 3, 4), num_blocks=(2, 2, 2),\n"
        '                module_type=("LITE", "LITE", "LITE"), with_fuse=(True, True, True),\n'
        "                reduce_ratios=(8, 8, 8), num_channels=((40, 80), (40, 80, 160), (40, 80, 160, 320)),\n"
        "            ),\n"
        "            with_head=True,\n"
        "        ),\n    )",
        40, SIMPLE_HEAD, 64),
    "vgg16-bn": ('dict(type="VGG", depth=16, with_bn=True, out_indices=(4,))', 512, "", 64),
    "alexnet": ('dict(type="AlexNet")', 256, "", 64),
    "swin-t-p4-w7": ('dict(type="SwinTransformer", embed_dims=96, depths=(2, 2, 6, 2), num_heads=(3, 6, 12, 24), out_indices=(3,))', 768, "", 32),
    "swin-s-p4-w7": ('dict(type="SwinTransformer", embed_dims=96, depths=(2, 2, 18, 2), num_heads=(3, 6, 12, 24), out_indices=(3,))', 768, "", 32),
    "swin-b-p4-w7": ('dict(type="SwinTransformer", embed_dims=128, depths=(2, 2, 18, 2), num_heads=(4, 8, 16, 32), out_indices=(3,))', 1024, "", 32),
    "swin-l-p4-w7": ('dict(type="SwinTransformer", embed_dims=192, depths=(2, 2, 18, 2), num_heads=(6, 12, 24, 48), out_indices=(3,))', 1536, "", 32),
    "pvt-s": ('dict(type="PyramidVisionTransformer", num_layers=(3, 4, 6, 3), out_indices=(3,))', 512, "", 64),
    "pvtv2-b2": ('dict(type="PyramidVisionTransformer", num_layers=(3, 4, 6, 3), mlp_ratios=(8, 8, 4, 4), out_indices=(3,))', 512, "", 64),
    "hrformer-small": ('dict(type="HRFormer", base_channels=32, depths=(2, 2, 2))', 32, SIMPLE_HEAD, 32),
    "hrformer-base": ('dict(type="HRFormer", base_channels=78, depths=(2, 2, 2))', 78, SIMPLE_HEAD, 32),
    "cspnext-tiny_udp": ('dict(type="CSPNeXt", arch="P5", deepen_factor=0.167, widen_factor=0.375, out_indices=(4,), channel_attention=True)', 384, "", 256),
    "cspnext-s_udp": ('dict(type="CSPNeXt", arch="P5", deepen_factor=0.33, widen_factor=0.5, out_indices=(4,), channel_attention=True)', 512, "", 256),
    "cspnext-m_udp": ('dict(type="CSPNeXt", arch="P5", deepen_factor=0.67, widen_factor=0.75, out_indices=(4,), channel_attention=True)', 768, "", 256),
    "cspnext-l_udp": ('dict(type="CSPNeXt", arch="P5", deepen_factor=1.0, widen_factor=1.0, out_indices=(4,), channel_attention=True)', 1024, "", 256),
    "ViTPose-small": (
        'dict(\n        type="VisionTransformer", arch="small", img_size=({H}, {W}), patch_size=16,\n'
        '        qkv_bias=True, drop_path_rate=0.1, with_cls_token=False, out_type="featmap", patch_padding=2,\n    )',
        384, "", 64),
    "ViTPose-base": (
        'dict(\n        type="VisionTransformer", arch="base", img_size=({H}, {W}), patch_size=16,\n'
        '        qkv_bias=True, drop_path_rate=0.3, with_cls_token=False, out_type="featmap", patch_padding=2,\n    )',
        768, "", 64),
    "ViTPose-large": (
        'dict(\n        type="VisionTransformer", arch="large", img_size=({H}, {W}), patch_size=16,\n'
        '        qkv_bias=True, drop_path_rate=0.5, with_cls_token=False, out_type="featmap", patch_padding=2,\n    )',
        1024, "", 32),
    "ViTPose-huge": (
        'dict(\n        type="VisionTransformer", arch="huge", img_size=({H}, {W}), patch_size=16,\n'
        '        qkv_bias=True, drop_path_rate=0.55, with_cls_token=False, out_type="featmap", patch_padding=2,\n    )',
        1280, "", 32),
}

# multistage families need whole model-section templates
SPECIAL_MODELS = {
    "cpm": (
        'backbone=dict(type="CPM", out_channels={K}, num_stages=6),\n'
        '    head=dict(\n'
        '        type="CPMHead",\n'
        '        in_channels={K},\n'
        '        out_channels={K},\n'
        '        num_stages=6,\n'
        '        loss=dict(type="KeypointMSELoss", use_target_weight=True),\n'
        '        decoder=codec,\n'
        '    ),', 64),
    "hourglass52": (
        'backbone=dict(type="HourglassNet", num_stacks=2),\n'
        '    head=dict(\n'
        '        type="CPMHead",\n'
        '        in_channels=256,\n'
        '        out_channels={K},\n'
        '        num_stages=2,\n'
        '        deconv_out_channels=None,\n'
        '        loss=dict(type="KeypointMSELoss", use_target_weight=True),\n'
        '        decoder=codec,\n'
        '    ),', 32),
    "vipnas-mbv3": (
        'backbone=dict(type="ViPNAS_MobileNetV3"),\n'
        '    head=dict(\n'
        '        type="ViPNASHead",\n'
        '        in_channels=160,\n'
        '        out_channels={K},\n'
        '        deconv_out_channels=(160, 160, 160),\n'
        '        deconv_num_groups=(160, 160, 160),\n'
        '        loss=dict(type="KeypointMSELoss", use_target_weight=True),\n'
        '        decoder=codec,\n'
        '    ),', 64),
    "vipnas-res50": (
        'backbone=dict(type="ViPNAS_ResNet", depth=50),\n'
        '    head=dict(\n'
        '        type="ViPNASHead",\n'
        '        in_channels=608,\n'
        '        out_channels={K},\n'
        '        loss=dict(type="KeypointMSELoss", use_target_weight=True),\n'
        '        decoder=codec,\n'
        '    ),', 64),
}


def mspn_model(prefix: str, num_stages: int, K: int) -> str:
    if prefix == "rsn":
        blocks = "(2, 2, 2, 2)"
        bb = f'dict(type="RSN", unit_channels=256, num_stages={num_stages}, num_units=4, num_blocks={blocks})'
    else:
        blocks = "(3, 4, 6, 3)"
        bb = f'dict(type="MSPN", unit_channels=256, num_stages={num_stages}, num_units=4, num_blocks={blocks})'
    lvl = "[0, 1, 2, 3]" if num_stages == 1 else f"{[0, 1, 2, 3] * (num_stages - 1) + [1, 2, 3, 3]}"
    return (
        f"backbone={bb},\n"
        "    head=dict(\n"
        '        type="MSPNHead",\n'
        f"        num_stages={num_stages},\n"
        "        num_units=4,\n"
        "        out_shape=({HH}, {HW}),\n"
        "        unit_channels=256,\n"
        f"        out_channels={K},\n"
        "        use_prm=False,\n"
        f"        level_indices={lvl},\n"
        '        loss=dict(type="KeypointMSELoss", use_target_weight=True),\n'
        "        decoder=codec,\n"
        "    ),"
    )


# rsn18: num_stages=1 single RSU with 18-layer blocks (2,2,2,2)
RSN18 = (
    'backbone=dict(type="RSN", unit_channels=256, num_stages=1, num_units=4, num_blocks=(2, 2, 2, 2)),\n'
    "    head=dict(\n"
    '        type="MSPNHead",\n'
    "        num_stages=1,\n"
    "        num_units=4,\n"
    "        out_shape=({HH}, {HW}),\n"
    "        unit_channels=256,\n"
    "        out_channels={K},\n"
    "        use_prm=False,\n"
    "        level_indices=[0, 1, 2, 3],\n"
    '        loss=dict(type="KeypointMSELoss", use_target_weight=True),\n'
    "        decoder=codec,\n"
    "    ),"
)

# ---------------------------------------------------------------------------
# dataset recipes
# ---------------------------------------------------------------------------

DATASETS = {
    "coco": dict(
        ds_type="CocoDataset", root="data/coco/", num_kpts=17,
        train_ann="annotations/person_keypoints_train2017.json", train_img="train2017/",
        val_ann="annotations/person_keypoints_val2017.json", val_img="val2017/",
        evaluator='dict(type="CocoMetric", ann_file=data_root + "annotations/person_keypoints_val2017.json")',
        save_best="coco/AP", epochs=210,
    ),
    "mpii": dict(
        ds_type="MpiiDataset", root="data/mpii/", num_kpts=16,
        train_ann="annotations/mpii_train.json", train_img="images/",
        val_ann="annotations/mpii_val.json", val_img="images/",
        evaluator='dict(type="MpiiPCKAccuracy")', save_best="PCKh", epochs=210,
    ),
    "crowdpose": dict(
        ds_type="CrowdPoseDataset", root="data/crowdpose/", num_kpts=14,
        train_ann="annotations/mmpose_crowdpose_trainval.json", train_img="images/",
        val_ann="annotations/mmpose_crowdpose_test.json", val_img="images/",
        evaluator=('dict(\n    type="CocoMetric",\n'
                   '    ann_file=data_root + "annotations/mmpose_crowdpose_test.json",\n'
                   '    use_area=False,\n    iou_type="keypoints_crowd",\n    prefix="crowdpose",\n)'),
        save_best="crowdpose/AP", epochs=210,
    ),
    "aic": dict(
        ds_type="AicDataset", root="data/aic/", num_kpts=14,
        train_ann="annotations/aic_train.json",
        train_img="ai_challenger_keypoint_train_20170902/keypoint_train_images_20170902/",
        val_ann="annotations/aic_val.json",
        val_img="ai_challenger_keypoint_validation_20170911/keypoint_validation_images_20170911/",
        evaluator='dict(type="CocoMetric", ann_file=data_root + "annotations/aic_val.json", use_area=True)',
        save_best="coco/AP", epochs=210,
    ),
    "jhmdb": dict(
        ds_type="JhmdbDataset", root="data/jhmdb/", num_kpts=15,
        train_ann="annotations/Sub1_train.json", train_img="",
        val_ann="annotations/Sub1_test.json", val_img="",
        evaluator='dict(type="JhmdbPCKAccuracy", thr=0.2, norm_item=["bbox", "torso"])',
        save_best="PCK", epochs=40,
    ),
    "humanart": dict(
        ds_type="HumanArtDataset", root="data/", num_kpts=17,
        train_ann="HumanArt/annotations/training_humanart_coco.json", train_img="",
        val_ann="HumanArt/annotations/validation_humanart.json", val_img="",
        evaluator='dict(type="CocoMetric", ann_file=data_root + "HumanArt/annotations/validation_humanart.json")',
        save_best="coco/AP", epochs=210,
    ),
    "posetrack18": dict(
        ds_type="PoseTrack18Dataset", root="data/posetrack18/", num_kpts=17,
        train_ann="annotations/posetrack18_train.json", train_img="",
        val_ann="annotations/posetrack18_val.json", val_img="",
        evaluator='dict(type="PoseTrack18Metric", ann_file=data_root + "annotations/posetrack18_val.json")',
        save_best="posetrack18/Total AP", epochs=20,
    ),
    "ochuman": dict(
        ds_type="OCHumanDataset", root="data/ochuman/", num_kpts=17,
        train_ann=None, train_img=None,  # trained on COCO, evaluated on OCHuman
        val_ann="annotations/ochuman_coco_format_val_range_0.00_1.00.json", val_img="images/",
        evaluator=('dict(\n    type="CocoMetric",\n'
                   '    ann_file=data_root + "annotations/ochuman_coco_format_val_range_0.00_1.00.json",\n)'),
        save_best="coco/AP", epochs=210,
    ),
    "exlpose": dict(
        ds_type="ExlposeDataset", root="data/ExLPose/", num_kpts=14,
        train_ann="annotations/ExLPose/ExLPose_train_LL.json", train_img="",
        val_ann="annotations/ExLPose/ExLPose_test_LL-A.json", val_img="",
        evaluator='dict(type="CocoMetric", ann_file=data_root + "annotations/ExLPose/ExLPose_test_LL-A.json", use_area=False)',
        save_best="coco/AP", epochs=210,
    ),
    # -- wholebody ---------------------------------------------------------
    "coco-wholebody": dict(
        ds_type="CocoWholeBodyDataset", root="data/coco/", num_kpts=133,
        train_ann="annotations/coco_wholebody_train_v1.0.json", train_img="train2017/",
        val_ann="annotations/coco_wholebody_val_v1.0.json", val_img="val2017/",
        evaluator='dict(type="CocoWholeBodyMetric", ann_file=data_root + "annotations/coco_wholebody_val_v1.0.json")',
        save_best="coco-wholebody/AP", epochs=210,
    ),
    "halpe": dict(
        ds_type="HalpeDataset", root="data/halpe/", num_kpts=136,
        train_ann="annotations/halpe_train_v1.json", train_img="hico_20160224_det/images/train2015/",
        val_ann="annotations/halpe_val_v1.json", val_img="val2017/",
        evaluator='dict(type="CocoWholeBodyMetric", ann_file=data_root + "annotations/halpe_val_v1.json")',
        save_best="coco-wholebody/AP", epochs=210,
    ),
    # -- face --------------------------------------------------------------
    "300w": dict(
        ds_type="Face300WDataset", root="data/300w/", num_kpts=68,
        train_ann="annotations/face_landmarks_300w_train.json", train_img="images/",
        val_ann="annotations/face_landmarks_300w_valid.json", val_img="images/",
        evaluator='dict(type="NME", norm_mode="keypoint_distance")', save_best="NME", rule="less", epochs=60,
    ),
    "wflw": dict(
        ds_type="WFLWDataset", root="data/wflw/", num_kpts=98,
        train_ann="annotations/face_landmarks_wflw_train.json", train_img="images/",
        val_ann="annotations/face_landmarks_wflw_test.json", val_img="images/",
        evaluator='dict(type="NME", norm_mode="keypoint_distance")', save_best="NME", rule="less", epochs=60,
    ),
    "aflw": dict(
        ds_type="AFLWDataset", root="data/aflw/", num_kpts=19,
        train_ann="annotations/face_landmarks_aflw_train.json", train_img="images/",
        val_ann="annotations/face_landmarks_aflw_test.json", val_img="images/",
        evaluator='dict(type="NME", norm_mode="use_norm_item", norm_item="bbox_size")',
        save_best="NME", rule="less", epochs=60,
    ),
    "cofw": dict(
        ds_type="COFWDataset", root="data/cofw/", num_kpts=29,
        train_ann="annotations/cofw_train.json", train_img="images/",
        val_ann="annotations/cofw_test.json", val_img="images/",
        evaluator='dict(type="NME", norm_mode="keypoint_distance")', save_best="NME", rule="less", epochs=60,
    ),
    "lapa": dict(
        ds_type="LapaDataset", root="data/LaPa/", num_kpts=106,
        train_ann="annotations/lapa_trainval.json", train_img="",
        val_ann="annotations/lapa_test.json", val_img="",
        evaluator='dict(type="NME", norm_mode="keypoint_distance")', save_best="NME", rule="less", epochs=60,
    ),
    "coco_wholebody_face": dict(
        ds_type="CocoWholeBodyFaceDataset", root="data/coco/", num_kpts=68,
        train_ann="annotations/coco_wholebody_train_v1.0.json", train_img="train2017/",
        val_ann="annotations/coco_wholebody_val_v1.0.json", val_img="val2017/",
        evaluator='dict(type="NME", norm_mode="keypoint_distance")', save_best="NME", rule="less", epochs=60,
    ),
    # -- hand --------------------------------------------------------------
    "onehand10k": dict(
        ds_type="OneHand10KDataset", root="data/onehand10k/", num_kpts=21,
        train_ann="annotations/onehand10k_train.json", train_img="",
        val_ann="annotations/onehand10k_test.json", val_img="",
        evaluator='[dict(type="PCKAccuracy", thr=0.2), dict(type="AUC"), dict(type="EPE")]',
        save_best="AUC", epochs=210,
    ),
    "rhd2d": dict(
        ds_type="Rhd2DDataset", root="data/rhd/", num_kpts=21,
        train_ann="annotations/rhd_train.json", train_img="",
        val_ann="annotations/rhd_test.json", val_img="",
        evaluator='[dict(type="PCKAccuracy", thr=0.2), dict(type="AUC"), dict(type="EPE")]',
        save_best="AUC", epochs=210,
    ),
    "freihand2d": dict(
        ds_type="FreiHandDataset", root="data/freihand/", num_kpts=21,
        train_ann="annotations/freihand_train.json", train_img="",
        val_ann="annotations/freihand_test.json", val_img="",
        evaluator='[dict(type="PCKAccuracy", thr=0.2), dict(type="AUC"), dict(type="EPE")]',
        save_best="AUC", epochs=210,
    ),
    "coco_wholebody_hand": dict(
        ds_type="CocoWholeBodyHandDataset", root="data/coco/", num_kpts=21,
        train_ann="annotations/coco_wholebody_train_v1.0.json", train_img="train2017/",
        val_ann="annotations/coco_wholebody_val_v1.0.json", val_img="val2017/",
        evaluator='[dict(type="PCKAccuracy", thr=0.2), dict(type="AUC"), dict(type="EPE")]',
        save_best="AUC", epochs=210,
    ),
    "panoptic_hand2d": dict(
        ds_type="PanopticHand2DDataset", root="data/panoptic/", num_kpts=21,
        train_ann="annotations/panoptic_train.json", train_img="",
        val_ann="annotations/panoptic_test.json", val_img="",
        evaluator='[dict(type="PCKAccuracy", thr=0.7, norm_item="head"), dict(type="AUC"), dict(type="EPE")]',
        save_best="AUC", epochs=210,
    ),
    # -- animal ------------------------------------------------------------
    "ap10k": dict(
        ds_type="AP10KDataset", root="data/ap10k/", num_kpts=17,
        train_ann="annotations/ap10k-train-split1.json", train_img="data/",
        val_ann="annotations/ap10k-val-split1.json", val_img="data/",
        evaluator='dict(type="CocoMetric", ann_file=data_root + "annotations/ap10k-val-split1.json")',
        save_best="coco/AP", epochs=210,
    ),
    "animalpose": dict(
        ds_type="AnimalPoseDataset", root="data/animalpose/", num_kpts=20,
        train_ann="annotations/animalpose_train.json", train_img="",
        val_ann="annotations/animalpose_val.json", val_img="",
        evaluator='dict(type="CocoMetric", ann_file=data_root + "annotations/animalpose_val.json")',
        save_best="coco/AP", epochs=210,
    ),
    "ak": dict(
        ds_type="AnimalKingdomDataset", root="data/ak/", num_kpts=23,
        train_ann="annotations/ak_P1/train.json", train_img="images/",
        val_ann="annotations/ak_P1/test.json", val_img="images/",
        evaluator='dict(type="PCKAccuracy", thr=0.05)', save_best="PCK", epochs=300,
    ),
    "atrw": dict(
        ds_type="ATRWDataset", root="data/atrw/", num_kpts=15,
        train_ann="annotations/keypoint_train.json", train_img="images/train/",
        val_ann="annotations/keypoint_val.json", val_img="images/val/",
        evaluator='dict(type="CocoMetric", ann_file=data_root + "annotations/keypoint_val.json")',
        save_best="coco/AP", epochs=210,
    ),
    "horse10": dict(
        ds_type="Horse10Dataset", root="data/horse10/", num_kpts=22,
        train_ann="annotations/horse10-train-split1.json", train_img="",
        val_ann="annotations/horse10-test-split1.json", val_img="",
        evaluator='dict(type="PCKAccuracy", norm_item="bbox")', save_best="PCK", epochs=210,
    ),
    "macaque": dict(
        ds_type="MacaqueDataset", root="data/macaque/", num_kpts=17,
        train_ann="annotations/macaque_train.json", train_img="images/",
        val_ann="annotations/macaque_test.json", val_img="images/",
        evaluator='dict(type="CocoMetric", ann_file=data_root + "annotations/macaque_test.json")',
        save_best="coco/AP", epochs=210,
    ),
    "fly": dict(
        ds_type="FlyDataset", root="data/fly/", num_kpts=32,
        train_ann="annotations/fly_train.json", train_img="images/",
        val_ann="annotations/fly_test.json", val_img="images/",
        evaluator='dict(type="PCKAccuracy", thr=0.2)', save_best="PCK", epochs=210,
    ),
    "locust": dict(
        ds_type="LocustDataset", root="data/locust/", num_kpts=35,
        train_ann="annotations/locust_train.json", train_img="images/",
        val_ann="annotations/locust_test.json", val_img="images/",
        evaluator='dict(type="PCKAccuracy", thr=0.2)', save_best="PCK", epochs=210,
    ),
    "zebra": dict(
        ds_type="ZebraDataset", root="data/zebra/", num_kpts=9,
        train_ann="annotations/zebra_train.json", train_img="images/",
        val_ann="annotations/zebra_test.json", val_img="images/",
        evaluator='dict(type="PCKAccuracy", thr=0.2)', save_best="PCK", epochs=210,
    ),
    # -- fashion -----------------------------------------------------------
    "deepfashion_upper": dict(
        ds_type="DeepFashionDataset", root="data/fld/", num_kpts=6, subset="upper",
        train_ann="annotations/fld_upper_train.json", train_img="img/",
        val_ann="annotations/fld_upper_val.json", val_img="img/",
        evaluator='[dict(type="PCKAccuracy", thr=0.2), dict(type="AUC"), dict(type="EPE")]',
        save_best="AUC", epochs=210,
    ),
    "deepfashion_lower": dict(
        ds_type="DeepFashionDataset", root="data/fld/", num_kpts=4, subset="lower",
        train_ann="annotations/fld_lower_train.json", train_img="img/",
        val_ann="annotations/fld_lower_val.json", val_img="img/",
        evaluator='[dict(type="PCKAccuracy", thr=0.2), dict(type="AUC"), dict(type="EPE")]',
        save_best="AUC", epochs=210,
    ),
    "deepfashion_full": dict(
        ds_type="DeepFashionDataset", root="data/fld/", num_kpts=8, subset="full",
        train_ann="annotations/fld_full_train.json", train_img="img/",
        val_ann="annotations/fld_full_val.json", val_img="img/",
        evaluator='[dict(type="PCKAccuracy", thr=0.2), dict(type="AUC"), dict(type="EPE")]',
        save_best="AUC", epochs=210,
    ),
}

TEMPLATE = '''# {title}
# TPU-native counterpart of the reference recipe of the same name
# (/root/reference/configs/{ref_rel}).
_base_ = ["{base}"]

train_cfg = dict(max_epochs={epochs}, val_interval=10)

optim_wrapper = dict(optimizer=dict(type="Adam", lr=5e-4))

param_scheduler = [
    dict(type="LinearLR", begin=0, end=500, start_factor=0.001, by_epoch=False),
    dict(type="MultiStepLR", begin=0, end={epochs}, milestones={milestones}, gamma=0.1, by_epoch=True),
]

auto_scale_lr = dict(base_batch_size={base_bs})

default_hooks = dict(checkpoint=dict(save_best="{save_best}", rule="{rule}"))

codec = {codec}

model = dict(
    type="TopdownPoseEstimator",
    data_preprocessor=dict(
        type="PoseDataPreprocessor", mean=[123.675, 116.28, 103.53], std=[58.395, 57.12, 57.375], bgr_to_rgb=True
    ),
    {model_body}
    test_cfg=dict(flip_test=True{extra_test_cfg}),
)

train_pipeline = [
    dict(type="LoadImage"),
    dict(type="GetBBoxCenterScale"),
    dict(type="RandomFlip", direction="horizontal"),{halfbody}
    dict(type="RandomBBoxTransform"),
    dict(type="TopdownAffine", input_size=codec["input_size"]{affine_args}),
    dict(type="GenerateTarget", encoder=codec),
    dict(type="PackPoseInputs"),
]
val_pipeline = [
    dict(type="LoadImage"),
    dict(type="GetBBoxCenterScale"),
    dict(type="TopdownAffine", input_size=codec["input_size"]{affine_args}),
    dict(type="PackPoseInputs"),
]

data_root = "{root}"
train_dataloader = dict(
    batch_size={bs},
    num_workers=8,
    sampler=dict(type="DefaultSampler", shuffle=True),
    dataset=dict(
        type="{train_ds_type}",
        data_root={train_root},
        data_mode="topdown",
        ann_file="{train_ann}",
        data_prefix=dict(img="{train_img}"),{subset}
        pipeline=train_pipeline,
    ),
)
val_dataloader = dict(
    batch_size=32,
    num_workers=8,
    drop_last=False,
    sampler=dict(type="DefaultSampler", shuffle=False, round_up=False),
    dataset=dict(
        type="{ds_type}",
        data_root=data_root,
        data_mode="topdown",
        ann_file="{val_ann}",
        data_prefix=dict(img="{val_img}"),{subset}
        test_mode=True,
        pipeline=val_pipeline,
    ),
)
test_dataloader = val_dataloader

val_evaluator = {evaluator}
test_evaluator = val_evaluator
'''


def emit(path: str, content: str, force: bool = False) -> bool:
    full = os.path.join(CFG, path)
    os.makedirs(os.path.dirname(full), exist_ok=True)
    if os.path.exists(full) and not force:
        return False
    with open(full, "w") as f:
        f.write(content)
    return True


def codec_str(codec_type: str, in_size, hm_size, extra: str = "") -> str:
    return (
        f'dict(type="{codec_type}", input_size={in_size}, heatmap_size={hm_size}'
        + (f", {extra}" if extra else "")
        + ")"
    )


def make_config(
    family_dir: str,
    name: str,
    dataset: str,
    in_size,
    hm_size,
    model_body: str,
    bs: int,
    codec: str,
    use_udp: bool = False,
    ref_rel: str = "",
    halfbody: bool = True,
    extra_test_cfg: str = "",
) -> str:
    d = DATASETS[dataset]
    depth = family_dir.count("/") + 1
    base = "/".join([".."] * depth) + "/_base_/default_runtime.py"
    epochs = d["epochs"]
    milestones = {210: [170, 200], 300: [240, 280], 60: [40, 55], 40: [20, 30], 20: [10, 15]}.get(
        epochs, [int(epochs * 0.8), int(epochs * 0.95)]
    )
    train_on_coco = d["train_ann"] is None
    subset = f'\n        subset="{d["subset"]}",' if "subset" in d else ""
    content = TEMPLATE.format(
        title=name.replace(".py", ""),
        ref_rel=ref_rel or f"{family_dir}/{name}",
        base=base,
        epochs=epochs,
        milestones=milestones,
        base_bs=bs * 8,
        save_best=d["save_best"],
        rule=d.get("rule", "greater"),
        codec=codec,
        model_body=model_body,
        halfbody="\n    dict(type=\"RandomHalfBody\")," if halfbody else "",
        affine_args=", use_udp=True" if use_udp else "",
        root=d["root"],
        bs=bs,
        train_ds_type="CocoDataset" if train_on_coco else d["ds_type"],
        train_root='"data/coco/"' if train_on_coco else "data_root",
        train_ann="annotations/person_keypoints_train2017.json" if train_on_coco else d["train_ann"],
        train_img="train2017/" if train_on_coco else d["train_img"],
        ds_type=d["ds_type"],
        val_ann=d["val_ann"],
        val_img=d["val_img"],
        subset=subset,
        evaluator=d["evaluator"],
        extra_test_cfg=extra_test_cfg,
    )
    return content


def heatmap_model_body(bb_key: str, K: int, in_size) -> str:
    bb_src, head_in, head_extra, _bs = BACKBONES[bb_key]
    W, H = in_size
    bb_src = bb_src.replace("{H}", str(H)).replace("{W}", str(W))
    extra = f"\n        {head_extra}" if head_extra else ""
    return (
        f"backbone={bb_src},\n"
        "    head=dict(\n"
        '        type="HeatmapHead",\n'
        f"        in_channels={head_in},\n"
        f"        out_channels={K},{extra}\n"
        '        loss=dict(type="KeypointMSELoss", use_target_weight=True),\n'
        "        decoder=codec,\n"
        "    ),"
    )


def write_heatmap_config(
    tree: str, dataset: str, bb_key: str, in_size, hm_size,
    codec_type: str = "MSRAHeatmap", codec_extra: str = "sigma=2",
    suffix: str = "", bs=None, force=False,
):
    d = DATASETS[dataset]
    K = d["num_kpts"]
    W, H = in_size
    if bb_key in SPECIAL_MODELS:
        body_t, def_bs = SPECIAL_MODELS[bb_key]
        body = body_t.format(K=K)
    elif bb_key == "rsn18":
        body, def_bs = RSN18.format(HH=hm_size[1], HW=hm_size[0], K=K), 32
    elif bb_key.endswith(("xmspn50", "xrsn50")) or bb_key in ("mspn50", "rsn50"):
        ns = int(bb_key[0]) if bb_key[0].isdigit() else 1
        prefix = "rsn" if "rsn" in bb_key else "mspn"
        body = mspn_model(prefix, ns, K).format(HH=hm_size[1], HW=hm_size[0])
        def_bs = 32
    else:
        body = heatmap_model_body(bb_key, K, in_size)
        def_bs = BACKBONES[bb_key][3]
    bs = bs or def_bs
    use_udp = codec_type == "UDPHeatmap"
    codec = codec_str(codec_type, tuple(in_size), tuple(hm_size), codec_extra)
    epochs = d["epochs"]
    fam = "td-hm"
    name = f"{fam}_{bb_key}{suffix}_8xb{bs}-{epochs}e_{dataset}-{H}x{W}.py"
    family_dir = f"{tree}/{dataset}"
    content = make_config(
        family_dir, name, dataset, tuple(in_size), tuple(hm_size), body, bs, codec,
        use_udp=use_udp,
    )
    return emit(f"{family_dir}/{name}", content, force)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--force", action="store_true")
    args = ap.parse_args()
    n = 0

    S256 = ((192, 256), (48, 64))
    S384 = ((288, 384), (72, 96))
    SQ256 = ((256, 256), (64, 64))
    SQ384 = ((384, 384), (96, 96))
    T = "body_2d_keypoint/topdown_heatmap"

    # ---- COCO topdown heatmap: the big reference tree (~116 recipes) -----
    both_sizes = [
        "res50", "res101", "res152", "resnetv1d50", "resnetv1d101", "resnetv1d152",
        "resnext50", "resnext101", "resnext152", "seresnet50", "seresnet101", "seresnet152",
        "scnet50", "scnet101", "resnest50", "resnest101", "resnest200", "resnest269",
        "hrnet-w32", "hrnet-w48", "mobilenetv2", "shufflenetv1", "shufflenetv2",
        "litehrnet-18", "litehrnet-30", "swin-b-p4-w7", "swin-l-p4-w7",
        "hrformer-small", "hrformer-base",
    ]
    for bb in both_sizes:
        n += write_heatmap_config(T, "coco", bb, *S256)
        n += write_heatmap_config(T, "coco", bb, *S384, codec_extra="sigma=3")
    for bb in ["vgg16-bn", "alexnet", "swin-t-p4-w7", "swin-s-p4-w7", "pvt-s", "pvtv2-b2",
               "vipnas-mbv3", "vipnas-res50", "rsn18"]:
        n += write_heatmap_config(T, "coco", bb, *S256)
    # DARK variants (unbiased decode codec)
    for bb in ["hrnet-w32", "hrnet-w48", "res50", "res101", "res152"]:
        n += write_heatmap_config(T, "coco", bb, *S256, codec_extra="sigma=2, unbiased=True", suffix="_dark")
        n += write_heatmap_config(T, "coco", bb, *S384, codec_extra="sigma=3, unbiased=True", suffix="_dark")
    # UDP variants (hrnet shipped by hand already; cspnext ones here)
    for bb in ["cspnext-tiny_udp", "cspnext-s_udp", "cspnext-m_udp", "cspnext-l_udp"]:
        n += write_heatmap_config(T, "coco", bb, *S256, codec_type="UDPHeatmap")
    # multistage
    n += write_heatmap_config(T, "coco", "mspn50", *S256)
    for k in ["2xmspn50", "3xmspn50", "2xrsn50", "3xrsn50", "rsn50"]:
        n += write_heatmap_config(T, "coco", k, *S256)
    n += write_heatmap_config(T, "coco", "cpm", (192, 256), (24, 32))
    n += write_heatmap_config(T, "coco", "cpm", (288, 384), (36, 48))
    n += write_heatmap_config(T, "coco", "hourglass52", (256, 256), (64, 64))
    n += write_heatmap_config(T, "coco", "hourglass52", (384, 384), (96, 96))
    # ViTPose family
    for bb in ["ViTPose-small", "ViTPose-base", "ViTPose-large", "ViTPose-huge"]:
        n += write_heatmap_config(T, "coco", bb, *S256, codec_type="UDPHeatmap")

    # ---- MPII (reference: 25) -------------------------------------------
    mpii_bbs = ["hrnet-w32", "hrnet-w48", "res50", "res101", "res152", "resnetv1d50",
                "resnetv1d101", "resnetv1d152", "resnext50", "scnet50", "scnet101",
                "seresnet50", "seresnet101", "mobilenetv2", "shufflenetv1", "shufflenetv2",
                "litehrnet-18", "litehrnet-30", "cpm", "hourglass52"]
    for bb in mpii_bbs:
        if bb == "cpm":
            n += write_heatmap_config(T, "mpii", bb, (368, 368), (46, 46))
        elif bb == "hourglass52":
            n += write_heatmap_config(T, "mpii", bb, *SQ256)
        else:
            n += write_heatmap_config(T, "mpii", bb, *SQ256)
    for bb in ["hrnet-w32", "hrnet-w48"]:
        n += write_heatmap_config(T, "mpii", bb, *SQ256, codec_extra="sigma=2, unbiased=True", suffix="_dark")

    # ---- CrowdPose / AIC / JHMDB / HumanArt / PoseTrack18 / OCHuman / ExLPose
    for bb in ["hrnet-w32", "res50", "res101", "res152"]:
        n += write_heatmap_config(T, "crowdpose", bb, *S256)
    n += write_heatmap_config(T, "crowdpose", "cspnext-m_udp", *S256, codec_type="UDPHeatmap")
    for bb in ["hrnet-w32", "res101"]:
        n += write_heatmap_config(T, "aic", bb, *S256)
    for bb in ["cpm", "res50"]:
        if bb == "cpm":
            n += write_heatmap_config(T, "jhmdb", bb, (368, 368), (46, 46))
        else:
            n += write_heatmap_config(T, "jhmdb", bb, *S256)
    for bb in ["hrnet-w32", "hrnet-w48", "ViTPose-small", "ViTPose-base", "ViTPose-large", "ViTPose-huge"]:
        ct = "UDPHeatmap" if bb.startswith("ViTPose") else "MSRAHeatmap"
        n += write_heatmap_config(T, "humanart", bb, *S256, codec_type=ct)
    for bb in ["hrnet-w32", "hrnet-w48", "res50"]:
        n += write_heatmap_config(T, "posetrack18", bb, *S256)
    n += write_heatmap_config(T, "posetrack18", "hrnet-w48", *S384, codec_extra="sigma=3")
    for bb in ["hrnet-w32", "res50", "res101"]:
        n += write_heatmap_config(T, "ochuman", bb, *S256)
    for bb in ["hrnet-w32"]:
        n += write_heatmap_config(T, "exlpose", bb, *S256)

    # ---- wholebody -------------------------------------------------------
    TW = "wholebody_2d_keypoint/topdown_heatmap"
    for bb in ["hrnet-w32", "hrnet-w48", "res50", "res101", "res152", "vipnas-mbv3", "vipnas-res50"]:
        n += write_heatmap_config(TW, "coco-wholebody", bb, *S256)
    for bb in ["hrnet-w32", "hrnet-w48", "res50", "res101", "res152"]:
        n += write_heatmap_config(TW, "coco-wholebody", bb, *S384, codec_extra="sigma=3")
    for bb in ["hrnet-w32", "hrnet-w48"]:
        n += write_heatmap_config(TW, "coco-wholebody", bb, *S256, codec_extra="sigma=2, unbiased=True", suffix="_dark")
    n += write_heatmap_config(TW, "halpe", "hrnet-w48", *S384, codec_extra="sigma=3", suffix="_dark")

    # ---- face ------------------------------------------------------------
    TF = "face_2d_keypoint/topdown_heatmap"
    for ds in ["300w", "wflw", "aflw", "cofw", "lapa", "coco_wholebody_face"]:
        for bb in ["hrnet-w18" if False else "hrnet-w32", "res50", "mobilenetv2", "scnet50", "hourglass52"]:
            n += write_heatmap_config(TF, ds, bb, *SQ256)
    for ds in ["wflw", "300w"]:
        n += write_heatmap_config(TF, ds, "hrnet-w32", *SQ256, codec_extra="sigma=2, unbiased=True", suffix="_dark")

    # ---- hand ------------------------------------------------------------
    TH = "hand_2d_keypoint/topdown_heatmap"
    for ds in ["onehand10k", "rhd2d", "freihand2d", "coco_wholebody_hand", "panoptic_hand2d"]:
        for bb in ["hrnet-w18" if False else "hrnet-w32", "res50", "mobilenetv2", "scnet50", "litehrnet-18"]:
            size = ((224, 224), (56, 56)) if ds == "freihand2d" else SQ256
            n += write_heatmap_config(TH, ds, bb, *size)
    n += write_heatmap_config(TH, "onehand10k", "hrnet-w32", *SQ256, codec_extra="sigma=2, unbiased=True", suffix="_dark")

    # ---- animal ----------------------------------------------------------
    TA = "animal_2d_keypoint/topdown_heatmap"
    for ds in ["ap10k", "animalpose", "ak"]:
        for bb in ["hrnet-w32", "hrnet-w48", "res50", "res101", "cspnext-m_udp"]:
            ct = "UDPHeatmap" if bb.endswith("udp") else "MSRAHeatmap"
            n += write_heatmap_config(TA, ds, bb, *SQ256, codec_type=ct)
    for ds in ["atrw", "horse10", "macaque"]:
        for bb in ["hrnet-w32", "res50", "res101"]:
            n += write_heatmap_config(TA, ds, bb, *SQ256)
    for ds in ["fly", "locust", "zebra"]:
        for bb in ["res50", "res101", "res152"]:
            n += write_heatmap_config(TA, ds, bb, (192, 192), (48, 48))

    # ---- fashion ---------------------------------------------------------
    TFA = "fashion_2d_keypoint/topdown_heatmap"
    for ds in ["deepfashion_upper", "deepfashion_lower", "deepfashion_full"]:
        for bb in ["hrnet-w32", "hrnet-w48", "res50", "res101", "res152", "vipnas-res50"]:
            n += write_heatmap_config(TFA, ds, bb, *S256)

    print(f"emitted {n} new config files")



# ---------------------------------------------------------------------------
# non-heatmap families: regression / RLE / integral / SimCC / RTMPose extra
# datasets / bottomup (AE, DEKR, CID) / 3D lifting
# ---------------------------------------------------------------------------


def write_family_config(tree, dataset, name, codec, model_body, bs, in_size,
                        use_udp=False, halfbody=True, force=False):
    d = DATASETS[dataset]
    family_dir = f"{tree}/{dataset}"
    content = make_config(family_dir, name, dataset, in_size, None, model_body, bs,
                          codec, use_udp=use_udp, halfbody=halfbody)
    return emit(f"{family_dir}/{name}", content, force)


def regression_model_body(bb_key, K, head_type="RegressionHead", in_size=(192, 256)):
    bb_src, head_in, _extra, _bs = BACKBONES[bb_key]
    W, H = in_size
    bb_src = bb_src.replace("{H}", str(H)).replace("{W}", str(W))
    if head_type == "RLEHead":
        loss = 'dict(type="RLELoss", use_target_weight=True)'
    else:
        loss = 'dict(type="SmoothL1Loss", use_target_weight=True)'
    # no GAP neck in the model tree: the regression heads pool internally
    return (
        f"backbone={bb_src},\n"
        "    head=dict(\n"
        f'        type="{head_type}",\n'
        f"        in_channels={head_in},\n"
        f"        num_joints={K},\n"
        f"        loss={loss},\n"
        "        decoder=codec,\n"
        "    ),"
    )


def simcc_model_body(bb_key, K, in_size, feat_hw):
    bb_src, head_in, _extra, _bs = BACKBONES[bb_key]
    W, H = in_size
    bb_src = bb_src.replace("{H}", str(H)).replace("{W}", str(W))
    fh, fw = feat_hw
    return (
        f"backbone={bb_src},\n"
        "    head=dict(\n"
        '        type="SimCCHead",\n'
        f"        in_channels={head_in},\n"
        f"        out_channels={K},\n"
        f'        input_size=codec["input_size"],\n'
        f"        in_featuremap_size=({fw}, {fh}),\n"
        f'        simcc_split_ratio=codec["simcc_split_ratio"],\n'
        '        loss=dict(type="KLDiscretLoss", use_target_weight=True),\n'
        "        decoder=codec,\n"
        "    ),"
    )


def extra_main():
    n = 0
    # -- topdown_regression (reference: coco 9, mpii 4) -------------------
    TR = "body_2d_keypoint/topdown_regression"
    for ds, in_size in (("coco", (192, 256)), ("mpii", (256, 256))):
        d = DATASETS[ds]
        K = d["num_kpts"]
        codec = f'dict(type="RegressionLabel", input_size={in_size})'
        bbs = ["res50", "res101", "res152"] if ds == "coco" else ["res50", "res101"]
        for bb in bbs:
            for head, tag in (("RegressionHead", ""), ("RLEHead", "_rle")):
                name = f"td-reg_{bb}{tag}_8xb64-210e_{ds}-{in_size[1]}x{in_size[0]}.py"
                body = regression_model_body(bb, K, head, in_size)
                n += write_family_config(TR, ds, name, codec, body, 64, in_size)
        if ds == "coco":
            name = f"td-reg_mobilenetv2_rle_8xb64-210e_{ds}-{in_size[1]}x{in_size[0]}.py"
            n += write_family_config(TR, ds, name, codec,
                                     regression_model_body("mobilenetv2", K, "RLEHead", in_size), 64, in_size)

    # -- integral_regression coco (reference: 3) --------------------------
    TI = "body_2d_keypoint/integral_regression"
    codec = 'dict(type="IntegralRegressionLabel", input_size=(192, 256), heatmap_size=(48, 64), sigma=2.0)'
    for name_tag, head, extra in (
        ("ipr_res50_8xb64-210e_coco-192x256.py", "IntegralRegressionHead", ""),
        ("ipr_res50_dsnt-8xb64-210e_coco-192x256.py", "DSNTHead", ""),
        ("ipr_res50_debias-8xb64-210e_coco-192x256.py", "IntegralRegressionHead", "\n        debias=True,"),
    ):
        body = (
            'backbone=dict(type="ResNet", depth=50, out_indices=(3,)),\n'
            "    head=dict(\n"
            f'        type="{head}",\n'
            "        in_channels=2048,\n"
            "        in_featuremap_size=(6, 8),\n"
            "        num_joints=17,"
            f"{extra}\n"
            '        loss=dict(type="SmoothL1Loss", use_target_weight=True),\n'
            "        decoder=codec,\n"
            "    ),"
        )
        n += write_family_config(TI, "coco", name_tag, codec, body, 64, (192, 256))

    # -- simcc coco (reference: 4) ---------------------------------------
    TS = "body_2d_keypoint/simcc"
    codec = 'dict(type="SimCCLabel", input_size=(192, 256), sigma=6.0, simcc_split_ratio=2.0)'
    n += write_family_config(TS, "coco", "simcc_res50_8xb64-210e_coco-256x192.py", codec,
                             simcc_model_body("res50", 17, (192, 256), (8, 6)), 64, (192, 256))
    n += write_family_config(TS, "coco", "simcc_res50_8xb32-140e_coco-384x288.py",
                             'dict(type="SimCCLabel", input_size=(288, 384), sigma=6.0, simcc_split_ratio=2.0)',
                             simcc_model_body("res50", 17, (288, 384), (12, 9)), 32, (288, 384))
    n += write_family_config(TS, "coco", "simcc_mobilenetv2_wo-deconv-8xb64-210e_coco-256x192.py", codec,
                             simcc_model_body("mobilenetv2", 17, (192, 256), (8, 6)), 64, (192, 256))
    n += write_family_config(TS, "coco", "simcc_vipnas-mbv3_8xb64-210e_coco-256x192.py", codec,
                             simcc_model_body("res50", 17, (192, 256), (8, 6)).replace(
                                 'dict(type="ResNet", depth=50, out_indices=(3,))',
                                 'dict(type="ViPNAS_MobileNetV3")').replace("in_channels=2048", "in_channels=160"),
                             64, (192, 256))

    # -- bottomup: associative embedding / DEKR / CID (reference: 1+4+2) --
    def bottomup_config(tree, name, codec, model_body, bs, in_size):
        d = DATASETS["coco"]
        family_dir = f"{tree}/coco"
        W, H = in_size
        content = BOTTOMUP_TEMPLATE.format(
            title=name.replace(".py", ""), base="../../../_base_/default_runtime.py",
            codec=codec, model_body=model_body, bs=bs, W=W, H=H,
        )
        return emit(f"{family_dir}/{name}", content)

    hrnet32 = BACKBONES["hrnet-w32"][0]
    hrnet48 = BACKBONES["hrnet-w48"][0]
    ae_codec = 'dict(type="AssociativeEmbedding", input_size=(512, 512), heatmap_size=(128, 128), sigma=2.0)'
    for bb_name, bb_src, ch, bs in (("hrnet-w32", hrnet32, 32, 24), ("hourglass52", None, 256, 16)):
        if bb_src is None:
            bb_src = 'dict(type="HourglassNet", num_stacks=1)'
        body = (
            f"backbone={bb_src},\n"
            "    head=dict(\n"
            '        type="AssociativeEmbeddingHead",\n'
            f"        in_channels={ch},\n"
            "        num_keypoints=17,\n"
            '        keypoint_loss=dict(type="KeypointMSELoss", use_target_weight=True),\n'
            '        tag_loss=dict(type="AssociativeEmbeddingLoss"),\n'
            "        decoder=codec,\n"
            "    ),"
        )
        n += bottomup_config("body_2d_keypoint/associative_embedding",
                             f"ae_{bb_name}_8xb{bs}-300e_coco-512x512.py", ae_codec, body, bs, (512, 512))

    spr_codec = ('dict(\n    type="SPR", input_size=(512, 512), heatmap_size=(128, 128), sigma=(4, 2),\n'
                 "    minimal_diagonal_length=5.656854249492381, generate_keypoint_heatmaps=True,\n)")
    for bb_name, bb_src, ch, bs in (("hrnet-w32", hrnet32, 32, 10), ("hrnet-w48", hrnet48, 48, 10)):
        body = (
            f"backbone={bb_src},\n"
            "    head=dict(\n"
            '        type="DEKRHead",\n'
            f"        in_channels={ch},\n"
            "        num_keypoints=17,\n"
            '        heatmap_loss=dict(type="KeypointMSELoss", use_target_weight=True),\n'
            '        displacement_loss=dict(type="SoftWeightSmoothL1Loss", use_target_weight=True, supervise_empty=False),\n'
            "        decoder=codec,\n"
            "    ),"
        )
        n += bottomup_config("body_2d_keypoint/dekr",
                             f"dekr_{bb_name}_8xb{bs}-140e_coco-512x512.py", spr_codec, body, bs, (512, 512))

    cid_codec = 'dict(type="DecoupledHeatmap", input_size=(512, 512), heatmap_size=(128, 128))'
    for bb_name, bb_src, ch, bs in (("hrnet-w32", hrnet32, 32, 20), ("hrnet-w48", hrnet48, 48, 20)):
        body = (
            f"backbone={bb_src},\n"
            "    head=dict(\n"
            '        type="CIDHead",\n'
            f"        in_channels={ch},\n"
            "        gfd_channels=32,\n"
            "        num_keypoints=17,\n"
            '        coupled_heatmap_loss=dict(type="FocalHeatmapLoss", loss_weight=1.0),\n'
            '        decoupled_heatmap_loss=dict(type="FocalHeatmapLoss", loss_weight=4.0),\n'
            "        decoder=codec,\n"
            "    ),"
        )
        n += bottomup_config("body_2d_keypoint/cid",
                             f"cid_{bb_name}_8xb{bs}-140e_coco-512x512.py", cid_codec, body, bs, (512, 512))

    # -- video pose lifting h36m (reference: 7) ---------------------------
    for frames, blocks in ((27, 2), (81, 3), (243, 4)):
        name = f"video-pose-lift_tcn-{frames}frm_8xb128-160e_h36m.py"
        content = LIFT_TEMPLATE.format(title=name.replace(".py", ""), frames=frames, blocks=blocks)
        n += emit(f"body_3d_keypoint/video_pose_lift/h36m/{name}", content)

    print(f"emitted {n} extra config files")


BOTTOMUP_TEMPLATE = '''# {title}
# TPU-native counterpart of the reference recipe of the same name.
_base_ = ["{base}"]

train_cfg = dict(max_epochs=140, val_interval=10)

optim_wrapper = dict(optimizer=dict(type="Adam", lr=1e-3))

param_scheduler = [
    dict(type="LinearLR", begin=0, end=500, start_factor=0.001, by_epoch=False),
    dict(type="MultiStepLR", begin=0, end=140, milestones=[90, 120], gamma=0.1, by_epoch=True),
]

auto_scale_lr = dict(base_batch_size={bs})

default_hooks = dict(checkpoint=dict(save_best="coco/AP", rule="greater"))

codec = {codec}

model = dict(
    type="BottomupPoseEstimator",
    data_preprocessor=dict(
        type="PoseDataPreprocessor", mean=[123.675, 116.28, 103.53], std=[58.395, 57.12, 57.375], bgr_to_rgb=True
    ),
    {model_body}
    test_cfg=dict(flip_test=False),
)

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
    dict(type="BottomupResize", input_size=codec["input_size"]),
    dict(type="PackPoseInputs"),
]

data_root = "data/coco/"
train_dataloader = dict(
    batch_size={bs},
    num_workers=8,
    sampler=dict(type="DefaultSampler", shuffle=True),
    dataset=dict(
        type="CocoDataset",
        data_root=data_root,
        data_mode="bottomup",
        ann_file="annotations/person_keypoints_train2017.json",
        data_prefix=dict(img="train2017/"),
        pipeline=train_pipeline,
    ),
)
val_dataloader = dict(
    batch_size=1,
    num_workers=2,
    drop_last=False,
    sampler=dict(type="DefaultSampler", shuffle=False, round_up=False),
    dataset=dict(
        type="CocoDataset",
        data_root=data_root,
        data_mode="bottomup",
        ann_file="annotations/person_keypoints_val2017.json",
        data_prefix=dict(img="val2017/"),
        test_mode=True,
        pipeline=val_pipeline,
    ),
)
test_dataloader = val_dataloader

val_evaluator = dict(
    type="CocoMetric",
    ann_file=data_root + "annotations/person_keypoints_val2017.json",
    nms_mode="none",
    score_mode="keypoint",
)
test_evaluator = val_evaluator
'''


LIFT_TEMPLATE = '''# {title}
# TPU-native counterpart of the reference recipe of the same name
# (/root/reference/configs/body_3d_keypoint/video_pose_lift/h36m/).
_base_ = ["../../../_base_/default_runtime.py"]

train_cfg = dict(max_epochs=160, val_interval=10)

optim_wrapper = dict(optimizer=dict(type="Adam", lr=1e-3))

param_scheduler = [
    dict(type="ExponentialLR", gamma=0.975, by_epoch=True, end=80),
]

auto_scale_lr = dict(base_batch_size=1024)

default_hooks = dict(checkpoint=dict(save_best="MPJPE", rule="less"))

codec = dict(type="VideoPoseLifting", num_keypoints=17, zero_center=True, normalize_camera=True)

model = dict(
    type="PoseLifter",
    backbone=dict(
        type="TCN",
        in_channels=2 * 17,
        stem_channels=1024,
        num_blocks={blocks},
        kernel_sizes=(3,) * ({blocks} + 1),
        dropout=0.25,
        use_stride_conv=True,
    ),
    head=dict(
        type="TemporalRegressionHead",
        in_channels=1024,
        num_joints=17,
        loss=dict(type="MPJPELoss", use_target_weight=True),
        decoder=codec,
    ),
)

train_pipeline = [
    dict(
        type="RandomFlipAroundRoot",
        keypoints_flip_cfg=dict(center_mode="static", center_x=0.0),
        target_flip_cfg=dict(center_mode="static", center_x=0.0),
        flip_prob=0.5,
        flip_camera=True,
    ),
    dict(type="GenerateTarget", encoder=codec),
    dict(type="PackPoseInputs"),
]
val_pipeline = [
    dict(type="GenerateTarget", encoder=codec),
    dict(type="PackPoseInputs"),
]

data_root = "data/h36m/"
train_dataloader = dict(
    batch_size=128,
    num_workers=2,
    sampler=dict(type="DefaultSampler", shuffle=True),
    dataset=dict(
        type="Human36mDataset",
        ann_file=data_root + "annotation_body3d/fps50/h36m_train.npz",
        seq_len={frames},
        causal=False,
        pad_video_seq=True,
        camera_param_file=data_root + "annotation_body3d/cameras.pkl",
        data_root=data_root,
        data_prefix=dict(img="images/"),
        pipeline=train_pipeline,
    ),
)
val_dataloader = dict(
    batch_size=128,
    num_workers=2,
    drop_last=False,
    sampler=dict(type="DefaultSampler", shuffle=False, round_up=False),
    dataset=dict(
        type="Human36mDataset",
        ann_file=data_root + "annotation_body3d/fps50/h36m_test.npz",
        seq_len={frames},
        causal=False,
        pad_video_seq=True,
        camera_param_file=data_root + "annotation_body3d/cameras.pkl",
        data_root=data_root,
        data_prefix=dict(img="images/"),
        test_mode=True,
        pipeline=val_pipeline,
    ),
)
test_dataloader = val_dataloader

val_evaluator = [dict(type="MPJPE", mode="mpjpe"), dict(type="MPJPE", mode="p-mpjpe")]
test_evaluator = val_evaluator
'''


if __name__ == "__main__":
    main()
    extra_main()
