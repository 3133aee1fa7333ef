#!/usr/bin/env python
"""Phase B of reference-recipe config parity (VERDICT r2 missing #1).

Emits the multi-dataset recipes the phase-A generator could not express:
CombinedDataset + KeypointConverter rtmpose trees (body8, body8-halpe26,
aic-coco, humanart, face6, hand5, ubody, coco-wholebody), one-stage variants
(rtmo body7/crowdpose, yoloxpose sizes, dekr), DWPose distillation stages,
3D-lifting variants, and the remaining regression / simcc / integral names —
each under its exact reference filename, hyperparameters mirrored from the
reference config of the same name, model bodies in this package's TPU-native
schema.

Keypoint-index remap tables are extracted from the reference configs as
literal data (configs are the declarative data surface whose schema parity
is the point).

Idempotent: `python tools/gen_parity_configs_b.py` (never overwrites).
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import gen_zoo_configs as Z  # noqa: E402

REF_CFG = os.path.join(os.environ.get("REFERENCE_ROOT", "/root/reference"), "configs")

N = 0


def emit(rel: str, content: str) -> None:
    global N
    N += int(Z.emit(rel, content))


def ref_table(rel: str, name: str):
    """Extract a module-level list assignment from a reference config file.

    The tables are pure data (keypoint index pairs); comprehension shorthand
    like ``[(i, i) for i in range(17)] + [...]`` is evaluated with no
    builtins beyond ``range``.
    """
    text = open(os.path.join(REF_CFG, rel)).read()
    m = re.search(rf"^{name} = (\[.*?\])\s*$(?!\s*[+)\]])", text, re.M | re.S)
    if m is None:
        m = re.search(rf"^{name} = (.+?)(?=\n\S)", text, re.M | re.S)
    src = m.group(1).strip()
    return eval(src, {"__builtins__": {}}, {"range": range})  # noqa: S307 - data only


def fmt_mapping(pairs, indent=8) -> str:
    """Render [(a, b), ...] compactly, wrapped at ~100 cols."""
    parts = [f"({a}, {b})" for a, b in pairs]
    lines, cur = [], ""
    for p in parts:
        if len(cur) + len(p) + 2 > 96:
            lines.append(cur.rstrip())
            cur = ""
        cur += p + ", "
    if cur:
        lines.append(cur.rstrip())
    pad = " " * indent
    inner = ("\n" + pad).join(lines)
    return f"[\n{pad}{inner}\n{' ' * (indent - 4)}]"


# ---------------------------------------------------------------------------
# rtmpose standalone template
# ---------------------------------------------------------------------------

ARCH = {
    "t": (0.167, 0.375, 384),
    "s": (0.33, 0.5, 512),
    "m": (0.67, 0.75, 768),
    "l": (1.0, 1.0, 1024),
    "x": (1.33, 1.25, 1280),
}
SIGMA = {(192, 256): (4.9, 5.66), (288, 384): (6.0, 6.93), (256, 256): (5.66, 5.66)}

RTMPOSE_TPL = '''# {title}
# TPU-native counterpart of the reference config
# configs/{ref_rel}
_base_ = ["{base}"]

max_epochs = {epochs}
base_lr = 4e-3

train_cfg = dict(max_epochs=max_epochs, val_interval=10)

optim_wrapper = dict(
    optimizer=dict(type="AdamW", lr=base_lr, weight_decay=0.05),
    paramwise_cfg=dict(norm_decay_mult=0, bias_decay_mult=0),
)

param_scheduler = [
    dict(type="LinearLR", start_factor=1.0e-5, by_epoch=False, begin=0, end=1000),
    dict(
        type="CosineAnnealingLR",
        eta_min=base_lr * 0.05,
        begin=max_epochs // 2,
        end=max_epochs,
        by_epoch=True,
    ),
]

auto_scale_lr = dict(base_batch_size={base_bs})

codec = dict(
    type="SimCCLabel", input_size=({W}, {H}), sigma=({sx}, {sy}), simcc_split_ratio=2.0, normalize=False,
    use_dark=False,
)

model = dict(
    type="TopdownPoseEstimator",
    data_preprocessor=dict(
        type="PoseDataPreprocessor", mean=[123.675, 116.28, 103.53], std=[58.395, 57.12, 57.375], bgr_to_rgb=True
    ),
    backbone=dict(
        type="CSPNeXt",
        arch="P5",
        expand_ratio=0.5,
        deepen_factor={deepen},
        widen_factor={widen},
        out_indices=(4,),
        channel_attention=True,
    ),
    head=dict(
        type="RTMCCHead",
        in_channels={head_in},
        out_channels={K},
        input_size=codec["input_size"],
        in_featuremap_size=({fw}, {fh}),
        simcc_split_ratio=codec["simcc_split_ratio"],
        final_layer_kernel_size=7,
        gau_cfg=dict(
            hidden_dims=256,
            s=128,
            expansion_factor=2,
            dropout_rate=0.0,
            drop_path=0.0,
            act_fn="SiLU",
            use_rel_bias=False,
            pos_enc=False,
        ),
        loss=dict(type="KLDiscretLoss", use_target_weight=True, beta=10.0, label_softmax=True),
        decoder=codec,
    ),
    test_cfg=dict(flip_test=True),
)

train_pipeline = [
    dict(type="LoadImage"),
    dict(type="GetBBoxCenterScale"),
    dict(type="RandomFlip", direction="horizontal"),
{halfbody}    dict(type="RandomBBoxTransform", scale_factor=(0.6, 1.4), rotate_factor=60),
    dict(type="TopdownAffine", input_size=codec["input_size"]),
    dict(type="PhotometricDistortion"),
    dict(type="GenerateTarget", encoder=codec{genkw}),
    dict(type="PackPoseInputs"),
]
val_pipeline = [
    dict(type="LoadImage"),
    dict(type="GetBBoxCenterScale"),
    dict(type="TopdownAffine", input_size=codec["input_size"]),
    dict(type="PackPoseInputs"),
]

data_root = "{data_root}"

{data_section}

{evaluator_section}
'''


def rtmpose(rel: str, *, sz: str, K: int, in_size, epochs: int, bs: int,
            data_section: str, evaluator_section: str, data_root: str = "data/",
            halfbody: bool = True, dataset_weights: bool = False, world_bs: int | None = None):
    name = os.path.basename(rel)
    depth = rel.count("/")
    deepen, widen, head_in = ARCH[sz]
    W, H = in_size
    sx, sy = SIGMA[(W, H)]
    content = RTMPOSE_TPL.format(
        title=name[:-3],
        ref_rel=rel,
        base="/".join([".."] * depth) + "/_base_/default_runtime.py",
        epochs=epochs,
        base_bs=world_bs or bs * 8,
        W=W, H=H, sx=sx, sy=sy,
        deepen=deepen, widen=widen, head_in=head_in, K=K,
        fw=W // 32, fh=H // 32,
        halfbody='    dict(type="RandomHalfBody"),\n' if halfbody else "",
        genkw=", use_dataset_keypoint_weights=True" if dataset_weights else "",
        data_root=data_root,
        data_section=data_section.strip(),
        evaluator_section=evaluator_section.strip(),
    )
    emit(rel, content)


def single_loader(ds_type: str, train_ann: str, train_img: str, val_ann: str,
                  val_img: str, bs: int, val_bs: int = 32, bbox_file: str | None = None) -> str:
    return f'''train_dataloader = dict(
    batch_size={bs},
    num_workers=4,
    sampler=dict(type="DefaultSampler", shuffle=True),
    dataset=dict(
        type="{ds_type}",
        data_root=data_root,
        data_mode="topdown",
        ann_file="{train_ann}",
        data_prefix=dict(img="{train_img}"),
        pipeline=train_pipeline,
    ),
)
val_dataloader = dict(
    batch_size={val_bs},
    num_workers=4,
    drop_last=False,
    sampler=dict(type="DefaultSampler", shuffle=False, round_up=False),
    dataset=dict(
        type="{ds_type}",
        data_root=data_root,
        data_mode="topdown",
        ann_file="{val_ann}",
        data_prefix=dict(img="{val_img}"),
        test_mode=True,
        pipeline=val_pipeline,
    ),
)
test_dataloader = val_dataloader'''


def combined_loader(datasets_block: str, dataset_vars: list, metainfo: str, bs: int,
                    val_block: str) -> str:
    names = ",\n            ".join(dataset_vars)
    return f'''{datasets_block}

train_dataloader = dict(
    batch_size={bs},
    num_workers=4,
    sampler=dict(type="DefaultSampler", shuffle=True),
    dataset=dict(
        type="CombinedDataset",
        metainfo=dict(dataset_name="{metainfo}"),
        datasets=[
            {names},
        ],
        pipeline=train_pipeline,
        test_mode=False,
    ),
)
{val_block}'''


def coco_val_block(val_bs: int = 32, detfile: bool = False) -> str:
    bbox = (
        '\n        bbox_file="data/coco/person_detection_results/COCO_val2017_detections_AP_H_56_person.json",'
        if detfile else ""
    )
    return f'''val_dataloader = dict(
    batch_size={val_bs},
    num_workers=4,
    drop_last=False,
    sampler=dict(type="DefaultSampler", shuffle=False, round_up=False),
    dataset=dict(
        type="CocoDataset",
        data_root="data/coco/",
        data_mode="topdown",
        ann_file="annotations/person_keypoints_val2017.json",{bbox}
        data_prefix=dict(img="val2017/"),
        test_mode=True,
        pipeline=val_pipeline,
    ),
)
test_dataloader = val_dataloader'''


COCO_EVAL = '''val_evaluator = dict(type="CocoMetric", ann_file="data/coco/annotations/person_keypoints_val2017.json")
test_evaluator = val_evaluator'''


# keypoint remaps onto COCO-17 (reference body8 config tables)
AIC_COCO = [(0, 6), (1, 8), (2, 10), (3, 5), (4, 7), (5, 9), (6, 12), (7, 14), (8, 16),
            (9, 11), (10, 13), (11, 15)]
CROWDPOSE_COCO = [(i, i + 5) for i in range(12)]
MPII_COCO = [(0, 16), (1, 14), (2, 12), (3, 11), (4, 13), (5, 15), (10, 10), (11, 8),
             (12, 6), (13, 5), (14, 7), (15, 9)]
JHMDB_COCO = [(3, 6), (4, 5), (5, 12), (6, 11), (7, 8), (8, 7), (9, 14), (10, 13),
              (11, 10), (12, 9), (13, 16), (14, 15)]


def body_datasets_block(num_kpts: int, tables: dict, members: list) -> str:
    """Render the per-dataset dicts with KeypointConverter remaps."""
    specs = {
        "coco": ("CocoDataset", "coco/annotations/person_keypoints_train2017.json",
                 "detection/coco/train2017/"),
        "aic": ("AicDataset", "aic/annotations/aic_train.json",
                "pose/ai_challenge/ai_challenger_keypoint_train_20170902/keypoint_train_images_20170902/"),
        "crowdpose": ("CrowdPoseDataset", "crowdpose/annotations/mmpose_crowdpose_trainval.json",
                      "pose/CrowdPose/images/"),
        "mpii": ("MpiiDataset", "mpii/annotations/mpii_train.json", "pose/MPI/images/"),
        "jhmdb": ("JhmdbDataset", "jhmdb/annotations/Sub1_train.json", "pose/JHMDB/"),
        "halpe": ("HalpeDataset", "halpe/annotations/halpe_train_v1.json",
                  "pose/Halpe/hico_20160224_det/images/train2015"),
        "posetrack": ("PoseTrack18Dataset", "posetrack18/annotations/posetrack18_train.json",
                      "pose/PoseChallenge2018/"),
        "ochuman": ("OCHumanDataset", "ochuman/annotations/ochuman_coco_format_val_range_0.00_1.00.json",
                    "pose/OCHuman/images/"),
    }
    out = []
    for key in members:
        ds_type, ann, img = specs[key]
        table = tables.get(key)
        if table is None:
            pipeline = "[]"
        else:
            pipeline = (f'[dict(type="KeypointConverter", num_keypoints={num_kpts}, '
                        f"mapping={fmt_mapping(table)})]")
        out.append(
            f'dataset_{key} = dict(\n'
            f'    type="{ds_type}", data_root=data_root, data_mode="topdown",\n'
            f'    ann_file="{ann}",\n'
            f'    data_prefix=dict(img="{img}"),\n'
            f"    pipeline={pipeline},\n"
            f")"
        )
    return "\n".join(out)


def g_humanart():
    T = "body_2d_keypoint/rtmpose/humanart"
    for sz in ("t", "s", "l"):
        data = single_loader(
            "HumanArtDataset", "HumanArt/annotations/training_humanart_coco.json", "",
            "HumanArt/annotations/validation_humanart.json", "", 256)
        ev = ('val_evaluator = dict(type="CocoMetric", '
              'ann_file=data_root + "HumanArt/annotations/validation_humanart.json")\n'
              "test_evaluator = val_evaluator")
        rtmpose(f"{T}/rtmpose-{sz}_8xb256-420e_humanart-256x192.py", sz=sz, K=17,
                in_size=(192, 256), epochs=420, bs=256, data_section=data, evaluator_section=ev)


def g_aic_coco():
    T = "body_2d_keypoint/rtmpose/coco"
    tables = {"aic": AIC_COCO}
    for sz, sizes in (("t", [(192, 256)]), ("s", [(192, 256)]),
                      ("m", [(192, 256), (288, 384)]), ("l", [(192, 256), (288, 384)])):
        for (w, h) in sizes:
            tag = f"{h}x{w}"
            block = body_datasets_block(17, tables, ["coco", "aic"])
            data = combined_loader(block, ["dataset_coco", "dataset_aic"], "coco", 256,
                                   coco_val_block(detfile=True))
            rtmpose(f"{T}/rtmpose-{sz}_8xb256-420e_aic-coco-{tag}.py", sz=sz, K=17,
                    in_size=(w, h), epochs=420, bs=256, data_section=data,
                    evaluator_section=COCO_EVAL, dataset_weights=True)


def g_body8():
    T = "body_2d_keypoint/rtmpose/body8"
    tables = {"aic": AIC_COCO, "crowdpose": CROWDPOSE_COCO, "mpii": MPII_COCO,
              "jhmdb": JHMDB_COCO, "posetrack": [(0, 0)] + [(i, i) for i in range(3, 17)]}
    members = ["coco", "aic", "crowdpose", "mpii", "jhmdb", "halpe", "posetrack", "ochuman"]
    dataset_vars = [f"dataset_{m}" for m in members]
    for sz, sizes in (("t", [(192, 256)]), ("s", [(192, 256)]),
                      ("m", [(288, 384)]), ("l", [(192, 256), (288, 384)])):
        for (w, h) in sizes:
            tag = f"{h}x{w}"
            block = body_datasets_block(17, tables, members)
            data = combined_loader(block, dataset_vars, "coco", 256, coco_val_block(detfile=True))
            rtmpose(f"{T}/rtmpose-{sz}_8xb256-420e_body8-{tag}.py", sz=sz, K=17,
                    in_size=(w, h), epochs=420, bs=256, data_section=data,
                    evaluator_section=COCO_EVAL, dataset_weights=True)


def g_body8_halpe26():
    T = "body_2d_keypoint/rtmpose/body8"
    ref = "body_2d_keypoint/rtmpose/body8/rtmpose-m_8xb512-700e_body8-halpe26-256x192.py"
    tables = {
        "coco": ref_table(ref, "coco_halpe26"),
        "aic": ref_table(ref, "aic_halpe26"),
        "crowdpose": ref_table(ref, "crowdpose_halpe26"),
        "mpii": ref_table(ref, "mpii_halpe26"),
        "jhmdb": ref_table(ref, "jhmdb_halpe26"),
        "posetrack": ref_table(ref, "posetrack_halpe26"),
    }
    members = ["coco", "aic", "crowdpose", "mpii", "jhmdb", "halpe", "posetrack"]
    dataset_vars = [f"dataset_{m}" for m in members]
    ev = ('val_evaluator = [dict(type="PCKAccuracy", thr=0.1), dict(type="AUC")]\n'
          "test_evaluator = val_evaluator")
    val = '''val_dataloader = dict(
    batch_size=64,
    num_workers=4,
    drop_last=False,
    sampler=dict(type="DefaultSampler", shuffle=False, round_up=False),
    dataset=dict(
        type="HalpeDataset",
        data_root=data_root,
        data_mode="topdown",
        ann_file="halpe/annotations/halpe_val_v1.json",
        data_prefix=dict(img="detection/coco/val2017/"),
        test_mode=True,
        pipeline=val_pipeline,
    ),
)
test_dataloader = val_dataloader'''
    plans = [("t", (192, 256), 1024), ("s", (192, 256), 1024), ("m", (192, 256), 512),
             ("m", (288, 384), 512), ("l", (192, 256), 512), ("l", (288, 384), 512),
             ("x", (288, 384), 256)]
    for sz, (w, h), bs in plans:
        tag = f"{h}x{w}"
        block = body_datasets_block(26, tables, members)
        data = combined_loader(block, dataset_vars, "halpe26", bs, val)
        rtmpose(f"{T}/rtmpose-{sz}_8xb{bs}-700e_body8-halpe26-{tag}.py", sz=sz, K=26,
                in_size=(w, h), epochs=700, bs=bs, data_section=data,
                evaluator_section=ev, dataset_weights=True)


CWB_EVAL = ('val_evaluator = dict(type="CocoWholeBodyMetric", '
            'ann_file=data_root + "coco/annotations/coco_wholebody_val_v1.0.json")\n'
            "test_evaluator = val_evaluator")


def g_cwb_rtmpose():
    T = "wholebody_2d_keypoint/rtmpose/coco-wholebody"
    for sz, (w, h), bs, ep_tag in (("l", (192, 256), 64, "8xb64-270e"),
                                   ("l", (288, 384), 32, "8xb32-270e"),
                                   ("x", (288, 384), 32, "8xb32-270e")):
        tag = f"{h}x{w}"
        data = single_loader(
            "CocoWholeBodyDataset", "coco/annotations/coco_wholebody_train_v1.0.json",
            "detection/coco/train2017/", "coco/annotations/coco_wholebody_val_v1.0.json",
            "detection/coco/val2017/", bs)
        rtmpose(f"{T}/rtmpose-{sz}_{ep_tag}_coco-wholebody-{tag}.py", sz=sz, K=133,
                in_size=(w, h), epochs=270, bs=bs, data_section=data, evaluator_section=CWB_EVAL)


UBODY_SCENES = ["Magic_show", "Entertainment", "ConductMusic", "Online_class", "TalkShow",
                "Speech", "Fitness", "Interview", "Olympic", "TVShow", "Singing",
                "SignLanguage", "Movie", "LiveVlog", "VideoConference"]


def g_ubody():
    T = "wholebody_2d_keypoint/rtmpose/ubody"
    scenes = ", ".join(f'"{s}"' for s in UBODY_SCENES)
    block = f'''scenes = [{scenes}]

dataset_coco = dict(
    type="CocoWholeBodyDataset", data_root="data/coco/", data_mode="topdown",
    ann_file="annotations/coco_wholebody_train_v1.0.json",
    data_prefix=dict(img="train2017/"),
    pipeline=[],
)
ubody_datasets = [
    dict(
        type="UBody2dDataset", data_root=data_root, data_mode="topdown",
        ann_file=f"annotations/{{scene}}/train_annotations.json",
        data_prefix=dict(img="images/"),
        pipeline=[],
        sample_interval=10,
    )
    for scene in scenes
]'''
    val = '''val_dataloader = dict(
    batch_size=32,
    num_workers=4,
    drop_last=False,
    sampler=dict(type="DefaultSampler", shuffle=False, round_up=False),
    dataset=dict(
        type="CocoWholeBodyDataset",
        data_root="data/coco/",
        data_mode="topdown",
        ann_file="annotations/coco_wholebody_val_v1.0.json",
        bbox_file="data/coco/person_detection_results/COCO_val2017_detections_AP_H_56_person.json",
        data_prefix=dict(img="val2017/"),
        test_mode=True,
        pipeline=val_pipeline,
    ),
)
test_dataloader = val_dataloader'''
    ev = ('val_evaluator = dict(type="CocoWholeBodyMetric", '
          'ann_file="data/coco/annotations/coco_wholebody_val_v1.0.json")\n'
          "test_evaluator = val_evaluator")
    plans = [("t", (192, 256), 64), ("s", (192, 256), 64), ("m", (192, 256), 64),
             ("l", (192, 256), 64), ("x", (192, 256), 64),
             ("l", (288, 384), 32), ("x", (288, 384), 32)]
    for sz, (w, h), bs in plans:
        tag = f"{h}x{w}"
        data = combined_loader(block, ["dataset_coco", "*ubody_datasets"], "coco_wholebody", bs, val)
        rtmpose(f"{T}/rtmpose-{sz}_8xb{bs}-270e_coco-ubody-wholebody-{tag}.py", sz=sz, K=133,
                in_size=(w, h), epochs=270, bs=bs, data_section=data, evaluator_section=ev,
                data_root="data/UBody/")


def g_face_hand():
    # coco-wholebody-face rtmpose-m (reference face_2d_keypoint/rtmpose/coco_wholebody_face)
    T = "face_2d_keypoint/rtmpose/coco_wholebody_face"
    data = single_loader(
        "CocoWholeBodyFaceDataset", "coco/annotations/coco_wholebody_train_v1.0.json",
        "detection/coco/train2017/", "coco/annotations/coco_wholebody_val_v1.0.json",
        "detection/coco/val2017/", 32)
    ev = 'val_evaluator = dict(type="NME", norm_mode="keypoint_distance")\ntest_evaluator = val_evaluator'
    rtmpose(f"{T}/rtmpose-m_8xb32-60e_coco-wholebody-face-256x256.py", sz="m", K=68,
            in_size=(256, 256), epochs=60, bs=32, data_section=data, evaluator_section=ev,
            halfbody=False)

    # face6: 6-dataset LaPa-106 combination (reference face6 config tables)
    T6 = "face_2d_keypoint/rtmpose/face6"
    ref6 = "face_2d_keypoint/rtmpose/face6/rtmpose-m_8xb256-120e_face6-256x256.py"
    kpt_68_to_106 = ref_table(ref6, "kpt_68_to_106")
    mapping_halpe = ref_table(ref6, "mapping_halpe")
    mapping_wflw = ref_table(ref6, "mapping_wflw")
    mapping_cofw = ref_table(ref6, "mapping_cofw")
    conv = lambda tbl: (f'[dict(type="KeypointConverter", num_keypoints=106, '  # noqa: E731
                        f"mapping={fmt_mapping(tbl, indent=8)})]")
    block = f'''dataset_lapa = dict(
    type="LapaDataset", data_root=data_root, data_mode="topdown",
    ann_file="LaPa/annotations/lapa_trainval.json",
    data_prefix=dict(img="pose/LaPa/"),
    pipeline=[],
)
dataset_cwf = dict(
    type="CocoWholeBodyFaceDataset", data_root=data_root, data_mode="topdown",
    ann_file="coco/annotations/coco_wholebody_train_v1.0.json",
    data_prefix=dict(img="detection/coco/train2017/"),
    pipeline={conv(kpt_68_to_106)},
)
dataset_wflw = dict(
    type="WFLWDataset", data_root=data_root, data_mode="topdown",
    ann_file="wflw/annotations/face_landmarks_wflw_train.json",
    data_prefix=dict(img="pose/WFLW/images/"),
    pipeline={conv(mapping_wflw)},
)
dataset_300w = dict(
    type="Face300WDataset", data_root=data_root, data_mode="topdown",
    ann_file="300w/annotations/face_landmarks_300w_train.json",
    data_prefix=dict(img="pose/300w/images/"),
    pipeline={conv(kpt_68_to_106)},
)
dataset_cofw = dict(
    type="COFWDataset", data_root=data_root, data_mode="topdown",
    ann_file="cofw/annotations/cofw_train.json",
    data_prefix=dict(img="pose/COFW/images/"),
    pipeline={conv(mapping_cofw)},
)
dataset_halpe = dict(
    type="HalpeDataset", data_root=data_root, data_mode="topdown",
    ann_file="halpe/annotations/halpe_train_v1.json",
    data_prefix=dict(img="pose/Halpe/hico_20160224_det/images/train2015/"),
    pipeline={conv(mapping_halpe)},
)'''
    val6 = '''val_dataloader = dict(
    batch_size=32,
    num_workers=4,
    drop_last=False,
    sampler=dict(type="DefaultSampler", shuffle=False, round_up=False),
    dataset=dict(
        type="LapaDataset",
        data_root=data_root,
        data_mode="topdown",
        ann_file="LaPa/annotations/lapa_test.json",
        data_prefix=dict(img="pose/LaPa/"),
        test_mode=True,
        pipeline=val_pipeline,
    ),
)
test_dataloader = val_dataloader'''
    members6 = ["dataset_lapa", "dataset_cwf", "dataset_wflw", "dataset_300w",
                "dataset_cofw", "dataset_halpe"]
    ev6 = 'val_evaluator = dict(type="NME", norm_mode="keypoint_distance")\ntest_evaluator = val_evaluator'
    for sz in ("t", "s", "m"):
        data = combined_loader(block, members6, "lapa", 256, val6)
        rtmpose(f"{T6}/rtmpose-{sz}_8xb256-120e_face6-256x256.py", sz=sz, K=106,
                in_size=(256, 256), epochs=120, bs=256, data_section=data,
                evaluator_section=ev6, halfbody=False, dataset_weights=True)

    # hand5: 5-dataset hand-21 combination
    TH = "hand_2d_keypoint/rtmpose/hand5"
    rhd_map = [(0, 0), (1, 4), (2, 3), (3, 2), (4, 1), (5, 8), (6, 7), (7, 6), (8, 5),
               (9, 12), (10, 11), (11, 10), (12, 9), (13, 16), (14, 15), (15, 14), (16, 13),
               (17, 20), (18, 19), (19, 18), (20, 17)]
    blockh = f'''dataset_coco = dict(
    type="CocoWholeBodyHandDataset", data_root=data_root, data_mode="topdown",
    ann_file="coco/annotations/coco_wholebody_train_v1.0.json",
    data_prefix=dict(img="detection/coco/train2017/"),
    pipeline=[],
)
dataset_onehand10k = dict(
    type="OneHand10KDataset", data_root=data_root, data_mode="topdown",
    ann_file="onehand10k/annotations/onehand10k_train.json",
    data_prefix=dict(img="pose/OneHand10K/"),
    pipeline=[],
)
dataset_freihand = dict(
    type="FreiHandDataset", data_root=data_root, data_mode="topdown",
    ann_file="freihand/annotations/freihand_train.json",
    data_prefix=dict(img="pose/FreiHand/"),
    pipeline=[],
)
dataset_rhd = dict(
    type="Rhd2DDataset", data_root=data_root, data_mode="topdown",
    ann_file="rhd/annotations/rhd_train.json",
    data_prefix=dict(img="pose/RHD/"),
    pipeline=[dict(type="KeypointConverter", num_keypoints=21, mapping={fmt_mapping(rhd_map, indent=8)})],
)
dataset_halpehand = dict(
    type="HalpeHandDataset", data_root=data_root, data_mode="topdown",
    ann_file="halpe/annotations/halpe_train_v1.json",
    data_prefix=dict(img="pose/Halpe/hico_20160224_det/images/train2015/"),
    pipeline=[],
)'''
    valh = '''val_dataloader = dict(
    batch_size=32,
    num_workers=4,
    drop_last=False,
    sampler=dict(type="DefaultSampler", shuffle=False, round_up=False),
    dataset=dict(
        type="CocoWholeBodyHandDataset",
        data_root=data_root,
        data_mode="topdown",
        ann_file="coco/annotations/coco_wholebody_val_v1.0.json",
        data_prefix=dict(img="detection/coco/val2017/"),
        test_mode=True,
        pipeline=val_pipeline,
    ),
)
test_dataloader = val_dataloader'''
    membersh = ["dataset_coco", "dataset_onehand10k", "dataset_freihand", "dataset_rhd",
                "dataset_halpehand"]
    evh = ('val_evaluator = [dict(type="PCKAccuracy", thr=0.2), dict(type="AUC"), dict(type="EPE")]\n'
           "test_evaluator = val_evaluator")
    data = combined_loader(blockh, membersh, "coco_wholebody_hand", 256, valh)
    rtmpose(f"{TH}/rtmpose-m_8xb256-210e_hand5-256x256.py", sz="m", K=21,
            in_size=(256, 256), epochs=210, bs=256, data_section=data,
            evaluator_section=evh, halfbody=False, dataset_weights=True)


def main():
    g_humanart()
    g_aic_coco()
    g_body8()
    g_body8_halpe26()
    g_cwb_rtmpose()
    g_ubody()
    g_face_hand()
    print(f"emitted {N} new phase-B configs")


if __name__ == "__main__":
    main()


# ---------------------------------------------------------------------------
# part 2: one-stage variants + DWPose distillation
# ---------------------------------------------------------------------------

BOTTOMUP_SPECS = {
    "coco": ("CocoDataset", "coco/annotations/person_keypoints_train2017.json", "detection/coco/train2017/"),
    "aic": ("AicDataset", "aic/annotations/aic_train.json",
            "pose/ai_challenge/ai_challenger_keypoint_train_20170902/keypoint_train_images_20170902/"),
    "crowdpose": ("CrowdPoseDataset", "crowdpose/annotations/mmpose_crowdpose_trainval.json",
                  "pose/CrowdPose/images/"),
    "mpii": ("MpiiDataset", "mpii/annotations/mpii_train.json", "pose/MPI/images/"),
    "jhmdb": ("JhmdbDataset", "jhmdb/annotations/Sub1_train.json", "pose/JHMDB/"),
    "halpe": ("HalpeDataset", "halpe/annotations/halpe_train_v1.json",
              "pose/Halpe/hico_20160224_det/images/train2015"),
    "posetrack": ("PoseTrack18Dataset", "posetrack18/annotations/posetrack18_train.json",
                  "pose/PoseChallenge2018/"),
}


def bottomup_combined_block(num_kpts: int, tables: dict, members: list, metainfo: str,
                            pipeline_var: str = "train_pipeline_stage1") -> str:
    out = ['data_root = "data/"']
    for key in members:
        ds_type, ann, img = BOTTOMUP_SPECS[key]
        table = tables.get(key)
        pipeline = ("[]" if table is None else
                    f'[dict(type="KeypointConverter", num_keypoints={num_kpts}, '
                    f"mapping={fmt_mapping(table)})]")
        out.append(
            f'dataset_{key} = dict(\n'
            f'    type="{ds_type}", data_root=data_root, data_mode="bottomup",\n'
            f'    ann_file="{ann}",\n'
            f'    data_prefix=dict(img="{img}"),\n'
            f"    pipeline={pipeline},\n"
            f")"
        )
    names = ",\n            ".join(f"dataset_{m}" for m in members)
    out.append(f'''train_dataloader = dict(
    dataset=dict(
        _delete_=True,
        type="CombinedDataset",
        metainfo=dict(dataset_name="{metainfo}"),
        datasets=[
            {names},
        ],
        pipeline={pipeline_var},
        test_mode=False,
    ),
)''')
    return "\n".join(out)


RTMO_BODY7_TABLES = {
    "aic": AIC_COCO,
    "crowdpose": CROWDPOSE_COCO,
    "mpii": MPII_COCO,
    "jhmdb": JHMDB_COCO,
    "posetrack": [(0, 0)] + [(i, i) for i in range(3, 17)],
}
BODY7_MEMBERS = ["coco", "aic", "crowdpose", "mpii", "jhmdb", "halpe", "posetrack"]


def g_rtmo():
    T = "body_2d_keypoint/rtmo"
    # body7: s/m/l inherit the coco recipe of the same size and swap in the
    # 7-dataset CombinedDataset (reference rtmo body7 configs)
    size_base = {
        "s": "rtmo-s_8xb32-600e_coco-640x640.py",
        "m": "rtmo-m_16xb16-600e_coco-640x640.py",
        "l": "rtmo-l_16xb16-600e_coco-640x640.py",
    }
    name_of = {
        "s": "rtmo-s_8xb32-600e_body7-640x640.py",
        "m": "rtmo-m_16xb16-600e_body7-640x640.py",
        "l": "rtmo-l_16xb16-600e_body7-640x640.py",
    }
    for sz, base in size_base.items():
        block = bottomup_combined_block(17, RTMO_BODY7_TABLES, BODY7_MEMBERS, "coco")
        emit(f"{T}/body7/{name_of[sz]}", f'''# RTMO-{sz} trained on the Body7 CombinedDataset (7 body keypoint sets
# remapped onto COCO-17). TPU-native counterpart of the reference config
# configs/body_2d_keypoint/rtmo/body7/{name_of[sz]}
_base_ = ["../coco/{base}"]

# the combined dataset reuses the base recipe's stage-1 train pipeline
train_pipeline_stage1 = _base_.train_pipeline_stage1

{block}
''')
    # rtmo-t: 416x416 body7 with narrower CSPDarknet (reference rtmo-t
    # widen 0.375 / deepen 0.33, neck channels [96, 192, 384])
    block = bottomup_combined_block(17, RTMO_BODY7_TABLES, BODY7_MEMBERS, "coco")
    emit(f"{T}/body7/rtmo-t_8xb32-600e_body7-416x416.py", f'''# RTMO-t: 416x416 one-stage pose on Body7.
# TPU-native counterpart of the reference config
# configs/body_2d_keypoint/rtmo/body7/rtmo-t_8xb32-600e_body7-416x416.py
_base_ = ["../coco/rtmo-s_8xb32-600e_coco-640x640.py"]

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
    neck=dict(in_channels=[96, 192, 384], deepen_factor=deepen_factor, widen_factor=widen_factor),
    head=dict(head_module_cfg=dict(widen_factor=widen_factor)),
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
    dict(type="YOLOXMixUp", img_scale=(416, 416), ratio_range=(0.8, 1.6), pad_val=114.0),
    dict(type="YOLOXHSVRandomAug"),
    dict(type="RandomFlip"),
    dict(type="FilterAnnotations", by_kpt=True, by_box=True, keep_empty=False),
    dict(type="PackOneStageInputs"),
]
train_pipeline_stage2 = [
    dict(type="LoadImage"),
    dict(
        type="BottomupRandomAffine",
        input_size=(416, 416),
        shift_prob=0,
        rotate_prob=0,
        scale_prob=0,
        scale_type="long",
        pad_val=(114, 114, 114),
        bbox_keep_corner=False,
        clip_border=True,
    ),
    dict(type="YOLOXHSVRandomAug"),
    dict(type="RandomFlip"),
    dict(type="BottomupGetHeatmapMask", get_invalid=True),
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

{block}

val_dataloader = dict(dataset=dict(pipeline=val_pipeline))
test_dataloader = val_dataloader
''')
    # crowdpose fine-tune recipes (14 kpts)
    ref_b7cp = "body_2d_keypoint/rtmo/crowdpose/rtmo-l_16xb16-700e_body7-crowdpose-640x640.py"
    cp_eval = '''val_dataloader = dict(
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
    type="CocoMetric",
    ann_file="data/crowdpose/annotations/mmpose_crowdpose_test.json",
    use_area=False,
    iou_type="keypoints_crowd",
    prefix="crowdpose",
)
test_evaluator = val_evaluator'''
    head_override = '''model = dict(
    head=dict(
        num_keypoints=14,
        assigner=dict(oks_calculator=dict(metainfo="crowdpose")),
        loss_oks=dict(metainfo="crowdpose"),
    ),
)'''
    for sz, base, name in (
        ("s", "rtmo-s_8xb32-600e_coco-640x640.py", "rtmo-s_8xb32-700e_crowdpose-640x640.py"),
        ("m", "rtmo-m_16xb16-600e_coco-640x640.py", "rtmo-m_16xb16-700e_crowdpose-640x640.py"),
        ("l", "rtmo-l_16xb16-600e_coco-640x640.py", "rtmo-l_16xb16-700e_crowdpose-640x640.py"),
    ):
        emit(f"{T}/crowdpose/{name}", f'''# RTMO-{sz} on CrowdPose (14 keypoints).
# TPU-native counterpart of the reference config
# configs/body_2d_keypoint/rtmo/crowdpose/{name}
_base_ = ["../coco/{base}"]

train_cfg = dict(max_epochs=700, val_interval=20, dynamic_intervals=[(670, 1)])

{head_override}

train_dataloader = dict(
    dataset=dict(
        _delete_=True,
        type="CrowdPoseDataset",
        data_root="data/crowdpose/",
        data_mode="bottomup",
        ann_file="annotations/mmpose_crowdpose_trainval.json",
        data_prefix=dict(img="images/"),
        pipeline=_base_.train_pipeline_stage1,
    ),
)

{cp_eval}
''')
    # body7 -> crowdpose: the 7 body sets remapped onto the CrowdPose-14
    # skeleton (reference mapping tables extracted as data)
    cp_tables = {
        "coco": ref_table(ref_b7cp, "coco_crowdpose"),
        "aic": ref_table(ref_b7cp, "aic_crowdpose"),
        "mpii": ref_table(ref_b7cp, "mpii_crowdpose"),
        "jhmdb": ref_table(ref_b7cp, "jhmdb_crowdpose"),
        "halpe": ref_table(ref_b7cp, "halpe_crowdpose"),
        "posetrack": ref_table(ref_b7cp, "posetrack_crowdpose"),
    }
    block = bottomup_combined_block(14, cp_tables, BODY7_MEMBERS, "crowdpose")
    emit(f"{T}/crowdpose/rtmo-l_16xb16-700e_body7-crowdpose-640x640.py", f'''# RTMO-l trained on Body7 remapped onto the CrowdPose-14 skeleton.
# TPU-native counterpart of the reference config
# configs/body_2d_keypoint/rtmo/crowdpose/rtmo-l_16xb16-700e_body7-crowdpose-640x640.py
_base_ = ["../coco/rtmo-l_16xb16-600e_coco-640x640.py"]

train_cfg = dict(max_epochs=700, val_interval=20, dynamic_intervals=[(670, 1)])

{head_override}

train_pipeline_stage1 = _base_.train_pipeline_stage1

{block}

{cp_eval}
''')


def g_yoloxpose():
    T = "body_2d_keypoint/yoloxpose/coco"
    for name, widen, deepen, neck_in, head_in in (
        ("yoloxpose_m_8xb32-300e_coco-640.py", 0.75, 0.67, [192, 384, 768], 192),
        ("yoloxpose_l_8xb32-300e_coco-640.py", 1.0, 1.0, [256, 512, 1024], 256),
    ):
        sz = name.split("_")[1]
        emit(f"{T}/{name}", f'''# YOLOX-Pose {sz}: scaled CSPDarknet/PAFPN factors over the s recipe.
# TPU-native counterpart of the reference config of the same name.
_base_ = ["./yoloxpose_s_8xb32-300e_coco-640.py"]

widen_factor = {widen}
deepen_factor = {deepen}

model = dict(
    backbone=dict(deepen_factor=deepen_factor, widen_factor=widen_factor),
    neck=dict(in_channels={neck_in}, out_channels={head_in}, num_csp_blocks=round(3 * deepen_factor)),
    head=dict(head_module_cfg=dict(in_channels={head_in}, feat_channels={head_in})),
)
''')
    emit(f"{T}/yoloxpose_tiny_4xb64-300e_coco-416.py", '''# YOLOX-Pose tiny: 416x416 inputs, widen 0.375.
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
''')


def g_dekr():
    T = "body_2d_keypoint/dekr"
    emit(f"{T}/coco/dekr_hrnet-w48_8xb10-140e_coco-640x640.py", '''# DEKR + HRNet-w48 at 640x640 (reference config of the same name).
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
''')
    cp_data = '''train_dataloader = dict(
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

default_hooks = dict(checkpoint=dict(save_best="crowdpose/AP", rule="greater"))'''
    for base, name in (
        ("w32_8xb10-140e_coco-512x512", "dekr_hrnet-w32_8xb10-300e_crowdpose-512x512.py"),
        ("w48_8xb10-140e_coco-512x512", "dekr_hrnet-w48_8xb5-300e_crowdpose-640x640.py"),
    ):
        extra = ""
        if "640" in name:
            extra = '''
codec = dict(type="SPR", input_size=(640, 640), heatmap_size=(160, 160), sigma=(4, 2), generate_keypoint_heatmaps=True)
'''
        emit(f"{T}/crowdpose/{name}", f'''# DEKR on CrowdPose (14 keypoints); reference config of the same name.
_base_ = ["../coco/dekr_hrnet-{base}.py"]

train_cfg = dict(max_epochs=300, val_interval=20)
{extra}
model = dict(head=dict(num_keypoints=14{", decoder=codec" if extra else ""}))

{cp_data}
''')


DWPOSE_CH = {"t": 384, "s": 512, "m": 768, "l": 1024, "x": 1280}


def g_dwpose():
    specs = []
    # (tree, stage, filename, teacher sz, student sz, size tag, cfg dir, cfg name pattern)
    cwb = "configs/wholebody_2d_keypoint/rtmpose/coco-wholebody/rtmpose-{sz}_{bs}_coco-wholebody-{tag}.py"
    ub = "configs/wholebody_2d_keypoint/rtmpose/ubody/rtmpose-{sz}_{bs}_coco-ubody-wholebody-{tag}.py"
    cwb_bs = {("m", "256x192"): "8xb64-270e", ("l", "256x192"): "8xb64-270e",
              ("l", "384x288"): "8xb32-270e", ("x", "384x288"): "8xb32-270e"}
    ub_bs = {("t", "256x192"): "8xb64-270e", ("s", "256x192"): "8xb64-270e",
             ("m", "256x192"): "8xb64-270e", ("l", "256x192"): "8xb64-270e",
             ("x", "256x192"): "8xb64-270e", ("l", "384x288"): "8xb32-270e",
             ("x", "384x288"): "8xb32-270e"}

    def cfgpath(tree, sz, tag):
        pat, table = (cwb, cwb_bs) if tree == "coco" else (ub, ub_bs)
        return pat.format(sz=sz, bs=table[(sz, tag)], tag=tag)

    # stage 1: teacher -> student KD (FeaLoss + KDLoss)
    s1 = [
        ("coco-wholebody", "dwpose_l_dis_m_coco-256x192.py", "l", "m", "256x192", "coco"),
        ("coco-wholebody", "dwpose_x_dis_l_coco-384x288.py", "x", "l", "384x288", "coco"),
        ("ubody", "dwpose_l_dis_m_coco-ubody-256x192.py", "l", "m", "256x192", "ubody"),
        ("ubody", "dwpose_l_dis_s_coco-ubody-256x192.py", "l", "s", "256x192", "ubody"),
        ("ubody", "dwpose_l_dis_t_coco-ubody-256x192.py", "l", "t", "256x192", "ubody"),
        ("ubody", "dwpose_x_dis_l_coco-ubody-256x192.py", "x", "l", "256x192", "ubody"),
        ("ubody", "rtmpose_x_dis_l_coco-ubody-384x288.py", "x", "l", "384x288", "ubody"),
    ]
    for dirname, fname, t, s, tag, tree in s1:
        rel = f"wholebody_2d_keypoint/dwpose/{dirname}/s1_dis/{fname}"
        emit(rel, f'''# DWPose stage-1 distillation: RTMPose-{t} teacher -> RTMPose-{s} student
# (feature MSE + SimCC logit KD). TPU-native counterpart of the reference
# config configs/wholebody_2d_keypoint/dwpose/.../s1_dis/{fname}
_base_ = ["../../../../_base_/default_runtime.py"]

teacher_config = "{cfgpath(tree, t, tag)}"
student_config = "{cfgpath(tree, s, tag)}"

distiller = dict(
    type="DWPoseDistiller",
    teacher_cfg=teacher_config,
    student_cfg=student_config,
    two_dis=False,
    distill_cfg=[
        dict(methods=[dict(type="FeaLoss", name="loss_fea", student_channels={DWPOSE_CH[s]},
                           teacher_channels={DWPOSE_CH[t]}, alpha_fea=0.00007)]),
        dict(methods=[dict(type="KDLoss", name="loss_logit", weight=0.1)]),
    ],
    teacher_pretrained=None,
)

train_cfg = dict(max_epochs=270, val_interval=10)
optim_wrapper = dict(optimizer=dict(type="AdamW", lr=4e-3, weight_decay=0.05), clip_grad=dict(max_norm=1.0, norm_type=2))
''')
    # stage 2: self-KD on frozen teacher features (two_dis)
    s2 = [
        ("coco-wholebody", "dwpose_l-ll_coco-384x288.py", "l", "384x288", "coco"),
        ("coco-wholebody", "dwpose_m-mm_coco-256x192.py", "m", "256x192", "coco"),
        ("ubody", "dwpose_l-ll_coco-ubody-256x192.py", "l", "256x192", "ubody"),
        ("ubody", "dwpose_l-ll_coco-ubody-384x288.py", "l", "384x288", "ubody"),
        ("ubody", "dwpose_m-mm_coco-ubody-256x192.py", "m", "256x192", "ubody"),
        ("ubody", "dwpose_s-ss_coco-ubody-256x192.py", "s", "256x192", "ubody"),
        ("ubody", "dwpose_t-tt_coco-ubody-256x192.py", "t", "256x192", "ubody"),
    ]
    for dirname, fname, sz, tag, tree in s2:
        rel = f"wholebody_2d_keypoint/dwpose/{dirname}/s2_dis/{fname}"
        emit(rel, f'''# DWPose stage-2 (two_dis): student head retrained on frozen stage-1
# teacher features, logit KD only. TPU-native counterpart of the reference
# config configs/wholebody_2d_keypoint/dwpose/.../s2_dis/{fname}
_base_ = ["../../../../_base_/default_runtime.py"]

teacher_config = "{cfgpath(tree, sz, tag)}"
student_config = "{cfgpath(tree, sz, tag)}"

distiller = dict(
    type="DWPoseDistiller",
    teacher_cfg=teacher_config,
    student_cfg=student_config,
    two_dis=True,
    distill_cfg=[
        dict(methods=[dict(type="KDLoss", name="loss_logit", weight=1.0)]),
    ],
    teacher_pretrained="work_dirs/{fname[:-3]}/teacher.ckpt",
)

train_cfg = dict(max_epochs=60, val_interval=10)
optim_wrapper = dict(optimizer=dict(type="AdamW", lr=4e-3, weight_decay=0.05))
''')


# ---------------------------------------------------------------------------
# part 3: regression / integral / simcc / merge-combine / 3D lifting
# ---------------------------------------------------------------------------

CFG_DIR = Z.CFG


def read_cfg(rel: str) -> str:
    return open(os.path.join(CFG_DIR, rel)).read()


def retitle(text: str, old_stem: str, new_stem: str) -> str:
    return text.replace(old_stem, new_stem)


def g_regression():
    T = "body_2d_keypoint/topdown_regression"
    # rle-pretrained: identical arithmetic, backbone starts from the plain
    # regression checkpoint (reference td-reg_*_rle-pretrained configs)
    emit(f"{T}/coco/td-reg_res50_rle-pretrained-8xb64-210e_coco-256x192.py",
         '''# RLE with the backbone initialized from the plain-regression checkpoint.
# TPU-native counterpart of the reference config of the same name.
_base_ = ["./td-reg_res50_rle-8xb64-210e_coco-256x192.py"]

model = dict(
    backbone=dict(
        init_cfg=dict(
            type="Pretrained",
            prefix="backbone.",
            checkpoint="https://download.openmmlab.com/mmpose/"
            "top_down/resnet/res50_coco_256x192-ec54d7f3_20200709.pth",
        ),
    ),
)
''')
    emit(f"{T}/coco/td-reg_mobilenetv2_rle-pretrained-8xb64-210e_coco-256x192.py",
         '''# RLE-MobileNetV2 with ImageNet-pretrained backbone initialization.
# TPU-native counterpart of the reference config of the same name.
_base_ = ["./td-reg_mobilenetv2_rle_8xb64-210e_coco-192x256.py"]

model = dict(
    backbone=dict(
        init_cfg=dict(type="Pretrained", checkpoint="mmcls://mobilenet_v2"),
    ),
)
''')
    # res152 RLE at 384x288: same recipe, larger crop
    src = read_cfg(f"{T}/coco/td-reg_res152_rle-8xb64-210e_coco-256x192.py")
    src = retitle(src, "td-reg_res152_rle-8xb64-210e_coco-256x192",
                  "td-reg_res152_rle-8xb64-210e_coco-384x288")
    src = src.replace("(192, 256)", "(288, 384)")
    emit(f"{T}/coco/td-reg_res152_rle-8xb64-210e_coco-384x288.py", src)
    # mpii res152
    src = read_cfg(f"{T}/mpii/td-reg_res101_8xb64-210e_mpii-256x256.py")
    src = retitle(src, "td-reg_res101_8xb64-210e_mpii-256x256", "td-reg_res152_8xb64-210e_mpii-256x256")
    src = src.replace("depth=101", "depth=152")
    emit(f"{T}/mpii/td-reg_res152_8xb64-210e_mpii-256x256.py", src)

    # face wflw regression trio (98 kpts, NME): plain / wing / softwing
    FACE_TPL = '''# {stem}
# TPU-native counterpart of the reference config of the same name
# (configs/face_2d_keypoint/topdown_regression/wflw/).
_base_ = ["../../../_base_/default_runtime.py"]

train_cfg = dict(max_epochs=210, val_interval=10)
optim_wrapper = dict(optimizer=dict(type="Adam", lr=5e-4))
param_scheduler = [
    dict(type="LinearLR", begin=0, end=500, start_factor=0.001, by_epoch=False),
    dict(type="MultiStepLR", begin=0, end=210, milestones=[170, 200], gamma=0.1, by_epoch=True),
]
auto_scale_lr = dict(base_batch_size=512)
default_hooks = dict(checkpoint=dict(save_best="NME", rule="less"))

codec = dict(type="RegressionLabel", input_size=(256, 256))

model = dict(
    type="TopdownPoseEstimator",
    data_preprocessor=dict(
        type="PoseDataPreprocessor", mean=[123.675, 116.28, 103.53], std=[58.395, 57.12, 57.375], bgr_to_rgb=True
    ),
    backbone=dict(type="ResNet", depth=50, out_indices=(3,)),
    neck=dict(type="GlobalAveragePooling"),
    head=dict(
        type="RegressionHead",
        in_channels=2048,
        num_joints=98,
        loss={loss},
        decoder=codec,
    ),
    test_cfg=dict(flip_test=True),
)

train_pipeline = [
    dict(type="LoadImage"),
    dict(type="GetBBoxCenterScale"),
    dict(type="RandomFlip", direction="horizontal"),
    dict(type="RandomBBoxTransform", scale_factor=(0.75, 1.25), rotate_factor=60),
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

data_root = "data/wflw/"
train_dataloader = dict(
    batch_size=64,
    num_workers=4,
    sampler=dict(type="DefaultSampler", shuffle=True),
    dataset=dict(
        type="WFLWDataset",
        data_root=data_root,
        data_mode="topdown",
        ann_file="annotations/face_landmarks_wflw_train.json",
        data_prefix=dict(img="images/"),
        pipeline=train_pipeline,
    ),
)
val_dataloader = dict(
    batch_size=32,
    num_workers=4,
    drop_last=False,
    sampler=dict(type="DefaultSampler", shuffle=False, round_up=False),
    dataset=dict(
        type="WFLWDataset",
        data_root=data_root,
        data_mode="topdown",
        ann_file="annotations/face_landmarks_wflw_test.json",
        data_prefix=dict(img="images/"),
        test_mode=True,
        pipeline=val_pipeline,
    ),
)
test_dataloader = val_dataloader

val_evaluator = dict(type="NME", norm_mode="keypoint_distance")
test_evaluator = val_evaluator
'''
    for stem, loss in (
        ("td-reg_res50_8xb64-210e_wflw-256x256",
         'dict(type="SmoothL1Loss", use_target_weight=True)'),
        ("td-reg_res50_wingloss_8xb64-210e_wflw-256x256",
         'dict(type="WingLoss", use_target_weight=True)'),
        ("td-reg_res50_softwingloss_8xb64-210e_wflw-256x256",
         'dict(type="SoftWingLoss", use_target_weight=True)'),
    ):
        emit(f"face_2d_keypoint/topdown_regression/wflw/{stem}.py",
             FACE_TPL.format(stem=stem, loss=loss))

    # hand regression (21 kpts, PCK/AUC/EPE)
    for ds_type, key, train_ann, val_ann, img in (
        ("OneHand10KDataset", "onehand10k", "annotations/onehand10k_train.json",
         "annotations/onehand10k_test.json", ""),
        ("Rhd2DDataset", "rhd2d", "annotations/rhd_train.json", "annotations/rhd_test.json", ""),
    ):
        stem = f"td-reg_res50_8xb64-210e_{key}-256x256"
        text = FACE_TPL.format(stem=stem, loss='dict(type="SmoothL1Loss", use_target_weight=True)')
        text = text.replace("num_joints=98", "num_joints=21")
        text = text.replace('data_root = "data/wflw/"', f'data_root = "data/{key}/"')
        text = text.replace('type="WFLWDataset"', f'type="{ds_type}"')
        text = text.replace('ann_file="annotations/face_landmarks_wflw_train.json"',
                            f'ann_file="{train_ann}"')
        text = text.replace('ann_file="annotations/face_landmarks_wflw_test.json"',
                            f'ann_file="{val_ann}"')
        text = text.replace('val_evaluator = dict(type="NME", norm_mode="keypoint_distance")',
                            'val_evaluator = [dict(type="PCKAccuracy", thr=0.2), dict(type="AUC"), dict(type="EPE")]')
        text = text.replace('default_hooks = dict(checkpoint=dict(save_best="NME", rule="less"))',
                            'default_hooks = dict(checkpoint=dict(save_best="AUC", rule="greater"))')
        emit(f"hand_2d_keypoint/topdown_regression/{key}/{stem}.py", text)


def g_integral():
    T = "body_2d_keypoint/integral_regression/coco"
    for stem in ("ipr_res50_8xb64-210e_coco",
                 "ipr_res50_debias-8xb64-210e_coco",
                 "ipr_res50_dsnt-8xb64-210e_coco"):
        src = read_cfg(f"{T}/{stem}-192x256.py")
        src = retitle(src, f"{stem}-192x256", f"{stem}-256x256")
        src = src.replace("(192, 256)", "(256, 256)").replace("(48, 64)", "(64, 64)")
        emit(f"{T}/{stem}-256x256.py", src)


def g_simcc_mpii():
    src = read_cfg("body_2d_keypoint/simcc/coco/simcc_mobilenetv2_wo-deconv-8xb64-210e_coco-256x192.py")
    src = retitle(src, "simcc_mobilenetv2_wo-deconv-8xb64-210e_coco-256x192",
                  "simcc_res50_wo-deconv-8xb64-210e_mpii-256x256")
    src = src.replace('backbone=dict(type="MobileNetV2", widen_factor=1.0, out_indices=(7,))',
                      'backbone=dict(type="ResNet", depth=50, out_indices=(3,))')
    src = src.replace("in_channels=1280", "in_channels=2048")
    src = src.replace("(192, 256)", "(256, 256)")
    src = src.replace("out_channels=17", "out_channels=16")
    src = src.replace('type="CocoDataset"', 'type="MpiiDataset"')
    src = src.replace('data_root = "data/coco/"', 'data_root = "data/mpii/"')
    src = src.replace('ann_file="annotations/person_keypoints_train2017.json"',
                      'ann_file="annotations/mpii_train.json"')
    src = src.replace('ann_file="annotations/person_keypoints_val2017.json"',
                      'ann_file="annotations/mpii_val.json"')
    src = src.replace('data_prefix=dict(img="train2017/")', 'data_prefix=dict(img="images/")')
    src = src.replace('data_prefix=dict(img="val2017/")', 'data_prefix=dict(img="images/")')
    src = re.sub(r"val_evaluator = dict\(type=\"CocoMetric\".*?\)\n",
                 'val_evaluator = dict(type="MpiiPCKAccuracy")\n', src, flags=re.S)
    emit("body_2d_keypoint/simcc/mpii/simcc_res50_wo-deconv-8xb64-210e_mpii-256x256.py", src)


def aic_combined_override(num_kpts: int, metainfo: str, coco_table=None) -> str:
    coco_pipe = ("[]" if coco_table is None else
                 f'[dict(type="KeypointConverter", num_keypoints={num_kpts}, '
                 f"mapping={fmt_mapping(coco_table)})]")
    aic_table = AIC_COCO if num_kpts == 17 else None
    if num_kpts == 19:
        # coco-aic combined 19-kpt skeleton: aic extra head-top/neck keep
        # their own slots (reference combine config tables)
        aic_table = AIC_COCO + [(12, 17), (13, 18)]
    return f'''dataset_coco = dict(
    type="CocoDataset", data_root="data/coco/", data_mode="topdown",
    ann_file="annotations/person_keypoints_train2017.json",
    data_prefix=dict(img="train2017/"),
    pipeline={coco_pipe},
)
dataset_aic = dict(
    type="AicDataset", data_root="data/aic/", data_mode="topdown",
    ann_file="annotations/aic_train.json",
    data_prefix=dict(img="ai_challenger_keypoint_train_20170902/keypoint_train_images_20170902/"),
    pipeline=[dict(type="KeypointConverter", num_keypoints={num_kpts}, mapping={fmt_mapping(aic_table)})],
)

train_dataloader = dict(
    dataset=dict(
        _delete_=True,
        type="CombinedDataset",
        metainfo=dict(dataset_name="{metainfo}"),
        datasets=[dataset_coco, dataset_aic],
        pipeline=_base_.train_pipeline,
        test_mode=False,
    ),
)'''


def g_cspnext_aic_coco():
    T = "body_2d_keypoint/topdown_heatmap/coco"
    for sz in ("tiny", "s", "m", "l"):
        emit(f"{T}/cspnext-{sz}_udp_8xb256-210e_aic-coco-256x192.py", f'''# CSPNeXt-{sz} UDP trained on COCO+AIC (AIC remapped onto COCO-17).
# TPU-native counterpart of the reference config of the same name.
_base_ = ["./cspnext-{sz}_udp_8xb256-210e_coco-256x192.py"]

{aic_combined_override(17, "coco")}
''')


def g_hrnet_merge_combine():
    T = "body_2d_keypoint/topdown_heatmap/coco"
    emit(f"{T}/td-hm_hrnet-w32_8xb64-210e_coco-aic-256x192-merge.py", f'''# HRNet-w32 trained on COCO+AIC merged onto the COCO-17 skeleton.
# TPU-native counterpart of the reference config of the same name.
_base_ = ["./td-hm_hrnet-w32_8xb64-210e_coco-256x192.py"]

{aic_combined_override(17, "coco")}
''')
    emit(f"{T}/td-hm_hrnet-w32_8xb64-210e_coco-aic-256x192-combine.py", f'''# HRNet-w32 on the combined 19-keypoint COCO+AIC skeleton
# (COCO-17 plus AIC head-top and neck; metainfo coco_aic).
# TPU-native counterpart of the reference config of the same name.
_base_ = ["./td-hm_hrnet-w32_8xb64-210e_coco-256x192.py"]

model = dict(head=dict(out_channels=19))

{aic_combined_override(19, "coco_aic", coco_table=[(i, i) for i in range(17)])}
''')
    emit(f"{T}/td-hm-vis_res50_8xb64-210e_coco-aic-256x192-merge.py", f'''# ResNet-50 heatmap head wrapped with a keypoint-visibility branch,
# trained on COCO+AIC merge. TPU-native counterpart of the reference
# config of the same name (VisPredictHead, reference vis_head.py).
_base_ = ["./td-hm_res50_8xb64-210e_coco-256x192.py"]

codec = dict(type="MSRAHeatmap", input_size=(192, 256), heatmap_size=(48, 64), sigma=2)

model = dict(
    head=dict(
        _delete_=True,
        type="VisPredictHead",
        loss=dict(type="BCELoss", use_target_weight=True, use_sigmoid=True),
        pose_cfg=dict(
            type="HeatmapHead",
            in_channels=2048,
            out_channels=17,
            loss=dict(type="KeypointMSELoss", use_target_weight=True),
            decoder=codec,
        ),
    ),
)

{aic_combined_override(17, "coco")}
''')


def g_ubody2d_hm():
    src = read_cfg("wholebody_2d_keypoint/topdown_heatmap/coco-wholebody/td-hm_hrnet-w32_8xb64-210e_coco-wholebody-256x192.py")
    src = retitle(src, "td-hm_hrnet-w32_8xb64-210e_coco-wholebody-256x192",
                  "td-hm_hrnet-w32_8xb64-210e_ubody-256x192")
    src = src.replace('type="CocoWholeBodyDataset"', 'type="UBody2dDataset"')
    src = src.replace('data_root = "data/coco/"', 'data_root = "data/UBody/"')
    src = src.replace('ann_file="annotations/coco_wholebody_train_v1.0.json"',
                      'ann_file="annotations/train_annotations.json"')
    src = src.replace('ann_file="annotations/coco_wholebody_val_v1.0.json"',
                      'ann_file="annotations/val_annotations.json"')
    src = src.replace('data_prefix=dict(img="train2017/")', 'data_prefix=dict(img="images/")')
    src = src.replace('data_prefix=dict(img="val2017/")', 'data_prefix=dict(img="images/")')
    src = src.replace('ann_file=data_root + "annotations/coco_wholebody_val_v1.0.json"',
                      'ann_file=data_root + "annotations/val_annotations.json"')
    emit("wholebody_2d_keypoint/topdown_heatmap/ubody2d/td-hm_hrnet-w32_8xb64-210e_ubody-256x192.py", src)


def g_body3d():
    T3 = "body_3d_keypoint"
    # image-pose-lift tcn: FC-residual lifting with the reference tcn recipe
    # (StepLR by-iteration, MSE loss)
    src = read_cfg(f"{T3}/image_pose_lift/h36m/image-pose-lift_simplebaseline3d_8xb64-200e_h36m.py")
    src = retitle(src, "image-pose-lift_simplebaseline3d_8xb64-200e_h36m", "image-pose-lift_tcn_8xb64-200e_h36m")
    src = src.replace(
        "param_scheduler = [dict(type=\"ExponentialLR\", gamma=0.96, end=100, by_epoch=True)]",
        "param_scheduler = [dict(type=\"StepLR\", step_size=100000, gamma=0.96, end=80, by_epoch=False)]")
    src = src.replace('loss=dict(type="MPJPELoss")', 'loss=dict(type="MSELoss")')
    emit(f"{T3}/image_pose_lift/h36m/image-pose-lift_tcn_8xb64-200e_h36m.py", src)

    # video-pose-lift supervised variants (reference exact names)
    base = read_cfg(f"{T3}/video_pose_lift/h36m/video-pose-lift_tcn-27frm-supv_8xb128-160e_h36m.py")

    def vpl(stem: str, *, seq: int, epochs: int, detection: bool, old_stem="video-pose-lift_tcn-27frm-supv_8xb128-160e_h36m"):
        src = retitle(base, old_stem, stem)
        src = src.replace("seq_len=27", f"seq_len={seq}")
        if epochs != 160:
            src = src.replace("max_epochs=160", f"max_epochs={epochs}")
            src = src.replace("end=80,", f"end={epochs // 2},")
        if detection:
            # CPN fine-tune: lift 2D detections instead of GT keypoints
            src = src.replace('keypoint_2d_src="gt"',
                              'keypoint_2d_src="detection",\n                 '
                              'keypoint_2d_det_file="joint_2d_det_files/cpn_ft_h36m_dbb_train.npy"')
        return src

    emit(f"{T3}/video_pose_lift/h36m/video-pose-lift_tcn-243frm-supv_8xb128-160e_h36m.py",
         vpl("video-pose-lift_tcn-243frm-supv_8xb128-160e_h36m", seq=243, epochs=160, detection=False))
    emit(f"{T3}/video_pose_lift/h36m/video-pose-lift_tcn-81frm-supv_8xb128-160e_h36m.py",
         vpl("video-pose-lift_tcn-81frm-supv_8xb128-160e_h36m", seq=81, epochs=160, detection=False))
    emit(f"{T3}/video_pose_lift/h36m/video-pose-lift_tcn-1frm-supv-cpn-ft_8xb128-160e_h36m.py",
         vpl("video-pose-lift_tcn-1frm-supv-cpn-ft_8xb128-160e_h36m", seq=1, epochs=160, detection=True))
    emit(f"{T3}/video_pose_lift/h36m/video-pose-lift_tcn-243frm-supv-cpn-ft_8xb128-200e_h36m.py",
         vpl("video-pose-lift_tcn-243frm-supv-cpn-ft_8xb128-200e_h36m", seq=243, epochs=200, detection=True))

    # semi-supervised variants: pose + trajectory towers and the
    # projection/bone SemiSupervisionLoss (reference configs of the same name)
    semi_model = '''model = dict(
    type="PoseLifter",
    backbone=dict(
        type="TCN",
        in_channels=2 * 17,
        stem_channels=1024,
        num_blocks=2,
        kernel_sizes=(3, 3, 3),
        dropout=0.25,
    ),
    head=dict(
        type="TemporalRegressionHead",
        in_channels=1024,
        num_joints=17,
        loss=dict(type="MPJPELoss"),
        decoder=codec,
    ),
    traj_backbone=dict(
        type="TCN",
        in_channels=2 * 17,
        stem_channels=1024,
        num_blocks=2,
        kernel_sizes=(3, 3, 3),
        dropout=0.25,
    ),
    traj_head=dict(
        type="TrajectoryRegressionHead",
        in_channels=1024,
        num_joints=1,
        loss=dict(type="MPJPELoss", use_target_weight=True),
        decoder=codec,
    ),
    semi_loss=dict(
        type="SemiSupervisionLoss",
        joint_parents=[0, 0, 1, 2, 0, 4, 5, 0, 7, 8, 9, 8, 11, 12, 8, 14, 15],
        warmup_iterations=1311376 // 64 // 8 * 5,
    ),
)'''
    for stem, detection in (
        ("video-pose-lift_tcn-27frm-semi-supv_8xb64-200e_h36m", False),
        ("video-pose-lift_tcn-27frm-semi-supv-cpn-ft_8xb64-200e_h36m", True),
    ):
        src = vpl(stem, seq=27, epochs=200, detection=detection)
        src = src.replace("batch_size=128", "batch_size=64")
        # swap the plain model for the traj+semi twin-tower one
        src = re.sub(r"model = dict\(.*?\n\)\n", semi_model + "\n", src, count=1, flags=re.S)
        emit(f"{T3}/video_pose_lift/h36m/{stem}.py", src)

    # motionbert reference-named variants
    mb = read_cfg(f"{T3}/motionbert/h36m/motionbert-243frm_8xb32-120e_h36m.py")

    def mb_variant(stem: str, *, epochs: int, original: bool, finetune: bool):
        src = retitle(mb, "motionbert-243frm_8xb32-120e_h36m", stem)
        src = src.replace("max_epochs=120", f"max_epochs={epochs}")
        if original:
            src = src.replace("h36m_train.npz", "h36m_train_original.npz")
            src = src.replace(
                'ann_file="annotation_body3d/fps50/h36m_test.npz"',
                'ann_file="annotation_body3d/fps50/h36m_test_original.npz",\n'
                '                 factor_file="annotation_body3d/fps50/h36m_factors.npy"')
        if finetune:
            src = src.replace(
                "        seq_len=243,\n        num_joints=17,\n    ),",
                "        seq_len=243,\n        num_joints=17,\n"
                '        init_cfg=dict(type="Pretrained", checkpoint="checkpoints/motionbert_pretrain.ckpt"),\n    ),')
        return src

    emit(f"{T3}/motionbert/h36m/motionbert_dstformer-243frm_8xb32-240e_h36m.py",
         mb_variant("motionbert_dstformer-243frm_8xb32-240e_h36m", epochs=240, original=False, finetune=False))
    emit(f"{T3}/motionbert/h36m/motionbert_dstformer-243frm_8xb32-240e_h36m-original.py",
         mb_variant("motionbert_dstformer-243frm_8xb32-240e_h36m-original", epochs=240, original=True, finetune=False))
    emit(f"{T3}/motionbert/h36m/motionbert_dstformer-ft-243frm_8xb32-120e_h36m.py",
         mb_variant("motionbert_dstformer-ft-243frm_8xb32-120e_h36m", epochs=120, original=False, finetune=True))
    emit(f"{T3}/motionbert/h36m/motionbert_dstformer-ft-243frm_8xb32-120e_h36m-original.py",
         mb_variant("motionbert_dstformer-ft-243frm_8xb32-120e_h36m-original", epochs=120, original=True, finetune=True))
