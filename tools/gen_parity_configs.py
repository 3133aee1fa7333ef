#!/usr/bin/env python
"""Close the config-zoo gap to exact reference-recipe parity.

`tools/gen_zoo_configs.py` emits the broad (family x backbone x dataset)
grid; this tool emits the *specific* remaining reference recipes by their
exact reference filenames (SURVEY §1 layer 11; VERDICT r2 missing #1) —
hyperparameters mirrored from the reference config of the same name, model
bodies expressed in this package's TPU-native schema.

Idempotent: `python tools/gen_parity_configs.py` (never overwrites).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import gen_zoo_configs as Z  # noqa: E402

# ---------------------------------------------------------------------------
# extra datasets (reference configs/_base_/datasets + per-recipe blocks)
# ---------------------------------------------------------------------------

Z.DATASETS.update(
    {
        "jhmdb-sub2": dict(
            ds_type="JhmdbDataset", root="data/jhmdb/", num_kpts=15,
            train_ann="annotations/Sub2_train.json", train_img="",
            val_ann="annotations/Sub2_test.json", val_img="",
            evaluator='[dict(type="JhmdbPCKAccuracy", thr=0.2, norm_item=["bbox", "torso"])]',
            save_best="PCK", epochs=40,
        ),
        "jhmdb-sub3": dict(
            ds_type="JhmdbDataset", root="data/jhmdb/", num_kpts=15,
            train_ann="annotations/Sub3_train.json", train_img="",
            val_ann="annotations/Sub3_test.json", val_img="",
            evaluator='[dict(type="JhmdbPCKAccuracy", thr=0.2, norm_item=["bbox", "torso"])]',
            save_best="PCK", epochs=40,
        ),
        "jhmdb-sub1": dict(
            ds_type="JhmdbDataset", root="data/jhmdb/", num_kpts=15,
            train_ann="annotations/Sub1_train.json", train_img="",
            val_ann="annotations/Sub1_test.json", val_img="",
            evaluator='[dict(type="JhmdbPCKAccuracy", thr=0.2, norm_item=["bbox", "torso"])]',
            save_best="PCK", epochs=40,
        ),
        "300wlp": dict(
            ds_type="Face300WLPDataset", root="data/300wlp/", num_kpts=68,
            train_ann="annotations/train_300Wlp.json", train_img="train/",
            val_ann="annotations/val_300Wlp.json", val_img="val/",
            evaluator='dict(type="NME", norm_mode="keypoint_distance")',
            save_best="NME", rule="less", epochs=60,
        ),
    }
)

# AnimalKingdom protocol splits (reference configs/animal_2d_keypoint/topdown_heatmap/ak)
for split in ("P1", "P2", "P3_amphibian", "P3_bird", "P3_fish", "P3_mammal", "P3_reptile"):
    Z.DATASETS[f"ak_{split}"] = dict(
        ds_type="AnimalKingdomDataset", root="data/ak/", num_kpts=23,
        train_ann=f"annotations/ak_{split}/train.json", train_img="images/",
        val_ann=f"annotations/ak_{split}/test.json", val_img="images/",
        evaluator='[dict(type="PCKAccuracy", thr=0.05), dict(type="AUC")]',
        save_best="PCK", epochs=300,
    )

# DeepFashion2 per-category datasets (reference fashion_2d_keypoint/topdown_heatmap/deepfashion2;
# note the reference's own "deepfasion2" filename spelling, kept for name parity)
DF2_CATS = {  # category -> world size prefix in the reference filename
    "long-sleeved-dress": 1, "skirt": 1, "vest-dress": 1, "trousers": 2,
    "shorts": 3, "short-sleeved-dress": 4, "sling": 4, "sling-dress": 4,
    "vest": 4, "short-sleeved-shirt": 6, "long-sleeved-outwear": 8,
    "long-sleeved-shirt": 8, "short-sleeved-outwear": 8,
}
for cat in DF2_CATS:
    u = cat.replace("-", "_")
    Z.DATASETS[f"deepfasion2-{cat}"] = dict(
        ds_type="DeepFashion2Dataset", root="data/deepfasion2/", num_kpts=294,
        train_ann=f"train/deepfashion2_{u}_train.json", train_img="train/image/",
        val_ann=f"validation/deepfashion2_{u}_validation.json", val_img="validation/image/",
        evaluator='[dict(type="PCKAccuracy", thr=0.2), dict(type="AUC"), dict(type="EPE")]',
        save_best="AUC", epochs=210,
    )

# ---------------------------------------------------------------------------
# extra model bodies
# ---------------------------------------------------------------------------

HRNETV2_W18_BACKBONE = """dict(
        type="HRNet",
        in_channels=3,
        extra=dict(
            stage1=dict(num_modules=1, num_branches=1, block="BOTTLENECK", num_blocks=(4,), num_channels=(64,)),
            stage2=dict(num_modules=1, num_branches=2, block="BASIC", num_blocks=(4, 4), num_channels=(18, 36)),
            stage3=dict(num_modules=4, num_branches=3, block="BASIC", num_blocks=(4, 4, 4), num_channels=(18, 36, 72)),
            stage4=dict(
                num_modules=3, num_branches=4, block="BASIC", num_blocks=(4, 4, 4, 4),
                num_channels=(18, 36, 72, 144), multiscale_output=True,
            ),
        ),
    )"""


def hrnetv2_body(K: int) -> str:
    return (
        f"backbone={HRNETV2_W18_BACKBONE},\n"
        '    neck=dict(type="FeatureMapProcessor", concat=True),\n'
        "    head=dict(\n"
        '        type="HeatmapHead",\n'
        "        in_channels=270,\n"
        f"        out_channels={K},\n"
        "        deconv_out_channels=None,\n"
        "        conv_out_channels=(270,),\n"
        "        conv_kernel_sizes=(1,),\n"
        '        loss=dict(type="KeypointMSELoss", use_target_weight=True),\n'
        "        decoder=codec,\n"
        "    ),"
    )


def res50_2deconv_body(K: int) -> str:
    return (
        'backbone=dict(type="ResNet", depth=50, out_indices=(3,)),\n'
        "    head=dict(\n"
        '        type="HeatmapHead",\n'
        "        in_channels=2048,\n"
        f"        out_channels={K},\n"
        "        deconv_out_channels=(256, 256),\n"
        "        deconv_kernel_sizes=(4, 4),\n"
        '        loss=dict(type="KeypointMSELoss", use_target_weight=True),\n'
        "        decoder=codec,\n"
        "    ),"
    )


# ViTPose specs live in SPECIAL_MODELS as full model bodies; re-derive just the
# backbone source for the -simple head variant.
VIT_ARCH = {
    "ViTPose-small": ("small", 384, 0.1),
    "ViTPose-base": ("base", 768, 0.3),
    "ViTPose-large": ("large", 1024, 0.5),
    "ViTPose-huge": ("huge", 1280, 0.55),
}


def vit_backbone_src(name: str, in_size) -> tuple[str, int]:
    arch, ch, dpr = VIT_ARCH[name]
    W, H = in_size
    src = (
        f'dict(\n        type="VisionTransformer", arch="{arch}", img_size=({H}, {W}), patch_size=16,\n'
        f'        qkv_bias=True, drop_path_rate={dpr}, with_cls_token=False, out_type="featmap", patch_padding=2,\n    )'
    )
    return src, ch


def vitpose_body(name: str, K: int, in_size, simple: bool) -> str:
    src, ch = vit_backbone_src(name, in_size)
    if simple:
        head = (
            '    neck=dict(type="FeatureMapProcessor", scale_factor=4.0, apply_relu=True),\n'
            "    head=dict(\n"
            '        type="HeatmapHead",\n'
            f"        in_channels={ch},\n"
            f"        out_channels={K},\n"
            "        deconv_out_channels=[],\n"
            "        deconv_kernel_sizes=[],\n"
            "        final_layer=dict(kernel_size=3, padding=1),\n"
            '        loss=dict(type="KeypointMSELoss", use_target_weight=True),\n'
            "        decoder=codec,\n"
            "    ),"
        )
    else:
        head = (
            "    head=dict(\n"
            '        type="HeatmapHead",\n'
            f"        in_channels={ch},\n"
            f"        out_channels={K},\n"
            "        deconv_out_channels=(256, 256),\n"
            "        deconv_kernel_sizes=(4, 4),\n"
            '        loss=dict(type="KeypointMSELoss", use_target_weight=True),\n'
            "        decoder=codec,\n"
            "    ),"
        )
    return f"backbone={src},\n{head}"


# ---------------------------------------------------------------------------
# rendering with full hyperparameter control
# ---------------------------------------------------------------------------

N_EMITTED = 0


def render(
    tree: str, dirname: str, name: str, ds_key: str, in_size, model_body: str,
    bs: int, codec: str, *, epochs=None, base_bs=None, use_udp=False,
    halfbody=True, extra_test_cfg="", save_best=None, rule=None,
    train_extras="", milestones=None, world=8,
) -> bool:
    global N_EMITTED
    d = Z.DATASETS[ds_key]
    family_dir = f"{tree}/{dirname}"
    depth = family_dir.count("/") + 1
    base = "/".join([".."] * depth) + "/_base_/default_runtime.py"
    epochs = epochs or d["epochs"]
    milestones = milestones or {
        210: [170, 200], 300: [240, 280], 60: [40, 55], 40: [20, 30], 20: [10, 15],
    }.get(epochs, [int(epochs * 0.8), int(epochs * 0.95)])
    subset = f'\n        subset="{d["subset"]}",' if "subset" in d else ""
    content = Z.TEMPLATE.format(
        title=name.replace(".py", ""),
        ref_rel=f"{family_dir}/{name}",
        base=base,
        epochs=epochs,
        milestones=milestones,
        base_bs=base_bs or bs * world,
        save_best=save_best or d["save_best"],
        rule=rule or d.get("rule", "greater"),
        codec=codec,
        model_body=model_body,
        halfbody="\n    dict(type=\"RandomHalfBody\")," if halfbody else "",
        affine_args=", use_udp=True" if use_udp else "",
        root=d["root"],
        bs=bs,
        train_ds_type=d["ds_type"],
        train_root="data_root",
        train_ann=d["train_ann"],
        train_img=d["train_img"],
        ds_type=d["ds_type"],
        val_ann=d["val_ann"],
        val_img=d["val_img"],
        subset=subset,
        evaluator=d["evaluator"],
        extra_test_cfg=extra_test_cfg,
    )
    if train_extras:
        # inject extra train-pipeline transforms after RandomBBoxTransform
        content = content.replace(
            '    dict(type="RandomBBoxTransform"),\n',
            '    dict(type="RandomBBoxTransform"),\n' + train_extras,
        )
    ok = Z.emit(f"{family_dir}/{name}", content)
    N_EMITTED += int(ok)
    return ok


def hm(tree, dirname, name, ds_key, bb, in_size, hm_size, *, codec_type="MSRAHeatmap",
       codec_extra="sigma=2", bs=64, model_body=None, **kw):
    d = Z.DATASETS[ds_key]
    K = d["num_kpts"]
    if model_body is None:
        if bb in Z.SPECIAL_MODELS:
            body_t, _def_bs = Z.SPECIAL_MODELS[bb]
            model_body = body_t.format(K=K)
            W, H = in_size
            model_body = model_body.replace("{H}", str(H)).replace("{W}", str(W))
        else:
            model_body = Z.heatmap_model_body(bb, K, in_size)
    codec = Z.codec_str(codec_type, tuple(in_size), tuple(hm_size), codec_extra)
    return render(tree, dirname, name, ds_key, in_size, model_body, bs, codec,
                  use_udp=codec_type == "UDPHeatmap", **kw)


S256 = ((192, 256), (48, 64))     # (input WxH, heatmap WxH) for *-256x192 names
S384 = ((288, 384), (72, 96))
SQ256 = ((256, 256), (64, 64))
SQ384 = ((384, 384), (96, 96))


def phase_a_body():
    T = "body_2d_keypoint/topdown_heatmap"
    # -- coco 384x288 backbone variants (reference exact names/batches) ----
    coco384 = [
        ("resnest101", 32), ("resnetv1d101", 32), ("resnext101", 32),
        ("scnet101", 48), ("seresnet101", 32), ("scnet50", 32),
        ("resnetv1d152", 48), ("resnext152", 48), ("seresnet152", 48),
        ("litehrnet-18", 32), ("litehrnet-30", 32),
    ]
    for bb, bs in coco384:
        hm(T, "coco", f"td-hm_{bb}_8xb{bs}-210e_coco-384x288.py", "coco", bb, *S384, bs=bs)
    # -- coco 256x192 odd batch sizes --------------------------------------
    hm(T, "coco", "td-hm_resnest200_8xb64-210e_coco-256x192.py", "coco", "resnest200", *S256, bs=64)
    hm(T, "coco", "td-hm_resnest269_8xb32-210e_coco-256x192.py", "coco", "resnest269", *S256, bs=32)
    # -- ViTPose: classic deconv heads at 8xb64 + the -simple variants -----
    for name in ("ViTPose-large", "ViTPose-huge"):
        hm(T, "coco", f"td-hm_{name}_8xb64-210e_coco-256x192.py", "coco", None, *S256,
           codec_type="UDPHeatmap", bs=64, model_body=vitpose_body(name, 17, S256[0], simple=False))
        hm(T, "humanart", f"td-hm_{name}_8xb64-210e_humanart-256x192.py", "humanart", None, *S256,
           codec_type="UDPHeatmap", bs=64, model_body=vitpose_body(name, 17, S256[0], simple=False))
    for name in ("ViTPose-small", "ViTPose-base", "ViTPose-large", "ViTPose-huge"):
        hm(T, "coco", f"td-hm_{name}-simple_8xb64-210e_coco-256x192.py", "coco", None, *S256,
           codec_type="UDPHeatmap", bs=64, model_body=vitpose_body(name, 17, S256[0], simple=True))
    # -- cpm / hourglass size variants -------------------------------------
    hm(T, "coco", "td-hm_cpm_8xb32-210e_coco-384x288.py", "coco", "cpm", (288, 384), (72, 96), bs=32)
    # -- hrnet pipeline-augmentation variants ------------------------------
    aug = {
        "coarsedropout": '    dict(type="CoarseDropout", max_holes=8, max_height=40, max_width=40,\n'
                         "         min_holes=1, min_height=10, min_width=10, prob=0.5),\n",
        "gridmask": '    dict(type="GridMask", prob=0.5, ratio=0.5, rotate=15),\n',
        "photometric": '    dict(type="PhotometricDistortion"),\n',
    }
    for tag, tr in aug.items():
        hm(T, "coco", f"td-hm_hrnet-w32_{tag}-8xb64-210e_coco-256x192.py", "coco", "hrnet-w32",
           *S256, bs=64, train_extras=tr)
    # fp16: identical arithmetic recipe; AMP handled via AmpOptimWrapper surface
    for bb in ("hrnet-w32", "res50"):
        ok = hm(T, "coco", f"td-hm_{bb}_fp16-8xb64-210e_coco-256x192.py", "coco", bb, *S256, bs=64)
        if ok:
            p = os.path.join(Z.CFG, T, "coco", f"td-hm_{bb}_fp16-8xb64-210e_coco-256x192.py")
            s = open(p).read().replace(
                'optim_wrapper = dict(optimizer=dict(type="Adam", lr=5e-4))',
                'optim_wrapper = dict(type="AmpOptimWrapper", loss_scale="dynamic", optimizer=dict(type="Adam", lr=5e-4))',
            )
            open(p, "w").write(s)
    # udp-regress: combined-type UDP codec, 3K output channels
    K = 17
    body = Z.heatmap_model_body("hrnet-w32", K, S256[0]).replace(
        f"out_channels={K},", f"out_channels=3 * {K},")
    hm(T, "coco", "td-hm_hrnet-w32_udp-regress-8xb64-210e_coco-256x192.py", "coco", None, *S256,
       codec_type="UDPHeatmap", codec_extra='sigma=2, heatmap_type="combined"', bs=64, model_body=body)
    # -- mpii ---------------------------------------------------------------
    hm(T, "mpii", "td-hm_hrnet-w48_8xb64-210e_mpii-256x256.py", "mpii", "hrnet-w48", *SQ256, bs=64)
    hm(T, "mpii", "td-hm_hrnet-w48_dark-8xb64-210e_mpii-256x256.py", "mpii", "hrnet-w48", *SQ256,
       bs=64, codec_extra="sigma=2, unbiased=True, blur_kernel_size=11")
    hm(T, "mpii", "td-hm_hourglass52_8xb64-210e_mpii-256x256.py", "mpii", "hourglass52", *SQ256, bs=64)
    hm(T, "mpii", "td-hm_hourglass52_8xb32-210e_mpii-384x384.py", "mpii", "hourglass52", *SQ384, bs=32)
    for bb, bs in (("resnetv1d152", 64), ("resnext152", 32), ("scnet101", 64), ("seresnet152", 32)):
        hm(T, "mpii", f"td-hm_{bb}_8xb{bs}-210e_mpii-256x256.py", "mpii", bb, *SQ256, bs=bs)
    hm(T, "mpii", "cspnext-m_udp_8xb64-210e_mpii-256x256.py", "mpii", "cspnext-m_udp", *SQ256,
       codec_type="UDPHeatmap", bs=64)
    # -- crowdpose ----------------------------------------------------------
    hm(T, "crowdpose", "td-hm_res152_8xb64-210e_crowdpose-256x192.py", "crowdpose", "res152", *S256, bs=64)
    hm(T, "crowdpose", "td-hm_res101_8xb64-210e_crowdpose-320x256.py", "crowdpose", "res101",
       (256, 320), (64, 80), bs=64)
    # reference filename spells "crowpose" here; kept verbatim for name parity
    hm(T, "crowdpose", "cspnext-m_udp_8xb64-210e_crowpose-256x192.py", "crowdpose", "cspnext-m_udp",
       *S256, codec_type="UDPHeatmap", bs=64)
    # -- posetrack18 (20 epochs) -------------------------------------------
    for bb, size, tag in (("hrnet-w32", S384, "384x288"), ("hrnet-w48", S256, "256x192"),
                          ("hrnet-w48", S384, "384x288")):
        hm(T, "posetrack18", f"td-hm_{bb}_8xb64-20e_posetrack18-{tag}.py", "posetrack18", bb,
           *size, bs=64, epochs=20)
    # -- jhmdb sub1/2/3 -----------------------------------------------------
    for sub in (1, 2, 3):
        hm(T, "jhmdb", f"td-hm_cpm_8xb32-40e_jhmdb-sub{sub}-368x368.py", f"jhmdb-sub{sub}",
           "cpm", (368, 368), (46, 46), bs=32, epochs=40)
        hm(T, "jhmdb", f"td-hm_res50-2deconv_8xb64-40e_jhmdb-sub{sub}-256x256.py", f"jhmdb-sub{sub}",
           None, (256, 256), (32, 32), bs=64, epochs=40, model_body=res50_2deconv_body(15))
    for sub in (2, 3):
        hm(T, "jhmdb", f"td-hm_res50_8xb64-20e_jhmdb-sub{sub}-256x256.py", f"jhmdb-sub{sub}",
           "res50", *SQ256, bs=64, epochs=20)
    # -- cspnext udp coco (8xb256) -----------------------------------------
    for sz in ("tiny", "s", "m", "l"):
        hm(T, "coco", f"cspnext-{sz}_udp_8xb256-210e_coco-256x192.py", "coco", f"cspnext-{sz}_udp",
           *S256, codec_type="UDPHeatmap", bs=256)


def phase_a_other_trees():
    # -- face ---------------------------------------------------------------
    F = "face_2d_keypoint/topdown_heatmap"
    dark = "sigma=2, unbiased=True, blur_kernel_size=11"
    face_sets = (("300w", "300w"), ("300wlp", "300wlp"), ("aflw", "aflw"),
                 ("cofw", "cofw"), ("wflw", "wflw"))
    for dirname, ds in face_sets:
        K = Z.DATASETS[ds]["num_kpts"]
        hm(F, dirname, f"td-hm_hrnetv2-w18_8xb64-60e_{ds}-256x256.py", ds, None, *SQ256,
           bs=64, epochs=60, model_body=hrnetv2_body(K))
    for ds in ("aflw", "wflw"):
        K = Z.DATASETS[ds]["num_kpts"]
        hm(F, ds, f"td-hm_hrnetv2-w18_dark-8xb64-60e_{ds}-256x256.py", ds, None, *SQ256,
           bs=64, epochs=60, codec_extra=dark, model_body=hrnetv2_body(K))
    # AWing-loss wflw variant
    K = Z.DATASETS["wflw"]["num_kpts"]
    awing_body = hrnetv2_body(K).replace(
        'loss=dict(type="KeypointMSELoss", use_target_weight=True)',
        'loss=dict(type="AdaptiveWingLoss", use_target_weight=True)')
    hm(F, "wflw", "td-hm_hrnetv2-w18_awing-8xb64-60e_wflw-256x256.py", "wflw", None, *SQ256,
       bs=64, epochs=60, model_body=awing_body)
    # coco-wholebody-face at reference batch size 32
    cwf = "coco_wholebody_face"
    Kf = Z.DATASETS[cwf]["num_kpts"]
    hm(F, cwf, "td-hm_hrnetv2-w18_8xb32-60e_coco-wholebody-face-256x256.py", cwf, None, *SQ256,
       bs=32, epochs=60, model_body=hrnetv2_body(Kf))
    hm(F, cwf, "td-hm_hrnetv2-w18_dark-8xb32-60e_coco-wholebody-face-256x256.py", cwf, None, *SQ256,
       bs=32, epochs=60, codec_extra=dark, model_body=hrnetv2_body(Kf))
    for bb in ("mobilenetv2", "res50", "scnet50"):
        hm(F, cwf, f"td-hm_{bb}_8xb32-60e_coco-wholebody-face-256x256.py", cwf, bb, *SQ256,
           bs=32, epochs=60)
    # -- hand ---------------------------------------------------------------
    H = "hand_2d_keypoint/topdown_heatmap"
    cwh = "coco_wholebody_hand"
    Kh = Z.DATASETS[cwh]["num_kpts"]
    hm(H, cwh, "td-hm_hrnetv2-w18_8xb32-210e_coco-wholebody-hand-256x256.py", cwh, None, *SQ256,
       bs=32, model_body=hrnetv2_body(Kh))
    hm(H, cwh, "td-hm_hrnetv2-w18_dark-8xb32-210e_coco-wholebody-hand-256x256.py", cwh, None, *SQ256,
       bs=32, codec_extra=dark, model_body=hrnetv2_body(Kh))
    for bb in ("hourglass52", "mobilenetv2", "res50", "scnet50"):
        hm(H, cwh, f"td-hm_{bb}_8xb32-210e_coco-wholebody-hand-256x256.py", cwh, bb, *SQ256, bs=32)
    # reference token "litehrnet-w18" = LiteHRNet-18
    body = Z.heatmap_model_body("litehrnet-18", Kh, SQ256[0])
    hm(H, cwh, "td-hm_litehrnet-w18_8xb32-210e_coco-wholebody-hand-256x256.py", cwh, None, *SQ256,
       bs=32, model_body=body)
    for ds in ("onehand10k", "rhd2d"):
        Kd = Z.DATASETS[ds]["num_kpts"]
        hm(H, ds, f"td-hm_hrnetv2-w18_8xb64-210e_{ds}-256x256.py", ds, None, *SQ256,
           bs=64, model_body=hrnetv2_body(Kd))
        hm(H, ds, f"td-hm_hrnetv2-w18_dark-8xb64-210e_{ds}-256x256.py", ds, None, *SQ256,
           bs=64, codec_extra=dark, model_body=hrnetv2_body(Kd))
        hm(H, ds, f"td-hm_hrnetv2-w18_udp-8xb64-210e_{ds}-256x256.py", ds, None, *SQ256,
           codec_type="UDPHeatmap", bs=64, model_body=hrnetv2_body(Kd))
    hm(H, "onehand10k", "td-hm_res50_8xb32-210e_onehand10k-256x256.py", "onehand10k", "res50",
       *SQ256, bs=32)
    # -- animal -------------------------------------------------------------
    A = "animal_2d_keypoint/topdown_heatmap"
    hm(A, "animalpose", "td-hm_hrnet-w48_8xb64-210e_animalpose-256x256.py", "animalpose",
       "hrnet-w48", *SQ256, bs=64)
    hm(A, "animalpose", "td-hm_res152_8xb32-210e_animalpose-256x256.py", "animalpose",
       "res152", *SQ256, bs=32)
    hm(A, "ap10k", "td-hm_hrnet-w48_8xb64-210e_ap10k-256x256.py", "ap10k", "hrnet-w48", *SQ256, bs=64)
    hm(A, "ap10k", "cspnext-m_udp_8xb64-210e_ap10k-256x256.py", "ap10k", "cspnext-m_udp", *SQ256,
       codec_type="UDPHeatmap", bs=64)
    for ds in ("locust", "zebra"):
        for bb, bs in (("res101", 64), ("res152", 32)):
            hm(A, ds, f"td-hm_{bb}_8xb{bs}-210e_{ds}-160x160.py", ds, bb, (160, 160), (40, 40), bs=bs)
    for split in ("P1", "P2", "P3_amphibian", "P3_bird", "P3_fish", "P3_mammal", "P3_reptile"):
        hm(A, "ak", f"td-hm_hrnet-w32_8xb32-300e_animalkingdom_{split}-256x256.py", f"ak_{split}",
           "hrnet-w32", *SQ256, bs=32, epochs=300)
    # -- fashion ------------------------------------------------------------
    FA = "fashion_2d_keypoint/topdown_heatmap"
    for sub in ("full", "lower", "upper"):
        ds = f"deepfashion_{sub}"
        for bb, bs in (("hrnet-w32", 64), ("hrnet-w48", 32)):
            hm(FA, "deepfashion", f"td-hm_{bb}_udp_8xb{bs}-210e_deepfashion_{sub}-256x192.py",
               ds, bb, *S256, codec_type="UDPHeatmap", bs=bs)
    for cat, world in DF2_CATS.items():
        hm(FA, "deepfashion2", f"td-hm_res50_{world}xb64-210e_deepfasion2-{cat}-256x192.py",
           f"deepfasion2-{cat}", "res50", *S256, bs=64, world=world)
    # -- wholebody ----------------------------------------------------------
    W = "wholebody_2d_keypoint/topdown_heatmap"
    cw = "coco-wholebody"
    Kw = Z.DATASETS[cw]["num_kpts"]
    hm(W, cw, "td-hm_res101_8xb32-210e_coco-wholebody-256x192.py", cw, "res101", *S256, bs=32)
    hm(W, cw, "td-hm_res101_8xb32-210e_coco-wholebody-384x288.py", cw, "res101", *S384, bs=32)
    hm(W, cw, "td-hm_hrnet-w48_dark-8xb32-210e_coco-wholebody-384x288.py", cw, "hrnet-w48",
       *S384, bs=32, codec_extra="sigma=3, unbiased=True, blur_kernel_size=17")
    for bb in ("vipnas-mbv3", "vipnas-res50"):
        hm(W, cw, f"td-hm_{bb}_dark-8xb64-210e_coco-wholebody-256x192.py", cw, bb, *S256,
           bs=64, codec_extra=dark)
    for sz in ("l", "m"):
        hm(W, cw, f"cspnext-{sz}_udp_8xb64-210e_coco-wholebody-256x192.py", cw, f"cspnext-{sz}_udp",
           *S256, codec_type="UDPHeatmap", bs=64)


dark = "sigma=2, unbiased=True, blur_kernel_size=11"


def main():
    phase_a_body()
    phase_a_other_trees()
    print(f"emitted {N_EMITTED} new parity configs")


if __name__ == "__main__":
    main()
