"""Golden fixture: full end-to-end reference pipeline on a synthetic mini-COCO.

Proves the north-star accuracy bar (COCO AP / Ex-OKS within 0.1 of the
reference) at the *pipeline* level: image -> crop -> forward -> flip-TTA ->
ProbMap decode -> coordinate restore -> CocoMetric scoring/NMS -> COCOeval.

Reference flow reproduced here (all numerics loaded from /root/reference by
file path — outputs recorded, no code copied):
  - mmpose/apis/inference.py:133        (inference_topdown crop pipeline)
  - mmpose/datasets/transforms/topdown_transforms.py:70  (UDP affine)
  - mmpose/models/pose_estimators/topdown.py:109-114     (flip-TTA)
  - mmpose/models/heads/hybrid_heads/probmap_head.py:600-800 (5-branch head)
  - mmpose/codecs/probmap.py:170        (expected-OKS decode)
  - mmpose/evaluation/metrics/coco_metric.py:545-750     (scoring + COCOeval)

The torch model is a tiny ProbPose-S (embed 64 / 2 layers) built with the
reference's exact layer layout and state-dict naming; its weights are saved
so the parity test converts them with ``convert_torch_state_dict`` and runs
the same images through OUR pipeline.

Usage: python tools/make_golden_e2e.py
"""

import os.path as _osp
import sys as _sys

_sys.path.insert(0, _osp.dirname(_osp.dirname(_osp.abspath(__file__))))  # repo root

import importlib.util
import json
import os
import sys
import types

import cv2
import numpy as np
import torch
import torch.nn as tnn

REF = os.environ.get("REFERENCE_ROOT", "/root/reference")
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")
os.makedirs(OUT, exist_ok=True)

K = 17
INPUT_W, INPUT_H = 192, 256
HM_W, HM_H = 48, 64
PADDING = 1.25
MEAN = np.array([123.675, 116.28, 103.53], np.float32)
STD = np.array([58.395, 57.12, 57.375], np.float32)

# ---------------------------------------------------------------------------
# load reference numeric modules by file path
# ---------------------------------------------------------------------------


def load_module(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


ref_bbox = load_module("ref_bbox", f"{REF}/mmpose/structures/bbox/transforms.py")
ref_post = load_module("ref_post", f"{REF}/mmpose/codecs/utils/post_processing.py")
ref_minpad = load_module("ref_minpad", f"{REF}/mmpose/structures/keypoint/keypoints_min_padding.py")

# nms.py / tta.py import mmpose.structures.bbox — stub what they touch
_bbox_stub = types.ModuleType("mmpose.structures.bbox")
_bbox_stub.bbox_overlaps = lambda *a, **k: (_ for _ in ()).throw(NotImplementedError)
sys.modules.setdefault("mmpose", types.ModuleType("mmpose"))
sys.modules.setdefault("mmpose.structures", types.ModuleType("mmpose.structures"))
sys.modules["mmpose.structures.bbox"] = _bbox_stub
keypoint_stub = types.ModuleType("mmpose.structures.keypoint")
keypoint_stub.fix_bbox_aspect_ratio = ref_minpad.fix_bbox_aspect_ratio
keypoint_stub.find_min_padding_exact = ref_minpad.find_min_padding_exact
sys.modules["mmpose.structures.keypoint"] = keypoint_stub
ref_nms = load_module("ref_nms", f"{REF}/mmpose/evaluation/functional/nms.py")
ref_tta = load_module("ref_tta", f"{REF}/mmpose/models/utils/tta.py")

# the vendored Ex-OKS evaluator (same stub recipe as make_golden_cocoeval.py)
_mask_stub = types.ModuleType("refeval._mask")
_mask_stub.iou = lambda *a, **k: (_ for _ in ()).throw(NotImplementedError)
sys.modules["refeval"] = types.ModuleType("refeval")
sys.modules["refeval"].__path__ = [f"{REF}/mmpose/evaluation/metrics"]
sys.modules["refeval._mask"] = _mask_stub
spec = importlib.util.spec_from_file_location("refeval._cocoeval", f"{REF}/mmpose/evaluation/metrics/_cocoeval.py")
ref_cocoeval = importlib.util.module_from_spec(spec)
sys.modules["refeval._cocoeval"] = ref_cocoeval
spec.loader.exec_module(ref_cocoeval)

from probpose_code_tpu.datasets.coco_api import COCO  # noqa: E402
from probpose_code_tpu.datasets.metainfo import parse_pose_metainfo  # noqa: E402

META = parse_pose_metainfo({"dataset_name": "coco"})
SIGMAS = np.asarray(META["sigmas"], np.float32)
FLIP_INDICES = list(META["flip_indices"])


# torch oracle model (tiny/full geometry) lives in tools/_e2e_torch_model.py
from _e2e_torch_model import build_e2e_model  # noqa: E402


# ---------------------------------------------------------------------------
# synthetic mini-COCO
# ---------------------------------------------------------------------------


def synth_images_and_bboxes(rng, n_images=24):
    """Textured images + person bboxes (GT keypoints are synthesized later
    from the model's own predictions so that AP is mid-range and sensitive).

    Beyond the independent boxes, every third image carries a CROWDED pair
    (two heavily-overlapping boxes — the OKS-NMS / matching-ambiguity
    regime) and every fourth a TRUNCATED instance whose box is clipped at
    the image border (the CropCOCO regime: the person continues outside the
    image, so GT keypoints synthesized around it land out-of-image and the
    Ex-OKS activation-window penalties are exercised). VERDICT r4 next #4."""

    def _draw_box(img, x, y, bw, bh, W, H):
        cv2.rectangle(img, (int(x), int(y)), (int(x + bw), int(y + bh)),
                      tuple(int(c) for c in rng.randint(60, 255, 3)), 2)
        for _ in range(6):
            cx = int(np.clip(x + rng.uniform(0, bw), 0, W - 1))
            cy = int(np.clip(y + rng.uniform(0, bh), 0, H - 1))
            cv2.circle(img, (cx, cy), int(rng.randint(2, 6)),
                       tuple(int(c) for c in rng.randint(0, 255, 3)), -1)

    images, bboxes, arrays = [], {}, {}
    for img_id in range(1, n_images + 1):
        W = int(rng.randint(256, 420))
        H = int(rng.randint(256, 420))
        # smooth random background (upsampled low-res noise) + edges/blobs
        low = rng.randint(0, 255, (8, 8, 3)).astype(np.uint8)
        img = cv2.resize(low, (W, H), interpolation=cv2.INTER_CUBIC)
        images.append(dict(id=img_id, file_name=f"{img_id}.jpg", width=W, height=H))
        boxes = []
        for _ in range(int(rng.randint(1, 4))):
            bw = float(rng.uniform(0.25, 0.55) * W)
            bh = float(rng.uniform(0.35, 0.7) * H)
            x = float(rng.uniform(0, W - bw))
            y = float(rng.uniform(0, H - bh))
            _draw_box(img, x, y, bw, bh, W, H)
            boxes.append([x, y, bw, bh])
        if img_id % 3 == 0:
            # crowded pair: second box shifted by < 30% of the first's size
            x, y, bw, bh = boxes[0]
            dx = float(rng.uniform(-0.3, 0.3) * bw)
            dy = float(rng.uniform(-0.3, 0.3) * bh)
            x2 = float(np.clip(x + dx, 0, W - bw))
            y2 = float(np.clip(y + dy, 0, H - bh))
            _draw_box(img, x2, y2, bw, bh, W, H)
            boxes.append([x2, y2, bw, bh])
        if img_id % 4 == 0:
            # truncated instance: box clipped at a border (person continues
            # outside the image). COCO convention: ann bbox stays inside.
            bw = float(rng.uniform(0.3, 0.5) * W)
            bh = float(rng.uniform(0.4, 0.7) * H)
            side = int(rng.randint(4))
            if side == 0:
                x, y = 0.0, float(rng.uniform(0, H - bh))
                bw *= float(rng.uniform(0.4, 0.7))  # left part cut off
            elif side == 1:
                x, y = float(W - bw * rng.uniform(0.4, 0.7)), float(rng.uniform(0, H - bh))
                bw = float(W - x)
            elif side == 2:
                x, y = float(rng.uniform(0, W - bw)), 0.0
                bh *= float(rng.uniform(0.4, 0.7))
            else:
                x, y = float(rng.uniform(0, W - bw)), float(H - bh * rng.uniform(0.4, 0.7))
                bh = float(H - y)
            _draw_box(img, x, y, bw, bh, W, H)
            boxes.append([x, y, bw, bh])
        bboxes[img_id] = boxes
        arrays[f"img_{img_id}"] = img
    return images, bboxes, arrays


def synth_gt_from_preds(rng, pred, bbox, img_w, img_h):
    """GT keypoints = predictions + noise at a per-instance difficulty level.

    Noise is scaled by the COCO per-keypoint sigmas and instance size so the
    resulting OKS spans ~0.3-0.98 and AP responds to every pipeline stage.
    A few keypoints are pushed far outside the padded box (the Ex-OKS
    out-of-image regime) and some are marked v=0/1."""
    area = bbox[2] * bbox[3] * 0.53
    scale = np.sqrt(area)
    level = float(rng.choice([0.2, 0.5, 0.9, 1.6]))
    kpts, nk = [], 0
    for k in range(K):
        r = rng.rand()
        # correlate out-of-image GT with low predicted probability so the
        # prob-threshold learning (coco_metric.py:982-1003) lands mid-range
        # and the Ex-OKS confidence gate (_cocoeval.py:638-641) is exercised
        p_out = 0.45 if pred["keypoint_probs"][k] < 0.5 else 0.05
        if r < 0.10:
            v = 0
            kx, ky = 0.0, 0.0
        elif r < 0.10 + p_out:
            # far outside the padded bbox -> effective v=3 (out of image) in
            # the Ex-OKS recompute (_cocoeval.py:593, coco_metric.py:872-878)
            v = 2
            kx = bbox[0] - bbox[2] * (1.5 + rng.rand())
            ky = bbox[1] - bbox[3] * (1.5 + rng.rand())
            nk += 1
        else:
            v = int(rng.choice([1, 2], p=[0.3, 0.7]))
            noise = rng.normal(0, level * SIGMAS[k] * 2 * scale * 0.5, 2)
            kx = float(np.clip(pred["keypoints"][k, 0] + noise[0], 0, img_w - 1))
            ky = float(np.clip(pred["keypoints"][k, 1] + noise[1], 0, img_h - 1))
            nk += 1
        kpts.extend([float(kx), float(ky), v])
    return kpts, nk, area


# ---------------------------------------------------------------------------
# reference inference pipeline (numerics only)
# ---------------------------------------------------------------------------


def crop_instance(img, bbox_xywh):
    """GetBBoxCenterScale + TopdownAffine(use_udp, input_padding=1.25).

    Mirrors topdown_transforms.py:110-126: center/scale from the bbox with
    input_padding, aspect fixed to w/h, UDP warp, cv2 linear resample."""
    x, y, w, h = bbox_xywh
    bbox_xyxy = np.array([x, y, x + w, y + h], np.float32)
    c, s = ref_bbox.bbox_xyxy2cs(bbox_xyxy, padding=PADDING)
    aspect = INPUT_W / INPUT_H
    sw, sh = float(s[0]), float(s[1])
    if sw > sh * aspect:
        s = np.array([sw, sw / aspect], np.float32)
    else:
        s = np.array([sh * aspect, sh], np.float32)
    warp = ref_bbox.get_udp_warp_matrix(c, s, 0.0, output_size=(INPUT_W, INPUT_H))
    crop = cv2.warpAffine(img, warp, (INPUT_W, INPUT_H), flags=cv2.INTER_LINEAR)
    return crop, c, s


def preprocess(crop_bgr):
    x = crop_bgr[..., ::-1].astype(np.float32)  # bgr->rgb
    x = (x - MEAN) / STD
    return torch.from_numpy(x.transpose(2, 0, 1)[None])


@torch.no_grad()
def infer_instances(model, img, bboxes_xywh):
    """flip-TTA forward + ProbMap decode + restore to image space."""
    preds = []
    for bbox in bboxes_xywh:
        crop, c, s = crop_instance(img, bbox)
        x = preprocess(crop)
        hm, prob, vis, oks, err = model(x)
        hm_f, prob_f, vis_f, oks_f, err_f = model(torch.flip(x, dims=[-1]))
        hm_f = ref_tta.flip_heatmaps(hm_f, flip_indices=FLIP_INDICES, flip_mode="heatmap", shift_heatmap=False)
        fi = torch.as_tensor(FLIP_INDICES)
        hm = (hm + hm_f) * 0.5
        prob = (prob + prob_f[:, fi]) * 0.5
        vis = (vis + vis_f[:, fi]) * 0.5
        oks = (oks + oks_f[:, fi]) * 0.5
        err = (err + err_f[:, fi]) * 0.5

        heatmaps = hm[0].numpy()
        kpts, scores = ref_post.get_heatmap_expected_value(heatmaps)  # probmap.py:190
        kpts = kpts / [HM_W - 1, HM_H - 1] * [INPUT_W, INPUT_H]  # probmap.py:218
        # probmap_head.py:786 — normalize error by heatmap diagonal
        err = err[0].numpy() / np.sqrt(HM_H**2 + HM_W**2)
        oks = oks[0].numpy()
        # topdown.py:165-167 — input space -> original image space
        kpts = kpts / [INPUT_W, INPUT_H] * s + c - 0.5 * s
        preds.append(
            dict(
                keypoints=kpts.astype(np.float32),
                keypoint_scores=oks.astype(np.float32),  # freeze_oks=False: probmap_head.py:797
                keypoints_conf=scores.astype(np.float32),
                keypoint_probs=prob[0].numpy().astype(np.float32),
                keypoints_visible=vis[0].numpy().astype(np.float32),
                keypoint_errors=err.astype(np.float32),
            )
        )
    return preds


def instance_score(pred):
    """score_mode='bbox_keypoint', score_thresh_type='prob', thr=0.45.

    Mirrors coco_metric.py:559-572."""
    mean, valid = 0.0, 0
    for k in range(K):
        if pred["keypoint_probs"][k] > 0.45:
            mean += pred["keypoint_scores"][k]
            valid += 1
    if valid:
        mean /= valid
    return 1.0 * mean  # bbox_score == 1 for GT boxes


def learn_prob_thr(valid_by_img, gt_anns):
    """coco_metric.py:819-1003 — learn prob threshold from in-image GT flags.

    gt_probs: v==3 (recomputed out-of-image) -> 0, v in {1,2} -> 1, v==0 -> nan;
    threshold = argmax accuracy over 21 linspace thresholds (:1308-1317)."""
    gt_by_key = {(a["image_id"], a["id"]): a for a in gt_anns}
    gt_probs, dt_probs = [], []
    for img_id, insts in valid_by_img.items():
        for inst in insts:
            g = gt_by_key[(inst["img_id"], inst["id"])]
            gk = np.array(g["keypoints"], np.float32).reshape(-1, 3)
            if np.allclose(gk, 0):
                continue
            gtv = gk[:, 2].copy()
            min_padding = ref_minpad.find_min_padding_exact(np.array(g["bbox"], np.float32), gk)
            kpts_out = min_padding > PADDING
            gtv[(gtv > 2) & (~kpts_out)] = 1
            gtv[kpts_out] = 3
            gp = gtv.copy()
            gp[gp == 0] = np.nan
            gp[(gp == 1) | (gp == 2)] = 1
            gp[gp == 3] = 0
            gt_probs.append(gp)
            dt_probs.append(inst["keypoint_probs"])
    gt_probs = np.concatenate(gt_probs)
    dt_probs = np.concatenate(dt_probs).astype(np.float32)
    mask = ~np.isnan(gt_probs)
    gts, dts = gt_probs[mask].astype(bool), dt_probs[mask]
    thresholds = np.linspace(0, 1.0, 21, endpoint=True)
    acc = ((dts[:, None] > thresholds) == gts[:, None]).sum(0) / len(gts)
    return float(thresholds[int(np.argmax(acc))])


def main(full: bool = False):
    suffix = "_full" if full else ""
    rng = np.random.RandomState(1234)
    images, bboxes_by_img, arrays = synth_images_and_bboxes(rng)

    model = build_e2e_model(full=full)
    if not full:
        # full-geometry weights (~98 MB) are regenerated from the seed by
        # the parity test instead of being committed
        torch.save(model.state_dict(), os.path.join(OUT, "e2e_weights.pth"))

    # 1st pass: run the reference pipeline, then synthesize GT around it
    all_anns = []
    preds_by_img = {}
    ann_id = 1
    for im in images:
        img = arrays[f"img_{im['id']}"]
        preds = infer_instances(model, img, bboxes_by_img[im["id"]])
        preds_by_img[im["id"]] = preds
        for bbox, p in zip(bboxes_by_img[im["id"]], preds):
            kpts, nk, area = synth_gt_from_preds(rng, p, bbox, im["width"], im["height"])
            all_anns.append(
                dict(
                    id=ann_id,
                    image_id=im["id"],
                    category_id=1,
                    keypoints=kpts,
                    num_keypoints=nk,
                    bbox=[float(b) for b in bbox],
                    area=float(area),
                    iscrowd=0,
                )
            )
            ann_id += 1
    gt = dict(
        info={"description": "synthetic e2e parity set"},
        images=images,
        annotations=all_anns,
        categories=[dict(id=1, name="person", keypoints=[str(i) for i in range(K)], skeleton=[])],
    )
    with open(os.path.join(OUT, f"e2e{suffix}_coco.json"), "w") as f:
        json.dump(gt, f)

    anns_by_img = {}
    for a in gt["annotations"]:
        anns_by_img.setdefault(a["image_id"], []).append(a)

    kpts_by_img = {}
    flat_preds = {}
    for im in gt["images"]:
        anns = anns_by_img[im["id"]]
        preds = preds_by_img[im["id"]]
        insts = []
        for a, p in zip(anns, preds):
            inst = dict(p)
            inst["img_id"] = im["id"]
            inst["id"] = a["id"]
            inst["bbox_score"] = 1.0
            inst["score"] = instance_score(p)
            inst["area"] = a["area"]
            # coco_metric.py:546-548 — concat probs as the v-channel before NMS
            inst["keypoints_xyp"] = np.concatenate([p["keypoints"], p["keypoint_probs"][:, None]], axis=-1)
            insts.append(inst)
            flat_preds[a["id"]] = p
        # oks_nms (coco_metric.py:576-579), nms_thr=0.9
        keep = ref_nms.oks_nms(
            [dict(keypoints=i["keypoints_xyp"], score=i["score"], area=i["area"]) for i in insts],
            thr=0.9,
            sigmas=SIGMAS,
        )
        kpts_by_img[im["id"]] = [insts[i] for i in keep]

    prob_thr = learn_prob_thr(kpts_by_img, gt["annotations"])
    print(f"learned prob_thr = {prob_thr}")

    # results2json (coco_metric.py:630-668): v-channel carries keypoint_probs
    dt_list = []
    for img_id, insts in kpts_by_img.items():
        for inst in insts:
            kp = inst["keypoints_xyp"]
            dt_list.append(
                dict(
                    image_id=img_id,
                    category_id=1,
                    keypoints=kp.reshape(-1).tolist(),
                    score=float(inst["score"]),
                )
            )

    coco = COCO(os.path.join(OUT, f"e2e{suffix}_coco.json"))
    # coco_metric.py:220-233 — precompute pad_to_contain per GT annotation
    for ann in coco.anns.values():
        kpts = np.array(ann["keypoints"]).reshape(-1, 3)
        bbox = np.array(ann["bbox"]).flatten()
        ann["pad_to_contain"] = ref_minpad.find_min_padding_exact(bbox, kpts)
    coco_det = coco.loadRes(dt_list)
    stats_all = {}
    for extended in (False, True):
        e = ref_cocoeval.COCOeval(
            coco,
            coco_det,
            iouType="keypoints",
            sigmas=SIGMAS,
            use_area=True,
            extended_oks=extended,
            match_by_bbox=False,
            confidence_thr=prob_thr,
            padding=PADDING,
            ignore_near_bbox=False,
        )
        e.params.useSegm = None
        e.evaluate()
        e.accumulate()
        e.summarize()
        stats_all["Ex_stats" if extended else "stats"] = np.asarray(e.stats, np.float64)

    out = dict(prob_thr=np.float64(prob_thr), **stats_all, **arrays)
    # per-instance predicted keypoints/scores for keypoint-level comparison
    ids = sorted(flat_preds)
    out["pred_ids"] = np.asarray(ids, np.int64)
    for field in ("keypoints", "keypoint_scores", "keypoint_probs", "keypoints_visible", "keypoint_errors", "keypoints_conf"):
        out[f"pred_{field}"] = np.stack([flat_preds[i][field] for i in ids])
    np.savez_compressed(os.path.join(OUT, f"e2e{suffix}_pipeline.npz"), **out)
    print(f"stats: {stats_all['stats'][:3]}  Ex: {stats_all['Ex_stats'][:3]}")
    print(f"wrote e2e{suffix}_coco.json / e2e{suffix}_pipeline.npz")


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true", help="real ProbPose-S geometry (384d x12, deconv 256)")
    main(full=ap.parse_args().full)
