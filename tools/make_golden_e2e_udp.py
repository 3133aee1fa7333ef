"""Golden end-to-end fixture #2: HRNet + UDP heatmaps through the REFERENCE
pipeline numerics on a synthetic mini-COCO.

Complements ``make_golden_e2e.py`` (ProbPose-S): this one exercises the
classic heatmap family — cv2 UDP crop, torch tiny-HRNet forward, flip-TTA,
``get_heatmap_maximum`` + DARK-UDP refinement decode
(``codecs/utils/refinement.py:102``), bbox_keypoint scoring, OKS-NMS, and
the standard COCOeval — recording per-instance predictions + AP stats that
the converted flax pipeline must reproduce
(tests/test_apis/test_e2e_parity_udp.py).

Usage: python tools/make_golden_e2e_udp.py  (needs /root/reference mounted)
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from make_golden_e2e import (  # noqa: E402
    FLIP_INDICES,
    HM_H,
    HM_W,
    INPUT_H,
    INPUT_W,
    OUT,
    SIGMAS,
    crop_instance,
    preprocess,
    ref_cocoeval,
    ref_nms,
    ref_post,
    ref_tta,
    synth_gt_from_preds,
    synth_images_and_bboxes,
)
from tests.test_engine.test_torch_conversion import TINY_HRNET_EXTRA, _build_torch_hrnet  # noqa: E402

import torch  # noqa: E402

from probpose_code_tpu.datasets.coco_api import COCO  # noqa: E402

if "ref_codecs_utils.refinement" in sys.modules:
    ref_refine = sys.modules["ref_codecs_utils.refinement"]
else:
    # refinement imports `.post_processing`; emulate the package context
    # (same recipe as make_golden.py)
    import importlib.util
    import types

    REF = os.environ.get("REFERENCE_ROOT", "/root/reference")
    pkg = types.ModuleType("ref_codecs_utils")
    pkg.__path__ = [f"{REF}/mmpose/codecs/utils"]
    sys.modules["ref_codecs_utils"] = pkg
    sys.modules["ref_codecs_utils.post_processing"] = ref_post
    spec = importlib.util.spec_from_file_location(
        "ref_codecs_utils.refinement", f"{REF}/mmpose/codecs/utils/refinement.py"
    )
    ref_refine = importlib.util.module_from_spec(spec)
    sys.modules["ref_codecs_utils.refinement"] = ref_refine
    spec.loader.exec_module(ref_refine)

BLUR = 11


@torch.no_grad()
def infer_instances(model, img, bboxes_xywh):
    """flip-TTA forward + UDP-DARK decode + restore to image space
    (reference heatmap_head.predict:215 + udp_heatmap.decode:146)."""
    preds = []
    for bbox in bboxes_xywh:
        crop, c, s = crop_instance(img, bbox)
        x = preprocess(crop)
        hm = model(x)
        hm_f = model(torch.flip(x, dims=[-1]))
        hm_f = ref_tta.flip_heatmaps(hm_f, flip_indices=FLIP_INDICES, flip_mode="heatmap", shift_heatmap=False)
        heatmaps = ((hm + hm_f) * 0.5)[0].numpy()

        kpts, scores = ref_post.get_heatmap_maximum(heatmaps.copy())
        kpts = ref_refine.refine_keypoints_dark_udp(kpts[None].copy(), heatmaps.copy(), blur_kernel_size=BLUR)[0]
        kpts = kpts / [HM_W - 1, HM_H - 1] * [INPUT_W, INPUT_H]  # udp_heatmap.py decode scaling
        kpts = kpts / [INPUT_W, INPUT_H] * s + c - 0.5 * s  # topdown.py:165-167
        preds.append(dict(
            keypoints=kpts.astype(np.float32),
            keypoint_scores=scores.astype(np.float32),
            # synth_gt_from_preds pushes GT out of image when this is < 0.5;
            # the plain-COCOeval UDP protocol has no out-of-image handling,
            # so keep that regime at its 5% floor
            keypoint_probs=np.ones_like(scores),
        ))
    return preds


def instance_score(pred, thr=0.2):
    """score_mode='bbox_keypoint', score_thresh_type='score' (coco default)."""
    valid = pred["keypoint_scores"] > thr
    return float(pred["keypoint_scores"][valid].mean()) if valid.any() else 0.0


def main():
    rng = np.random.RandomState(4321)
    images, bboxes_by_img, arrays = synth_images_and_bboxes(rng, n_images=10)

    torch.manual_seed(11)
    model = _build_torch_hrnet(TINY_HRNET_EXTRA)
    # Briefly train toward per-channel gaussian targets: an untrained net
    # emits noise-like maps whose top peaks tie within float error, so the
    # argmax decode flips between stacks; decisive unimodal heatmaps keep
    # the fixture's decode decision-stable while GT noise levels control AP.
    hm_h, hm_w = INPUT_H // 4, INPUT_W // 4
    yy, xx = np.mgrid[:hm_h, :hm_w]
    tgt_rng = np.random.RandomState(5)
    targets = np.stack([
        np.exp(-((yy - tgt_rng.uniform(8, hm_h - 8)) ** 2 + (xx - tgt_rng.uniform(6, hm_w - 6)) ** 2) / (2 * 3.0**2))
        for _ in range(17)
    ]).astype(np.float32)
    tgt = torch.from_numpy(targets)[None]
    opt = torch.optim.Adam(model.parameters(), lr=2e-3)
    model.train()
    for _ in range(60):
        x = torch.randn(2, 3, INPUT_H, INPUT_W)
        out = model(x)
        loss = ((out - tgt) ** 2).mean()
        opt.zero_grad()
        loss.backward()
        opt.step()
    model.eval()
    torch.save(model.state_dict(), os.path.join(OUT, "e2e_udp_weights.pth"))

    all_anns = []
    preds_by_img = {}
    ann_id = 1
    for im in images:
        img = arrays[f"img_{im['id']}"]
        preds = infer_instances(model, img, bboxes_by_img[im["id"]])
        preds_by_img[im["id"]] = preds
        for bbox, p in zip(bboxes_by_img[im["id"]], preds):
            kpts, nk, area = synth_gt_from_preds(rng, p, bbox, im["width"], im["height"])
            all_anns.append(dict(
                id=ann_id, image_id=im["id"], category_id=1, keypoints=kpts,
                num_keypoints=nk, bbox=[float(b) for b in bbox], area=float(area), iscrowd=0,
            ))
            ann_id += 1
    gt = dict(
        info={"description": "synthetic e2e UDP parity set"},
        images=images,
        annotations=all_anns,
        categories=[dict(id=1, name="person", keypoints=[str(i) for i in range(17)], skeleton=[])],
    )
    with open(os.path.join(OUT, "e2e_udp_coco.json"), "w") as f:
        json.dump(gt, f)

    anns_by_img = {}
    for a in gt["annotations"]:
        anns_by_img.setdefault(a["image_id"], []).append(a)

    flat_preds = {}
    dt_list = []
    for im in gt["images"]:
        insts = []
        for a, p in zip(anns_by_img[im["id"]], preds_by_img[im["id"]]):
            # NMS area = predicted keypoint extent (coco_metric.py:215-218)
            kp = p["keypoints"]
            area = float((kp[:, 0].max() - kp[:, 0].min()) * (kp[:, 1].max() - kp[:, 1].min()))
            insts.append(dict(
                keypoints=np.concatenate([p["keypoints"], p["keypoint_scores"][:, None]], -1),
                score=instance_score(p), area=area, id=a["id"],
            ))
            flat_preds[a["id"]] = p
        keep = ref_nms.oks_nms(
            [dict(keypoints=i["keypoints"], score=i["score"], area=i["area"]) for i in insts],
            thr=0.9, sigmas=SIGMAS,
        )
        for i in keep:
            inst = insts[i]
            dt_list.append(dict(
                image_id=im["id"], category_id=1,
                keypoints=inst["keypoints"].reshape(-1).tolist(), score=inst["score"],
            ))

    coco = COCO(os.path.join(OUT, "e2e_udp_coco.json"))
    coco_det = coco.loadRes(dt_list)
    e = ref_cocoeval.COCOeval(coco, coco_det, iouType="keypoints", sigmas=SIGMAS, use_area=True,
                              extended_oks=False, match_by_bbox=False)
    e.params.useSegm = None
    e.evaluate()
    e.accumulate()
    e.summarize()

    out = dict(stats=np.asarray(e.stats, np.float64), **arrays)
    ids = sorted(flat_preds)
    out["pred_ids"] = np.asarray(ids, np.int64)
    out["pred_keypoints"] = np.stack([flat_preds[i]["keypoints"] for i in ids])
    out["pred_keypoint_scores"] = np.stack([flat_preds[i]["keypoint_scores"] for i in ids])
    np.savez_compressed(os.path.join(OUT, "e2e_udp_pipeline.npz"), **out)
    print(f"stats: {e.stats[:3]}")
    print("wrote e2e_udp_coco.json, e2e_udp_weights.pth, e2e_udp_pipeline.npz")


if __name__ == "__main__":
    main()
