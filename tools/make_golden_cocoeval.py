"""Golden fixture: reference Ex-OKS COCOeval stats on synthetic data.

Loads the reference's vendored evaluator by file path (stubbing its mmpose
imports with our golden-tested equivalents), evaluates synthetic GT/DT sets
under several configurations, and stores the resulting stats for the parity
test of our rewrite.

Usage: python tools/make_golden_cocoeval.py
"""


import os.path as _osp
import sys as _sys

_sys.path.insert(0, _osp.dirname(_osp.dirname(_osp.abspath(__file__))))  # repo root

import importlib.util
import json
import os
import sys
import types

import numpy as np

REF = os.environ.get("REFERENCE_ROOT", "/root/reference")
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")
os.makedirs(OUT, exist_ok=True)

# ---- stub the reference's import graph -----------------------------------
from probpose_code_tpu.structures.keypoint import fix_bbox_aspect_ratio  # noqa: E402

pkg = types.ModuleType("refeval")
pkg.__path__ = [f"{REF}/mmpose/evaluation/metrics"]
sys.modules["refeval"] = pkg

mmpose_stub = types.ModuleType("mmpose")
structures_stub = types.ModuleType("mmpose.structures")
keypoint_stub = types.ModuleType("mmpose.structures.keypoint")
keypoint_stub.fix_bbox_aspect_ratio = fix_bbox_aspect_ratio
sys.modules["mmpose"] = mmpose_stub
sys.modules["mmpose.structures"] = structures_stub
sys.modules["mmpose.structures.keypoint"] = keypoint_stub

mask_stub = types.ModuleType("refeval._mask")
mask_stub.iou = lambda *a, **k: (_ for _ in ()).throw(NotImplementedError)
sys.modules["refeval._mask"] = mask_stub

spec = importlib.util.spec_from_file_location("refeval._cocoeval", f"{REF}/mmpose/evaluation/metrics/_cocoeval.py")
ref_cocoeval = importlib.util.module_from_spec(spec)
sys.modules["refeval._cocoeval"] = ref_cocoeval
spec.loader.exec_module(ref_cocoeval)

from probpose_code_tpu.datasets.coco_api import COCO  # noqa: E402
from probpose_code_tpu.structures.keypoint import find_min_padding_exact  # noqa: E402

rng = np.random.RandomState(42)
K = 17


def synth_dataset(n_images=8):
    images, gt_anns, dt_anns = [], [], []
    gt_id, dt_id = 1, 1
    for img_id in range(1, n_images + 1):
        W, H = 640, 480
        images.append(dict(id=img_id, file_name=f"{img_id}.jpg", width=W, height=H))
        n_inst = rng.randint(1, 4)
        for _ in range(n_inst):
            x, y = rng.uniform(50, 400), rng.uniform(50, 250)
            bw, bh = rng.uniform(60, 180), rng.uniform(90, 200)
            kpts = []
            nk = 0
            for k in range(K):
                # place some keypoints outside the bbox / image
                kx = x + rng.uniform(-0.4, 1.4) * bw
                ky = y + rng.uniform(-0.4, 1.4) * bh
                v = int(rng.choice([0, 1, 2], p=[0.2, 0.3, 0.5]))
                if v > 0:
                    nk += 1
                kpts.extend([float(kx), float(ky), v])
            bbox = [float(x), float(y), float(bw), float(bh)]
            pad = find_min_padding_exact(np.array(bbox + [0])[:4], np.array(kpts))
            # label far-outside keypoints v=3 (like the CropCOCO annotations)
            for k in range(K):
                if kpts[3 * k + 2] > 0 and pad[k] > 1.25:
                    kpts[3 * k + 2] = 3
            gt_anns.append(
                dict(
                    id=gt_id,
                    image_id=img_id,
                    category_id=1,
                    bbox=bbox,
                    area=float(bw * bh),
                    iscrowd=0,
                    keypoints=list(kpts),
                    num_keypoints=nk,
                    pad_to_contain=[float(p) for p in pad],
                )
            )
            # detection: GT + noise; sometimes low-score duplicate
            for dup in range(1 + (rng.rand() < 0.3)):
                noise = rng.randn(K, 2) * (3 + 10 * dup)
                dkpts = []
                karr = np.array(kpts).reshape(K, 3)
                for k in range(K):
                    conf = float(np.clip(rng.rand() * 0.6 + 0.4 - 0.3 * dup, 0, 1))
                    dkpts.extend([float(karr[k, 0] + noise[k, 0]), float(karr[k, 1] + noise[k, 1]), conf])
                dt_anns.append(
                    dict(
                        id=dt_id,
                        image_id=img_id,
                        category_id=1,
                        bbox=bbox,
                        area=float(bw * bh),
                        keypoints=dkpts,
                        score=float(np.clip(rng.rand() * 0.5 + 0.5 - 0.35 * dup, 0.01, 1)),
                    )
                )
                dt_id += 1
            gt_id += 1
        # an occasional false positive
        if rng.rand() < 0.5:
            fx, fy = rng.uniform(0, 500), rng.uniform(0, 350)
            dkpts = []
            for k in range(K):
                dkpts.extend([float(fx + rng.rand() * 80), float(fy + rng.rand() * 120), float(rng.rand())])
            dt_anns.append(
                dict(
                    id=dt_id, image_id=img_id, category_id=1,
                    bbox=[fx, fy, 80.0, 120.0], area=80.0 * 120.0,
                    keypoints=dkpts, score=float(rng.rand() * 0.5),
                )
            )
            dt_id += 1

    cats = [dict(id=1, name="person")]
    return (
        dict(images=images, annotations=gt_anns, categories=cats),
        dict(images=images, annotations=dt_anns, categories=cats),
    )


gt_data, dt_data = synth_dataset()
with open(f"{OUT}/cocoeval_gt.json", "w") as f:
    json.dump(gt_data, f)
with open(f"{OUT}/cocoeval_dt.json", "w") as f:
    json.dump(dt_data, f)

results = {}
for name, kwargs in [
    ("classic", dict(extended_oks=False, match_by_bbox=False)),
    ("extended", dict(extended_oks=True, match_by_bbox=False)),
    ("extended_bbox", dict(extended_oks=True, match_by_bbox=True)),
    ("classic_noarea", dict(extended_oks=False, match_by_bbox=False, use_area=False)),
]:
    cocoGt = COCO(dataset=json.loads(json.dumps(gt_data)))
    cocoDt = COCO(dataset=json.loads(json.dumps(dt_data)))
    ev = ref_cocoeval.COCOeval(cocoGt, cocoDt, iouType="keypoints", **kwargs)
    ev.evaluate()
    ev.accumulate()
    ev.summarize()
    results[f"{name}_stats"] = np.asarray(ev.stats)
    results[f"{name}_names"] = np.asarray(ev.stats_names)
    results[f"{name}_loc_sim"] = np.asarray([np.mean(ev.loc_similarities)])

np.savez(f"{OUT}/cocoeval_stats.npz", **results)
print("saved", {k: v.shape for k, v in results.items()})
