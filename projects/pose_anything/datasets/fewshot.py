"""Few-shot episode dataset (MP-100-style) for Pose Anything.

Reference counterpart: ``projects/pose_anything/datasets/datasets/mp100/
fewshot_dataset.py`` — episodes pair a support and a query instance of the
same category; the support keypoints + skeleton condition the query
prediction. This implementation consumes any COCO-style keypoint annotation
file (MP-100 ships in that format) and keeps the transform chain minimal:
bbox crop with padding -> fixed-size resize -> normalized keypoints.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, List, Optional, Tuple

import cv2
import numpy as np

from probpose_code_tpu.datasets.coco_api import COCO
from probpose_code_tpu.registry import DATASETS


@DATASETS.register_module()
class FewShotKeypointDataset:
    """Episode sampler over a COCO-style keypoint dataset.

    Each item is a (support, query) pair from the same category with the
    category's skeleton adjacency. ``num_episodes`` fixes the epoch length;
    episodes are resampled deterministically per epoch seed.
    """

    def __init__(
        self,
        ann_file: str,
        img_dir: str,
        img_size: Tuple[int, int] = (256, 256),
        num_episodes: int = 1000,
        padding: float = 1.25,
        max_kpts: int = 32,
        seed: int = 0,
    ):
        self.coco = COCO(ann_file)
        self.img_dir = img_dir
        self.img_size = tuple(img_size)
        self.num_episodes = num_episodes
        self.padding = padding
        self.max_kpts = max_kpts
        self.seed = seed

        self.by_cat: Dict[int, List[int]] = defaultdict(list)
        for ann_id, ann in self.coco.anns.items():
            if ann.get("num_keypoints", 0) >= 3 and not ann.get("iscrowd", 0):
                self.by_cat[ann["category_id"]].append(ann_id)
        self.cats = [c for c, ids in self.by_cat.items() if len(ids) >= 2]
        assert self.cats, "need at least one category with >= 2 annotated instances"

    def __len__(self) -> int:
        return self.num_episodes

    def _load_instance(self, ann_id: int):
        ann = self.coco.anns[ann_id]
        img_info = self.coco.imgs[ann["image_id"]]
        import os.path as osp

        img = cv2.imread(osp.join(self.img_dir, img_info["file_name"]))
        assert img is not None, img_info["file_name"]
        x, y, w, h = ann["bbox"]
        cx, cy = x + w / 2, y + h / 2
        side = max(w, h) * self.padding
        x0, y0 = cx - side / 2, cy - side / 2

        W, H = self.img_size
        mat = np.array([[W / side, 0, -x0 * W / side], [0, H / side, -y0 * H / side]], np.float32)
        crop = cv2.warpAffine(img, mat, (W, H), flags=cv2.INTER_LINEAR)

        kpts = np.asarray(ann["keypoints"], np.float32).reshape(-1, 3)
        xy = kpts[:, :2] @ mat[:, :2].T + mat[:, 2]
        vis = (kpts[:, 2] > 0).astype(np.float32)
        K = min(len(kpts), self.max_kpts)
        kpts_norm = np.zeros((self.max_kpts, 2), np.float32)
        mask = np.zeros(self.max_kpts, np.float32)
        kpts_norm[:K] = np.clip(xy[:K] / [W, H], 0.0, 1.0)
        mask[:K] = vis[:K]
        return crop, kpts_norm, mask, ann["category_id"]

    def _adjacency(self, cat_id: int) -> np.ndarray:
        adj = np.zeros((self.max_kpts, self.max_kpts), np.float32)
        cat = self.coco.cats.get(cat_id, {})
        for a, b in cat.get("skeleton", []) or []:
            # COCO skeletons are 1-indexed
            ia, ib = a - 1, b - 1
            if 0 <= ia < self.max_kpts and 0 <= ib < self.max_kpts:
                adj[ia, ib] = adj[ib, ia] = 1.0
        return adj

    def __getitem__(self, idx: int) -> dict:
        rng = np.random.RandomState(self.seed * 100003 + idx)
        cat = self.cats[int(rng.randint(len(self.cats)))]
        sup_id, qry_id = rng.choice(self.by_cat[cat], size=2, replace=False)
        sup_img, sup_kpts, sup_mask, _ = self._load_instance(int(sup_id))
        qry_img, qry_kpts, qry_mask, _ = self._load_instance(int(qry_id))
        return dict(
            support_img=sup_img.astype(np.float32),
            query_img=qry_img.astype(np.float32),
            support_kpts_norm=sup_kpts,
            support_mask=sup_mask,
            query_kpts_norm=qry_kpts,
            query_mask=qry_mask * sup_mask,  # only keypoints defined in both
            adjacency=self._adjacency(cat),
        )


def collate_episodes(samples: List[dict]) -> dict:
    return {k: np.stack([s[k] for s in samples]) for k in samples[0]}
