"""Batch-level augmentations applied host-side before device transfer.

Behavioral parity with reference
``mmpose/models/data_preprocessors/batch_augmentation.py``
(BatchSyncRandomResize): every ``interval`` steps pick a random target size
from ``random_size_range`` (rounded to ``size_divisor``) and rescale the
whole batch + its dense GT.

TPU-native difference: free-form dynamic sizes would force an XLA
recompile per new shape. Sizes are therefore drawn from the small static
bucket set implied by ``size_divisor`` — each bucket compiles once and is
cached thereafter — and the resize runs on host NumPy/cv2 before the
device transfer (the reference interpolates on GPU mid-graph).
"""

from __future__ import annotations

import random
from typing import Dict, Tuple

import cv2
import numpy as np

from probpose_code_tpu.registry import MODELS


@MODELS.register_module()
class BatchSyncRandomResize:
    def __init__(self, random_size_range: Tuple[int, int], interval: int = 10, size_divisor: int = 32):
        self._range = (
            round(random_size_range[0] / size_divisor),
            round(random_size_range[1] / size_divisor),
        )
        self.interval = interval
        self.size_divisor = size_divisor
        self._input_size = None
        self._seed_rng = random.Random(0)

    def __call__(self, batch: Dict[str, np.ndarray], step: int) -> Dict[str, np.ndarray]:
        imgs = np.asarray(batch["inputs"])
        h, w = imgs.shape[1:3]
        if self._input_size is None:
            self._input_size = (h, w)
        if step % self.interval == 0:
            size = self._seed_rng.randint(*self._range)
            aspect = w / h
            self._input_size = (self.size_divisor * size, int(self.size_divisor * size * aspect))
        th, tw = self._input_size
        if (th, tw) == (h, w):
            return batch
        sy, sx = th / h, tw / w
        out = dict(batch)
        out["inputs"] = np.stack([
            cv2.resize(img, (tw, th), interpolation=cv2.INTER_LINEAR) for img in imgs
        ]).astype(imgs.dtype)
        if "gt_bboxes" in batch:
            b = np.asarray(batch["gt_bboxes"]).copy()
            b[..., 0::2] *= sx
            b[..., 1::2] *= sy
            out["gt_bboxes"] = b
        if "gt_keypoints" in batch:
            k = np.asarray(batch["gt_keypoints"]).copy()
            k[..., 0] *= sx
            k[..., 1] *= sy
            out["gt_keypoints"] = k
        if "gt_areas" in batch:
            out["gt_areas"] = np.asarray(batch["gt_areas"]) * (sx * sy)
        return out
