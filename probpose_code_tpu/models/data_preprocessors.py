"""Data preprocessors: PoseDataPreprocessor + batch-level augmentations.

PoseDataPreprocessor (reference
``mmpose/models/data_preprocessors/data_preprocessor.py:14-105``) is the
registered normalize stage the jitted model programs call; the collate/
transfer side it owns in the reference belongs to ``datasets/loader.py``
here.

BatchSyncRandomResize has behavioral parity with reference
``mmpose/models/data_preprocessors/batch_augmentation.py``: every
``interval`` steps pick a random target size
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
from typing import Dict, Optional, Sequence, Tuple

import cv2
import jax.numpy as jnp
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


@MODELS.register_module()
class PoseDataPreprocessor:
    """Normalize a (B, H, W, 3) uint8/float batch: optional BGR->RGB channel
    flip, subtract ``mean`` / divide ``std`` per channel, optionally pad the
    spatial dims to a multiple of ``pad_size_divisor`` (with ``pad_value``).

    Pure function of its inputs — safe to call inside ``jax.jit``.
    """

    def __init__(
        self,
        mean: Sequence[float] = (0.0, 0.0, 0.0),
        std: Sequence[float] = (1.0, 1.0, 1.0),
        bgr_to_rgb: bool = False,
        rgb_to_bgr: bool = False,
        pad_size_divisor: int = 1,
        pad_value: float = 0.0,
        batch_augments: Optional[list] = None,
        non_blocking: bool = False,  # accepted for config parity; transfers are async in JAX
    ):
        self.mean = tuple(float(m) for m in mean)
        self.std = tuple(float(s) for s in std)
        self.channel_flip = bool(bgr_to_rgb or rgb_to_bgr)
        self.pad_size_divisor = int(pad_size_divisor)
        self.pad_value = float(pad_value)
        self.batch_augments = batch_augments or []

    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        x = jnp.asarray(images).astype(jnp.float32)
        if self.channel_flip:
            x = x[..., ::-1]
        x = (x - jnp.asarray(self.mean, jnp.float32)) / jnp.asarray(self.std, jnp.float32)
        d = self.pad_size_divisor
        if d > 1:
            B, H, W, C = x.shape
            ph, pw = (-H) % d, (-W) % d
            if ph or pw:
                x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)),
                            constant_values=self.pad_value)
        return x
