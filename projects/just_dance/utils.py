"""Host-side helpers for the Just Dance demo (reference
``projects/just_dance/utils.py``): aspect-kept resize, [0,1]-blend of two
renders, ffmpeg 30-fps normalization, temporal gaussian keypoint smoothing.
"""

from __future__ import annotations

import os
from typing import Tuple

import cv2
import numpy as np


def resize_image_to_fixed_height(image: np.ndarray, fixed_height: int) -> np.ndarray:
    h, w = image.shape[:2]
    return cv2.resize(image, (int(w * fixed_height / h), fixed_height))


def blend_images(img1: np.ndarray, img2: np.ndarray, blend_ratios: Tuple[float, float] = (1, 1)) -> np.ndarray:
    def norm(im):
        return im.astype(np.float32) / 255.0 if im.dtype == np.uint8 else im

    out = (norm(img1) * blend_ratios[0] + norm(img2) * blend_ratios[1]).clip(0, 1)
    return (out * 255).astype(np.uint8)


def convert_video_fps(video: str) -> str:
    name, ext = video.rsplit(".", 1)
    out = f"{name}_30fps.{ext}"
    if not os.path.exists(out):
        os.system(f"ffmpeg -i {video} -vf \"minterpolate='fps=30'\" {out}")
    return out


def get_smoothed_kpt(kpts: np.ndarray, index: int, sigma: int = 5) -> np.ndarray:
    """Score-weighted gaussian average of keypoint coords over a temporal
    window centered at ``index`` (reference :70-100)."""
    assert kpts.shape[1:] == (17, 3) and sigma % 2 == 1
    start = max(0, index - sigma // 2)
    end = min(len(kpts), index + sigma // 2 + 1)
    piece = kpts[start:end].copy()
    out = kpts[index].copy()
    coords, scores = piece[..., :2], piece[..., 2]
    g = np.exp(-((np.arange(len(scores)) + start - index) ** 2) / 2)
    scores = scores * g[:, None]
    out[..., :2] = (coords * scores[..., None]).sum(0) / (scores[..., None].sum(0) + 1e-4)
    return out
