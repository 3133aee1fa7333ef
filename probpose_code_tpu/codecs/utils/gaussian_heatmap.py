"""Gaussian heatmap target generation — vectorized.

Behavioral parity with reference ``mmpose/codecs/utils/gaussian_heatmap.py``
(generate_gaussian_heatmaps:114, generate_unbiased_gaussian_heatmaps:198,
generate_udp_gaussian_heatmaps:256), re-derived as broadcasted full-map
expressions with window masks instead of window-paste loops.

Key reference behaviors preserved:
- MSRA/UDP styles evaluate the gaussian only inside a (2r+1)^2 window around
  the *rounded* center (r = 3*sigma); outside the window the map is exactly 0.
- A keypoint whose window lies fully outside the map gets weight 0.
- Multiple instances combine with elementwise max.
- MSRA centers the gaussian at the rounded keypoint (biased); UDP at the
  true sub-pixel keypoint; the unbiased (DARK) variant evaluates the full map.
"""

from __future__ import annotations

from typing import Tuple, Union

import numpy as np


def _as_sigma_array(sigma: Union[float, Tuple[float, ...], np.ndarray], N: int) -> np.ndarray:
    if isinstance(sigma, (int, float)):
        return np.full(N, float(sigma))
    return np.asarray(sigma, dtype=np.float64)


def _rounded_center(keypoints: np.ndarray) -> np.ndarray:
    # (kpt + 0.5).astype(int64): truncation toward zero, matching reference.
    return np.trunc(keypoints + 0.5).astype(np.int64)


def generate_gaussian_heatmaps(
    heatmap_size: Tuple[int, int],
    keypoints: np.ndarray,
    keypoints_visible: np.ndarray,
    sigma: Union[float, Tuple[float, ...], np.ndarray],
) -> Tuple[np.ndarray, np.ndarray]:
    """MSRA-style gaussians centered at the rounded keypoint location."""
    keypoints = np.asarray(keypoints, dtype=np.float64)
    N, K, _ = keypoints.shape
    W, H = heatmap_size
    sigmas = _as_sigma_array(sigma, N)

    heatmaps = np.zeros((K, H, W), dtype=np.float32)
    keypoint_weights = keypoints_visible.copy()

    ys = np.arange(H, dtype=np.float64)[:, None]
    xs = np.arange(W, dtype=np.float64)[None, :]

    for n in range(N):
        radius = sigmas[n] * 3
        mu = _rounded_center(keypoints[n])  # (K, 2) int
        left_top = mu - np.int64(radius)
        right_bottom = mu + np.int64(radius) + 1

        in_bounds = ~(
            (left_top[:, 0] >= W) | (left_top[:, 1] >= H) | (right_bottom[:, 0] < 0) | (right_bottom[:, 1] < 0)
        )
        visible = keypoints_visible[n] >= 0.5
        keypoint_weights[n, visible & ~in_bounds] = 0
        active = visible & in_bounds
        if not active.any():
            continue

        dx = xs[None] - mu[:, 0][:, None, None]
        dy = ys[None] - mu[:, 1][:, None, None]
        g = np.exp(-(dx * dx + dy * dy) / (2 * sigmas[n] ** 2))
        window = (
            (xs[None] >= left_top[:, 0][:, None, None])
            & (xs[None] < right_bottom[:, 0][:, None, None])
            & (ys[None] >= left_top[:, 1][:, None, None])
            & (ys[None] < right_bottom[:, 1][:, None, None])
        )
        g = np.where(window, g, 0.0).astype(np.float32)
        g[~active] = 0.0
        np.maximum(heatmaps, g, out=heatmaps)

    return heatmaps, keypoint_weights


def generate_unbiased_gaussian_heatmaps(
    heatmap_size: Tuple[int, int],
    keypoints: np.ndarray,
    keypoints_visible: np.ndarray,
    sigma: float,
) -> Tuple[np.ndarray, np.ndarray]:
    """DARK-style gaussians: full-map evaluation at the sub-pixel center."""
    keypoints = np.asarray(keypoints, dtype=np.float64)
    N, K, _ = keypoints.shape
    W, H = heatmap_size

    heatmaps = np.zeros((K, H, W), dtype=np.float32)
    keypoint_weights = keypoints_visible.copy()
    radius = sigma * 3

    ys = np.arange(H, dtype=np.float32)[:, None]
    xs = np.arange(W, dtype=np.float32)[None, :]

    for n in range(N):
        mu = keypoints[n]
        left_top = mu - radius
        right_bottom = mu + radius + 1
        in_bounds = ~(
            (left_top[:, 0] >= W) | (left_top[:, 1] >= H) | (right_bottom[:, 0] < 0) | (right_bottom[:, 1] < 0)
        )
        visible = keypoints_visible[n] >= 0.5
        keypoint_weights[n, visible & ~in_bounds] = 0
        active = visible & in_bounds
        if not active.any():
            continue

        dx = xs[None] - mu[:, 0][:, None, None].astype(np.float32)
        dy = ys[None] - mu[:, 1][:, None, None].astype(np.float32)
        g = np.exp(-(dx * dx + dy * dy) / (2 * sigma**2)).astype(np.float32)
        g[~active] = 0.0
        np.maximum(heatmaps, g, out=heatmaps)

    return heatmaps, keypoint_weights


def generate_udp_gaussian_heatmaps(
    heatmap_size: Tuple[int, int],
    keypoints: np.ndarray,
    keypoints_visible: np.ndarray,
    sigma: float,
) -> Tuple[np.ndarray, np.ndarray]:
    """UDP-style gaussians: sub-pixel center, window around rounded center."""
    keypoints = np.asarray(keypoints, dtype=np.float64)
    N, K, _ = keypoints.shape
    W, H = heatmap_size

    heatmaps = np.zeros((K, H, W), dtype=np.float32)
    keypoint_weights = keypoints_visible.copy()
    radius = sigma * 3

    ys = np.arange(H, dtype=np.float64)[:, None]
    xs = np.arange(W, dtype=np.float64)[None, :]

    for n in range(N):
        mu = _rounded_center(keypoints[n])
        left_top = (mu - radius).astype(np.int64)
        right_bottom = (mu + radius + 1).astype(np.int64)
        in_bounds = ~(
            (left_top[:, 0] >= W) | (left_top[:, 1] >= H) | (right_bottom[:, 0] < 0) | (right_bottom[:, 1] < 0)
        )
        visible = keypoints_visible[n] >= 0.5
        keypoint_weights[n, visible & ~in_bounds] = 0
        active = visible & in_bounds
        if not active.any():
            continue

        # Window-grid evaluation at offset x0 = size//2 + (mu_exact - mu)
        # collapses to a full-map gaussian centered at the exact keypoint.
        dx = xs[None] - keypoints[n, :, 0][:, None, None]
        dy = ys[None] - keypoints[n, :, 1][:, None, None]
        g = np.exp(-(dx * dx + dy * dy) / (2 * sigma**2))
        window = (
            (xs[None] >= left_top[:, 0][:, None, None])
            & (xs[None] < right_bottom[:, 0][:, None, None])
            & (ys[None] >= left_top[:, 1][:, None, None])
            & (ys[None] < right_bottom[:, 1][:, None, None])
        )
        g = np.where(window, g, 0.0).astype(np.float32)
        g[~active] = 0.0
        np.maximum(heatmaps, g, out=heatmaps)

    return heatmaps, keypoint_weights
