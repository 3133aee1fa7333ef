"""Keypoint refinement: quarter-offset, DARK, DARK-UDP, SimCC-DARK.

Parity targets: reference ``mmpose/codecs/utils/refinement.py``
(refine_keypoints:9, refine_keypoints_dark:48, refine_keypoints_dark_udp:102,
refine_simcc_dark:162). Vectorized over instances and keypoints.
All functions operate on copies and return the refined array.
"""

from __future__ import annotations

import numpy as np

from .post_processing import gaussian_blur, gaussian_blur1d


def refine_keypoints(keypoints: np.ndarray, heatmaps: np.ndarray) -> np.ndarray:
    """Shift each peak 0.25px toward the larger neighbor."""
    keypoints = keypoints.copy()
    N, K = keypoints.shape[:2]
    H, W = heatmaps.shape[1:]

    x = keypoints[..., 0].astype(int)  # (N, K)
    y = keypoints[..., 1].astype(int)
    k_idx = np.broadcast_to(np.arange(K), (N, K))

    valid_x = (x > 1) & (x < W - 1) & (y > 0) & (y < H)
    valid_y = (y > 1) & (y < H - 1) & (x > 0) & (x < W)

    xc = np.clip(x, 0, W - 1)
    yc = np.clip(y, 0, H - 1)
    dx = np.where(
        valid_x,
        heatmaps[k_idx, yc, np.clip(x + 1, 0, W - 1)] - heatmaps[k_idx, yc, np.clip(x - 1, 0, W - 1)],
        0.0,
    )
    dy = np.where(
        valid_y,
        heatmaps[k_idx, np.clip(y + 1, 0, H - 1), xc] - heatmaps[k_idx, np.clip(y - 1, 0, H - 1), xc],
        0.0,
    )
    keypoints[..., 0] += np.sign(dx).astype(np.float32) * 0.25
    keypoints[..., 1] += np.sign(dy).astype(np.float32) * 0.25
    return keypoints


def refine_keypoints_dark(keypoints: np.ndarray, heatmaps: np.ndarray, blur_kernel_size: int) -> np.ndarray:
    """DARK refinement: modulated log-heatmap + 2nd-order Taylor with full
    2x2 Hessian (pinv)."""
    keypoints = keypoints.copy()
    N, K = keypoints.shape[:2]
    H, W = heatmaps.shape[1:]

    hm = gaussian_blur(heatmaps.copy(), blur_kernel_size)
    np.maximum(hm, 1e-10, hm)
    np.log(hm, hm)

    x = keypoints[..., 0].astype(int)
    y = keypoints[..., 1].astype(int)
    k_idx = np.broadcast_to(np.arange(K), (N, K))
    valid = (x > 1) & (x < W - 2) & (y > 1) & (y < H - 2)
    xc = np.clip(x, 2, W - 3)
    yc = np.clip(y, 2, H - 3)

    v = lambda dy_, dx_: hm[k_idx, yc + dy_, xc + dx_]
    dx = 0.5 * (v(0, 1) - v(0, -1))
    dy = 0.5 * (v(1, 0) - v(-1, 0))
    dxx = 0.25 * (v(0, 2) - 2 * v(0, 0) + v(0, -2))
    dxy = 0.25 * (v(1, 1) - v(-1, 1) - v(1, -1) + v(-1, -1))
    dyy = 0.25 * (v(2, 0) - 2 * v(0, 0) + v(-2, 0))

    det = dxx * dyy - dxy * dxy
    solvable = valid & (det != 0)
    # Hessian pinv @ gradient == inv for nonsingular 2x2
    inv_det = np.where(det != 0, 1.0 / np.where(det == 0, 1.0, det), 0.0)
    off_x = -(dyy * dx - dxy * dy) * inv_det
    off_y = -(-dxy * dx + dxx * dy) * inv_det
    keypoints[..., 0] += np.where(solvable, off_x, 0.0)
    keypoints[..., 1] += np.where(solvable, off_y, 0.0)
    return keypoints


def refine_keypoints_dark_udp(keypoints: np.ndarray, heatmaps: np.ndarray, blur_kernel_size: int) -> np.ndarray:
    """DARK-UDP refinement on edge-padded, clipped log heatmaps.

    Matches reference refinement.py:102-159: blur -> clip[1e-3, 50] -> log ->
    edge-pad by 1 -> per-keypoint gradient/Hessian from 7 taps -> pinv step.
    """
    keypoints = keypoints.copy()
    N, K = keypoints.shape[:2]
    H, W = heatmaps.shape[1:]

    hm = gaussian_blur(heatmaps.copy(), blur_kernel_size)
    np.clip(hm, 1e-3, 50.0, hm)
    np.log(hm, hm)
    pad = np.pad(hm, ((0, 0), (1, 1), (1, 1)), mode="edge")

    Wp = W + 2
    x = (keypoints[..., 0] + 1).astype(int)  # (N, K) in padded coords
    y = (keypoints[..., 1] + 1).astype(int)
    k_idx = np.broadcast_to(np.arange(K), (N, K))

    flat = pad.reshape(K, -1)
    base = y * Wp + x

    def tap(offset):
        return flat[k_idx, base + offset]

    i_ = tap(0)
    ix1 = tap(1)
    iy1 = tap(Wp)
    ix1y1 = tap(Wp + 1)
    ix1_y1_ = tap(-Wp - 1)
    ix1_ = tap(-1)
    iy1_ = tap(-Wp)

    dx = 0.5 * (ix1 - ix1_)
    dy = 0.5 * (iy1 - iy1_)
    dxx = ix1 - 2 * i_ + ix1_
    dyy = iy1 - 2 * i_ + iy1_
    dxy = 0.5 * (ix1y1 - ix1 - iy1 + 2 * i_ - ix1_ - iy1_ + ix1_y1_)

    eps = np.finfo(np.float32).eps
    hessian = np.stack(
        [np.stack([dxx + eps, dxy], axis=-1), np.stack([dxy, dyy + eps], axis=-1)], axis=-2
    )  # (N, K, 2, 2)
    derivative = np.stack([dx, dy], axis=-1)[..., None]  # (N, K, 2, 1)
    hess_inv = np.linalg.pinv(hessian)
    offset = (hess_inv @ derivative)[..., 0]
    keypoints[..., :2] -= offset
    return keypoints


def refine_simcc_dark(keypoints: np.ndarray, simcc: np.ndarray, blur_kernel_size: int) -> np.ndarray:
    """1-D DARK refinement for SimCC vectors (N, K, Wx); keypoints (N, K)."""
    keypoints = keypoints.copy()
    N = simcc.shape[0]

    sc = gaussian_blur1d(simcc.copy(), blur_kernel_size)
    np.clip(sc, 1e-3, 50.0, sc)
    np.log(sc, sc)
    sc = np.pad(sc, ((0, 0), (0, 0), (2, 2)), "edge")

    px = (keypoints + 2.5).astype(np.int64)  # (N, K) in padded coords

    def tap(offset):
        return np.take_along_axis(sc, (px + offset)[..., None], axis=2)[..., 0]

    dx0 = tap(0)
    dx1 = tap(1)
    dx_1 = tap(-1)
    dx2 = tap(2)
    dx_2 = tap(-2)

    dx = 0.5 * (dx1 - dx_1)
    dxx = 1e-9 + 0.25 * (dx2 - 2 * dx0 + dx_2)
    keypoints -= dx / dxx
    return keypoints
