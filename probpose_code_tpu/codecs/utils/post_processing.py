"""Host-side heatmap post-processing (NumPy reference path).

Parity targets in reference ``mmpose/codecs/utils/post_processing.py``:
get_heatmap_maximum:178, get_simcc_maximum:71, gaussian_blur:220,
gaussian_blur1d:252, get_heatmap_expected_value:308 and the sub-pixel Taylor
step _get_subpixel_maximums:384.

The device (XLA/Pallas) equivalents live in ``probpose_code_tpu.ops.decode``;
these NumPy versions are the semantic ground truth the device kernels are
tested against, and they serve the host decode path of the codecs.

OpenCV is not a dependency: ``cv2.GaussianBlur(ksize, sigma=0)`` is replaced
by an explicit separable kernel using OpenCV's sigma formula
``0.3*((ksize-1)*0.5 - 1) + 0.8``; the reference blurs a zero-padded copy so
border handling reduces to zero padding.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
from scipy.ndimage import convolve as _nd_convolve

from .oks_map import build_oks_kernels


def gaussian_kernel1d(ksize: int, sigma: float = 0.0) -> np.ndarray:
    """OpenCV-compatible 1-D gaussian kernel (sigma<=0 -> derived from size)."""
    assert ksize % 2 == 1
    if sigma <= 0:
        sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    x = np.arange(ksize, dtype=np.float64) - (ksize - 1) * 0.5
    k = np.exp(-(x * x) / (2.0 * sigma * sigma))
    return (k / k.sum()).astype(np.float64)


def _blur2d_zeropad(img: np.ndarray, kernel1d: np.ndarray) -> np.ndarray:
    """Separable 2-D correlation with zero padding (float32 in/out)."""
    r = (len(kernel1d) - 1) // 2
    H, W = img.shape
    pad = np.zeros((H + 2 * r, W + 2 * r), dtype=np.float64)
    pad[r:r + H, r:r + W] = img
    # rows
    tmp = np.zeros((H, W + 2 * r), dtype=np.float64)
    for i, kv in enumerate(kernel1d):
        tmp += kv * pad[i:i + H, :]
    out = np.zeros((H, W), dtype=np.float64)
    for j, kv in enumerate(kernel1d):
        out += kv * tmp[:, j:j + W]
    return out.astype(np.float32)


def gaussian_blur(heatmaps: np.ndarray, kernel: int = 11) -> np.ndarray:
    """DARK modulation blur: per-channel blur then rescale to original max.

    In-place on ``heatmaps`` (K, H, W), like the reference.
    """
    assert kernel % 2 == 1
    k1d = gaussian_kernel1d(kernel)
    K = heatmaps.shape[0]
    for k in range(K):
        origin_max = np.max(heatmaps[k])
        blurred = _blur2d_zeropad(heatmaps[k], k1d)
        heatmaps[k] = blurred * (origin_max / (np.max(blurred) + 1e-12))
    return heatmaps


def gaussian_blur1d(simcc: np.ndarray, kernel: int = 11) -> np.ndarray:
    """1-D SimCC modulation blur, in-place on (N, K, Wx)."""
    assert kernel % 2 == 1
    k1d = gaussian_kernel1d(kernel)
    r = (kernel - 1) // 2
    N, K, Wx = simcc.shape
    for n in range(N):
        for k in range(K):
            origin_max = np.max(simcc[n, k])
            pad = np.zeros(Wx + 2 * r, dtype=np.float64)
            pad[r:r + Wx] = simcc[n, k]
            blurred = np.convolve(pad, k1d[::-1], mode="same")[r:r + Wx]
            simcc[n, k] = (blurred * (origin_max / max(np.max(blurred), 1e-30))).astype(simcc.dtype)
    return simcc


def get_heatmap_maximum(heatmaps: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Argmax locations (x, y) and values; locations are -1 where val <= 0."""
    assert heatmaps.ndim in (3, 4), f"Invalid shape {heatmaps.shape}"
    if heatmaps.ndim == 3:
        K, H, W = heatmaps.shape
        B = None
        flat = heatmaps.reshape(K, -1)
    else:
        B, K, H, W = heatmaps.shape
        flat = heatmaps.reshape(B * K, -1)

    y_locs, x_locs = np.unravel_index(np.argmax(flat, axis=1), shape=(H, W))
    locs = np.stack((x_locs, y_locs), axis=-1).astype(np.float32)
    vals = np.amax(flat, axis=1)
    locs[vals <= 0.0] = -1
    if B:
        locs = locs.reshape(B, K, 2)
        vals = vals.reshape(B, K)
    return locs, vals


def get_simcc_maximum(
    simcc_x: np.ndarray, simcc_y: np.ndarray, apply_softmax: bool = False
) -> Tuple[np.ndarray, np.ndarray]:
    """Joint argmax over the x/y SimCC vectors; val = min(max_x, max_y)."""
    assert simcc_x.ndim == simcc_y.ndim and simcc_x.ndim in (2, 3)
    N = None
    if simcc_x.ndim == 3:
        N, K, _ = simcc_x.shape
        simcc_x = simcc_x.reshape(N * K, -1)
        simcc_y = simcc_y.reshape(N * K, -1)

    if apply_softmax:
        def _softmax(v):
            v = v - np.max(v, axis=1, keepdims=True)
            e = np.exp(v)
            return e / np.sum(e, axis=1, keepdims=True)

        simcc_x, simcc_y = _softmax(simcc_x), _softmax(simcc_y)

    x_locs = np.argmax(simcc_x, axis=1)
    y_locs = np.argmax(simcc_y, axis=1)
    locs = np.stack((x_locs, y_locs), axis=-1).astype(np.float32)
    vals = np.minimum(np.amax(simcc_x, axis=1), np.amax(simcc_y, axis=1))
    locs[vals <= 0.0] = -1
    if N:
        locs = locs.reshape(N, K, 2)
        vals = vals.reshape(N, K)
    return locs, vals


def subpixel_refine(heatmaps: np.ndarray, locs: np.ndarray) -> np.ndarray:
    """Second-order 1-D Taylor sub-pixel shift at integer peaks.

    ``heatmaps``: (M, H, W); ``locs``: (M, 2) float (x, y). Peaks on the
    border keep their integer location (reference _get_subpixel_maximums).
    """
    M, H, W = heatmaps.shape
    x = locs[:, 0].astype(np.int32)
    y = locs[:, 1].astype(np.int32)
    valid = (x > 0) & (x < W - 1) & (y > 0) & (y < H - 1)
    out = locs.copy()
    if not valid.any():
        return out
    m = np.nonzero(valid)[0]
    xv, yv = x[m], y[m]
    c = heatmaps[m, yv, xv]
    dx = (heatmaps[m, yv, xv + 1] - heatmaps[m, yv, xv - 1]) / 2.0
    dy = (heatmaps[m, yv + 1, xv] - heatmaps[m, yv - 1, xv]) / 2.0
    dxx = heatmaps[m, yv, xv + 1] + heatmaps[m, yv, xv - 1] - 2 * c
    dyy = heatmaps[m, yv + 1, xv] + heatmaps[m, yv - 1, xv] - 2 * c
    dxx = np.where(dxx != 0, dxx, 1e-6)
    dyy = np.where(dyy != 0, dyy, 1e-6)
    out[m, 0] += -dx / dxx
    out[m, 1] += -dy / dyy
    return out


def get_heatmap_expected_value(
    heatmaps: np.ndarray,
    parzen_size: float = 0.1,
    return_heatmap: bool = False,
    kpt_sigmas: Optional[np.ndarray] = None,
):
    """Expected-OKS decode: convolve with per-keypoint OKS kernels
    (reflect boundary), argmax, sub-pixel Taylor; score is the *raw* heatmap
    value at the rounded integer peak.

    ``heatmaps``: (K, H, W) or (B, K, H, W). Mirrors reference
    ``post_processing.py:308-381`` including its B==1 value-lookup layout.
    """
    assert heatmaps.ndim in (3, 4), f"Invalid shape {heatmaps.shape}"
    squeeze = heatmaps.ndim == 3
    hm = heatmaps[None] if squeeze else heatmaps
    B, K, H, W = hm.shape

    kernels = build_oks_kernels(K, H, W, kpt_sigmas)
    convolved = np.empty_like(hm)
    for k in range(K):
        convolved[:, k] = _nd_convolve(hm[:, k], kernels[k][None], mode="reflect")

    flat = convolved.reshape(B * K, H * W)
    y_locs, x_locs = np.unravel_index(np.argmax(flat, axis=1), shape=(H, W))
    locs = np.stack((x_locs, y_locs), axis=-1).astype(np.float32)
    locs = subpixel_refine(convolved.reshape(B * K, H, W), locs)

    xi = np.clip(np.round(x_locs).astype(int), 0, W - 1)
    yi = np.clip(np.round(y_locs).astype(int), 0, H - 1)
    b_idx = np.repeat(np.arange(B), K)
    k_idx = np.tile(np.arange(K), B)
    vals = hm[b_idx, k_idx, yi, xi]

    if squeeze:
        locs = locs.reshape(K, 2)
        vals = vals.reshape(K)
        convolved = convolved.reshape(K, H, W)
    else:
        locs = locs.reshape(B, K, 2)
        vals = vals.reshape(B, K)

    if return_heatmap:
        return locs, vals, convolved
    return locs, vals
