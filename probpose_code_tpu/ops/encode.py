"""Device-side training-target encoding (expected-OKS / UDP gaussian maps).

The reference generates training heatmaps on the host inside the dataset
pipeline (``mmpose/codecs/utils/oks_map.py:8-69`` per-(instance, keypoint)
NumPy loops under ``GenerateTarget``, ``common_transforms.py:1277``) — one of
the hot loops that starves the accelerator (SURVEY §3.1). Here the encode is
a batched jnp expression fused into the jitted train step: the host ships
only the (B, K, 2) heatmap-space keypoints, and the (B, K, H, W) maps are
built on device as two separable exponential factors and an outer product
(H + W exps instead of H * W per keypoint, and the broadcasted multiply
vectorizes on the VPU).

Numerics match the host encoders bit-for-decision: the same per-keypoint
OKS spread table (``oks_kernel_scales``) feeds both.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from probpose_code_tpu.codecs.utils.oks_map import oks_kernel_scales


def probmap_encode_scales(
    K: int,
    heatmap_size: Tuple[int, int],
    sigma: float = -1.0,
    kpt_sigmas: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Static per-keypoint spread ``s`` for the device encode.

    Mirrors ``generate_probmaps`` (host): ``sigma > 0`` selects a fixed
    spread, otherwise the per-keypoint OKS spread table.
    """
    W, H = heatmap_size
    if sigma is not None and sigma > 0:
        return np.full(K, float(sigma), np.float32)
    return oks_kernel_scales(K, H, W, kpt_sigmas).astype(np.float32)


def generate_probmaps_device(
    kpts_hm: jnp.ndarray,
    visible: jnp.ndarray,
    heatmap_size: Tuple[int, int],
    scales: np.ndarray,
) -> jnp.ndarray:
    """Batched expected-OKS maps on device.

    Args:
        kpts_hm: (B, K, 2) keypoints in heatmap space.
        visible: (B, K) visibility gate (maps for invisible kpts are zero).
        heatmap_size: (W, H).
        scales: (K,) static spread table from :func:`probmap_encode_scales`.

    Returns:
        (B, K, H, W) float32 maps — ``exp(-d^2 / 2s)`` per pixel, zeroed for
        invisible keypoints (host parity: ``oks_map.py:generate_probmaps``).
    """
    W, H = int(heatmap_size[0]), int(heatmap_size[1])
    s2 = jnp.asarray(2.0 * np.asarray(scales, np.float64), jnp.float32)  # (K,)
    xs = jnp.arange(W, dtype=jnp.float32)
    ys = jnp.arange(H, dtype=jnp.float32)
    dx2 = (xs[None, None, :] - kpts_hm[..., 0:1]) ** 2  # (B, K, W)
    dy2 = (ys[None, None, :] - kpts_hm[..., 1:2]) ** 2  # (B, K, H)
    fx = jnp.exp(-dx2 / s2[None, :, None])
    fy = jnp.exp(-dy2 / s2[None, :, None])
    maps = fy[..., :, None] * fx[..., None, :]  # (B, K, H, W)
    return maps * (visible >= 0.5).astype(jnp.float32)[..., None, None]


def generate_udp_gaussian_device(
    kpts_hm: jnp.ndarray,
    visible: jnp.ndarray,
    heatmap_size: Tuple[int, int],
    sigma: float,
) -> jnp.ndarray:
    """Batched UDP gaussian target maps on device.

    Parity with the host ``generate_udp_gaussian_heatmaps`` (reference
    ``codecs/utils/gaussian_heatmap.py:256``): a unit-peak gaussian at the
    exact sub-pixel keypoint, truncated to the ``3*sigma`` window around the
    *rounded* center (the window mask is separable, like the gaussian).
    Keypoints whose window misses the map get weight 0 host-side — this op
    only emits the maps.
    """
    W, H = int(heatmap_size[0]), int(heatmap_size[1])
    radius = float(sigma) * 3.0
    s2 = jnp.float32(2.0 * float(sigma) ** 2)
    xs = jnp.arange(W, dtype=jnp.float32)
    ys = jnp.arange(H, dtype=jnp.float32)
    # rounded center: trunc(kpt + 0.5), matching the host _rounded_center
    mu = jnp.trunc(kpts_hm + 0.5)
    # int64 casts in the host encode truncate toward zero
    lt = jnp.trunc(mu - radius)  # window [mu - R, mu + R + 1)
    rb = jnp.trunc(mu + radius + 1.0)
    dx2 = (xs[None, None, :] - kpts_hm[..., 0:1]) ** 2
    dy2 = (ys[None, None, :] - kpts_hm[..., 1:2]) ** 2
    wx = (xs[None, None, :] >= lt[..., 0:1]) & (xs[None, None, :] < rb[..., 0:1])
    wy = (ys[None, None, :] >= lt[..., 1:2]) & (ys[None, None, :] < rb[..., 1:2])
    fx = jnp.exp(-dx2 / s2) * wx
    fy = jnp.exp(-dy2 / s2) * wy
    maps = fy[..., :, None] * fx[..., None, :]
    return maps * (visible >= 0.5).astype(jnp.float32)[..., None, None]
