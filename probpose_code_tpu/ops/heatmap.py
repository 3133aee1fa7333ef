"""Device-side heatmap primitives (jnp / XLA, jit-compatible, batched).

These are the on-device counterparts of ``codecs/utils/post_processing.py``:
- ``gaussian_blur_batch``   — DARK modulation blur (zero-pad separable conv,
  per-channel rescale to the original max)
- ``heatmap_maximum_batch`` — argmax + value (locs -1 where val <= 0)
- ``batch_heatmap_nms``     — max-pool NMS via reduce_window (replaces the
  reference's F.max_pool2d at ``post_processing.py:283``)

All operate on (B, K, H, W) float arrays. Tested for numerical parity with
the NumPy ground-truth implementations.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from probpose_code_tpu.codecs.utils.post_processing import gaussian_kernel1d


@lru_cache(maxsize=16)
def _blur_kernels(ksize: int) -> np.ndarray:
    # cache host-side only: caching jnp arrays would leak tracers when the
    # first call happens under a jit trace
    return gaussian_kernel1d(ksize).astype(np.float32)


def gaussian_blur_batch(heatmaps: jnp.ndarray, kernel_size: int = 11) -> jnp.ndarray:
    """DARK modulation blur on (B, K, H, W): separable zero-padded gaussian,
    then rescale each (b, k) map back to its original max."""
    assert kernel_size % 2 == 1
    B, K, H, W = heatmaps.shape
    k1d = jnp.asarray(_blur_kernels(kernel_size))
    r = (kernel_size - 1) // 2

    x = heatmaps.reshape(B * K, 1, H, W)
    kh = k1d.reshape(1, 1, kernel_size, 1)
    kw = k1d.reshape(1, 1, 1, kernel_size)
    dn = jax.lax.conv_dimension_numbers(x.shape, kh.shape, ("NCHW", "OIHW", "NCHW"))
    x = jax.lax.conv_general_dilated(x, kh, (1, 1), [(r, r), (0, 0)], dimension_numbers=dn)
    x = jax.lax.conv_general_dilated(x, kw, (1, 1), [(0, 0), (r, r)], dimension_numbers=dn)
    blurred = x.reshape(B, K, H, W)

    origin_max = jnp.max(heatmaps, axis=(2, 3), keepdims=True)
    blur_max = jnp.max(blurred, axis=(2, 3), keepdims=True)
    return blurred * (origin_max / (blur_max + 1e-12))


def heatmap_maximum_batch(heatmaps: jnp.ndarray):
    """Argmax decode on (B, K, H, W) -> locs (B, K, 2) xy float, vals (B, K).
    Locations are -1 where the max value is <= 0 (reference semantics)."""
    B, K, H, W = heatmaps.shape
    flat = heatmaps.reshape(B, K, H * W)
    idx = jnp.argmax(flat, axis=-1)
    vals = jnp.max(flat, axis=-1)
    x = (idx % W).astype(jnp.float32)
    y = (idx // W).astype(jnp.float32)
    locs = jnp.stack([x, y], axis=-1)
    locs = jnp.where((vals <= 0.0)[..., None], -1.0, locs)
    return locs, vals


def batch_heatmap_nms(heatmaps: jnp.ndarray, kernel_size: int = 5) -> jnp.ndarray:
    """Keep only local maxima within a kernel_size window (B, K, H, W)."""
    assert kernel_size % 2 == 1
    pad = (kernel_size - 1) // 2
    maximum = jax.lax.reduce_window(
        heatmaps,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, 1, kernel_size, kernel_size),
        window_strides=(1, 1, 1, 1),
        padding=((0, 0), (0, 0), (pad, pad), (pad, pad)),
    )
    return heatmaps * (heatmaps == maximum).astype(heatmaps.dtype)


def gather_hw(maps: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Gather maps[b, k, y[b,k], x[b,k]] from (B, K, H, W) int coords."""
    B, K, H, W = maps.shape
    flat = maps.reshape(B, K, H * W)
    idx = (y * W + x).astype(jnp.int32)
    return jnp.take_along_axis(flat, idx[..., None], axis=-1)[..., 0]
