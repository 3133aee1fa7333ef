"""On-device keypoint decode programs (XLA-jitted, batched).

The reference decodes on the host, per sample, with SciPy/OpenCV loops
(``codecs/utils/post_processing.py:308``, ``refinement.py:102``) — a
GPU->CPU sync on every predict and inside every training step
(``probmap_head.py:474-537``). Here decoding is a pure function over
(B, K, H, W) device arrays that lives inside the jitted model program:

- ``heatmap_expected_value_batch`` — ProbPose expected-OKS decode:
  per-keypoint OKS-kernel depthwise convolution (symmetric/reflect padding),
  argmax, 1-D second-order Taylor sub-pixel shift; score = raw heatmap at the
  integer peak.
- ``dark_udp_refine_batch`` — DARK-UDP refinement (modulation blur -> clip ->
  log -> edge-pad -> closed-form 2x2 Newton step).
- ``argmax_probmap_decode_batch`` — the "fast decoder" (argmax + DARK-UDP),
  used on-device for the training-time OKS/error targets.

Numerical parity with the NumPy ground truth is covered by tests.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from probpose_code_tpu.codecs.utils.oks_map import padded_oks_kernels

from .heatmap import gather_hw, gaussian_blur_batch, heatmap_maximum_batch


@lru_cache(maxsize=8)
def _oks_kernel_bank(K: int, H: int, W: int) -> Tuple[np.ndarray, int]:
    # host-side cache (numpy) — see ops.heatmap._blur_kernels
    return padded_oks_kernels(K, H, W)


@lru_cache(maxsize=8)
def _oks_separable_bank(K: int, H: int, W: int):
    from probpose_code_tpu.codecs.utils.oks_map import separable_oks_operators

    return separable_oks_operators(K, H, W)


def _depthwise_conv(heatmaps: jnp.ndarray, kernels: jnp.ndarray) -> jnp.ndarray:
    """Depthwise VALID conv of (B, K, Hp, Wp) with per-channel (K, D, D)."""
    K = heatmaps.shape[1]
    rhs = kernels[:, None]  # (K, 1, D, D) OIHW with feature groups
    dn = jax.lax.conv_dimension_numbers(heatmaps.shape, rhs.shape, ("NCHW", "OIHW", "NCHW"))
    return jax.lax.conv_general_dilated(
        heatmaps, rhs, (1, 1), "VALID", dimension_numbers=dn, feature_group_count=K
    )


def subpixel_refine_batch(maps: jnp.ndarray, locs: jnp.ndarray) -> jnp.ndarray:
    """Vectorized 1-D Taylor sub-pixel shift at integer peaks.

    ``maps`` (B, K, H, W); ``locs`` (B, K, 2) float xy. Border peaks are
    left untouched (parity with _get_subpixel_maximums).
    """
    B, K, H, W = maps.shape
    x = locs[..., 0].astype(jnp.int32)
    y = locs[..., 1].astype(jnp.int32)
    valid = (x > 0) & (x < W - 1) & (y > 0) & (y < H - 1)
    xc = jnp.clip(x, 1, W - 2)
    yc = jnp.clip(y, 1, H - 2)

    c = gather_hw(maps, xc, yc)
    dx = (gather_hw(maps, xc + 1, yc) - gather_hw(maps, xc - 1, yc)) / 2.0
    dy = (gather_hw(maps, xc, yc + 1) - gather_hw(maps, xc, yc - 1)) / 2.0
    dxx = gather_hw(maps, xc + 1, yc) + gather_hw(maps, xc - 1, yc) - 2 * c
    dyy = gather_hw(maps, xc, yc + 1) + gather_hw(maps, xc, yc - 1) - 2 * c
    dxx = jnp.where(dxx != 0, dxx, 1e-6)
    dyy = jnp.where(dyy != 0, dyy, 1e-6)

    shift = jnp.stack([-dx / dxx, -dy / dyy], axis=-1)
    return jnp.where(valid[..., None], locs + shift, locs)


def heatmap_expected_value_batch(
    heatmaps: jnp.ndarray,
    kernels: Optional[jnp.ndarray] = None,
    radius: Optional[int] = None,
    method: str = "separable",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Expected-OKS decode of (B, K, H, W) -> locs (B, K, 2), vals (B, K).

    Equivalent of reference ``get_heatmap_expected_value`` with
    scipy.ndimage 'reflect' boundary (== jnp.pad mode='symmetric').

    ``method='separable'`` (default) exploits the isotropy of the OKS
    kernels: the 19x19 depthwise convolution factors exactly into two banded
    matmuls that run on the MXU. ``'depthwise'`` keeps the direct conv.
    """
    B, K, H, W = heatmaps.shape
    if method == "separable" and kernels is None:
        Ay, Ax, r = _oks_separable_bank(K, H, W)
        padded = jnp.pad(heatmaps, ((0, 0), (0, 0), (r, r), (r, r)), mode="symmetric")
        # rows: (K, H, H+2R) x (B, K, H+2R, W+2R) -> (B, K, H, W+2R)
        rowed = jnp.einsum("khp,bkpw->bkhw", jnp.asarray(Ay), padded)
        convolved = jnp.einsum("bkhw,kxw->bkhx", rowed, jnp.asarray(Ax))
    else:
        if kernels is None:
            kernels, radius = _oks_kernel_bank(K, H, W)
        r = int(radius)
        padded = jnp.pad(heatmaps, ((0, 0), (0, 0), (r, r), (r, r)), mode="symmetric")
        convolved = _depthwise_conv(padded, kernels)

    flat = convolved.reshape(B, K, H * W)
    idx = jnp.argmax(flat, axis=-1)
    xi = (idx % W).astype(jnp.int32)
    yi = (idx // W).astype(jnp.int32)
    locs = jnp.stack([xi, yi], axis=-1).astype(jnp.float32)
    locs = subpixel_refine_batch(convolved, locs)

    vals = gather_hw(heatmaps, xi, yi)  # score from the *raw* heatmap
    return locs, vals


def dark_udp_refine_batch(
    keypoints: jnp.ndarray, heatmaps: jnp.ndarray, blur_kernel_size: int = 11
) -> jnp.ndarray:
    """DARK-UDP refinement of (B, K, 2) peaks over (B, K, H, W) heatmaps."""
    B, K, H, W = heatmaps.shape
    hm = gaussian_blur_batch(heatmaps, blur_kernel_size)
    hm = jnp.clip(hm, 1e-3, 50.0)
    hm = jnp.log(hm)
    pad = jnp.pad(hm, ((0, 0), (0, 0), (1, 1), (1, 1)), mode="edge")

    x = (keypoints[..., 0] + 1).astype(jnp.int32)
    y = (keypoints[..., 1] + 1).astype(jnp.int32)

    def tap(dx_, dy_):
        return gather_hw(pad, x + dx_, y + dy_)

    i_ = tap(0, 0)
    ix1 = tap(1, 0)
    iy1 = tap(0, 1)
    ix1y1 = tap(1, 1)
    ix1_y1_ = tap(-1, -1)
    ix1_ = tap(-1, 0)
    iy1_ = tap(0, -1)

    dx = 0.5 * (ix1 - ix1_)
    dy = 0.5 * (iy1 - iy1_)
    dxx = ix1 - 2 * i_ + ix1_
    dyy = iy1 - 2 * i_ + iy1_
    dxy = 0.5 * (ix1y1 - ix1 - iy1 + 2 * i_ - ix1_ - iy1_ + ix1_y1_)

    eps = jnp.float32(np.finfo(np.float32).eps)
    a = dxx + eps
    b = dxy
    d = dyy + eps
    # reference uses np.linalg.pinv(hessian + eps*I): singular directions are
    # ZEROED, not inverted — a closed-form inverse explodes on the
    # near-singular hessians of flat (log-clipped) heatmap regions.
    # Symmetric 2x2 pseudo-inverse via eigen-decomposition:
    tr = a + d
    disc = jnp.sqrt(jnp.square(a - d) + 4.0 * jnp.square(b))
    l1 = 0.5 * (tr + disc)
    l2 = 0.5 * (tr - disc)
    # eigvec for l1: [b, l1 - a] (falls back to the x axis when degenerate)
    v1x, v1y = b, l1 - a
    n1 = jnp.sqrt(v1x * v1x + v1y * v1y)
    degen = n1 < 1e-20
    v1x = jnp.where(degen, jnp.where(a >= d, 1.0, 0.0), v1x / jnp.maximum(n1, 1e-30))
    v1y = jnp.where(degen, jnp.where(a >= d, 0.0, 1.0), v1y / jnp.maximum(n1, 1e-30))
    v2x, v2y = -v1y, v1x
    rcond = 1e-15 * jnp.maximum(jnp.abs(l1), jnp.abs(l2))
    il1 = jnp.where(jnp.abs(l1) > rcond, 1.0 / l1, 0.0)
    il2 = jnp.where(jnp.abs(l2) > rcond, 1.0 / l2, 0.0)
    # offset = pinv(H) @ grad
    c1 = v1x * dx + v1y * dy
    c2 = v2x * dx + v2y * dy
    off_x = il1 * c1 * v1x + il2 * c2 * v2x
    off_y = il1 * c1 * v1y + il2 * c2 * v2y
    offset = jnp.stack([off_x, off_y], axis=-1)
    return keypoints - offset


def argmax_probmap_decode_batch(
    heatmaps: jnp.ndarray, blur_kernel_size: int = 11
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fast decode (argmax + DARK-UDP) on device, heatmap-space output.

    Device counterpart of ``ArgMaxProbMap.decode`` *before* the input-space
    rescale — the training loss uses heatmap-space coordinates.
    """
    locs, vals = heatmap_maximum_batch(heatmaps)
    locs = dark_udp_refine_batch(locs, heatmaps, blur_kernel_size)
    return locs, vals


def quarter_offset_refine_batch(keypoints: jnp.ndarray, heatmaps: jnp.ndarray) -> jnp.ndarray:
    """MSRA-style refinement: move 0.25px toward the larger neighbor
    (device version of ``refine_keypoints``)."""
    B, K, H, W = heatmaps.shape
    x = keypoints[..., 0].astype(jnp.int32)
    y = keypoints[..., 1].astype(jnp.int32)
    xc = jnp.clip(x, 0, W - 1)
    yc = jnp.clip(y, 0, H - 1)
    valid_x = (x > 1) & (x < W - 1) & (y > 0) & (y < H)
    valid_y = (y > 1) & (y < H - 1) & (x > 0) & (x < W)
    dx = gather_hw(heatmaps, jnp.clip(x + 1, 0, W - 1), yc) - gather_hw(heatmaps, jnp.clip(x - 1, 0, W - 1), yc)
    dy = gather_hw(heatmaps, xc, jnp.clip(y + 1, 0, H - 1)) - gather_hw(heatmaps, xc, jnp.clip(y - 1, 0, H - 1))
    shift_x = jnp.where(valid_x, jnp.sign(dx) * 0.25, 0.0)
    shift_y = jnp.where(valid_y, jnp.sign(dy) * 0.25, 0.0)
    return keypoints + jnp.stack([shift_x, shift_y], axis=-1)


def dark_refine_batch(keypoints: jnp.ndarray, heatmaps: jnp.ndarray, blur_kernel_size: int = 11) -> jnp.ndarray:
    """DARK refinement (device version of ``refine_keypoints_dark``):
    modulation blur -> log -> full 2x2 Newton step at interior peaks."""
    B, K, H, W = heatmaps.shape
    hm = gaussian_blur_batch(heatmaps, blur_kernel_size)
    hm = jnp.log(jnp.maximum(hm, 1e-10))

    x = keypoints[..., 0].astype(jnp.int32)
    y = keypoints[..., 1].astype(jnp.int32)
    valid = (x > 1) & (x < W - 2) & (y > 1) & (y < H - 2)
    xc = jnp.clip(x, 2, W - 3)
    yc = jnp.clip(y, 2, H - 3)

    def v(dx_, dy_):
        return gather_hw(hm, xc + dx_, yc + dy_)

    dx = 0.5 * (v(1, 0) - v(-1, 0))
    dy = 0.5 * (v(0, 1) - v(0, -1))
    dxx = 0.25 * (v(2, 0) - 2 * v(0, 0) + v(-2, 0))
    dxy = 0.25 * (v(1, 1) - v(-1, 1) - v(1, -1) + v(-1, -1))
    dyy = 0.25 * (v(0, 2) - 2 * v(0, 0) + v(0, -2))
    det = dxx * dyy - dxy * dxy
    solvable = valid & (det != 0)
    inv_det = jnp.where(det != 0, 1.0 / jnp.where(det == 0, 1.0, det), 0.0)
    off_x = -(dyy * dx - dxy * dy) * inv_det
    off_y = -(-dxy * dx + dxx * dy) * inv_det
    shift = jnp.stack([off_x, off_y], axis=-1)
    return keypoints + jnp.where(solvable[..., None], shift, 0.0)


def simcc_maximum_batch(simcc_x: jnp.ndarray, simcc_y: jnp.ndarray):
    """Device SimCC joint argmax: (B, K, Wx), (B, K, Wy) -> locs (B, K, 2)
    float bin coords (-1 where max <= 0), vals = min(max_x, max_y)."""
    x_locs = jnp.argmax(simcc_x, axis=-1).astype(jnp.float32)
    y_locs = jnp.argmax(simcc_y, axis=-1).astype(jnp.float32)
    max_x = jnp.max(simcc_x, axis=-1)
    max_y = jnp.max(simcc_y, axis=-1)
    vals = jnp.minimum(max_x, max_y)
    locs = jnp.stack([x_locs, y_locs], axis=-1)
    locs = jnp.where((vals <= 0.0)[..., None], -1.0, locs)
    return locs, vals


def expected_oks_decode_to_input_space(
    heatmaps: jnp.ndarray, input_size: Tuple[int, int]
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """ProbMap.decode on device: expected-OKS decode scaled to input space
    (reference ``probmap.py:218``: ``kpts / [W-1, H-1] * input_size``)."""
    B, K, H, W = heatmaps.shape
    locs, vals = heatmap_expected_value_batch(heatmaps)
    scale = jnp.asarray([input_size[0] / (W - 1), input_size[1] / (H - 1)], dtype=jnp.float32)
    return locs * scale, vals
