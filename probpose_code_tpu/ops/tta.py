"""Test-time augmentation flips on device (jnp, jit-compatible).

Parity with reference ``mmpose/models/utils/tta.py`` (flip_heatmaps:9,
flip_vectors:70, flip_coordinates:89) — pure functions over batched arrays,
designed to live inside the jitted predict program.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax.numpy as jnp


def flip_heatmaps(
    heatmaps: jnp.ndarray,
    flip_indices: Optional[List[int]] = None,
    flip_mode: str = "heatmap",
    shift_heatmap: bool = False,
) -> jnp.ndarray:
    """Flip (B, C, H, W) heatmaps back from a horizontally-flipped input.

    ``flip_indices`` must be a static python list (it indexes channels at
    trace time).
    """
    if flip_mode == "heatmap":
        heatmaps = heatmaps[..., ::-1]
        if flip_indices is not None:
            heatmaps = heatmaps[:, jnp.asarray(flip_indices)]
    elif flip_mode == "udp_combined":
        B, C, H, W = heatmaps.shape
        hm = heatmaps.reshape(B, C // 3, 3, H, W)[..., ::-1]
        if flip_indices is not None:
            hm = hm[:, jnp.asarray(flip_indices)]
        hm = hm.at[:, :, 1].multiply(-1.0)
        heatmaps = hm.reshape(B, C, H, W)
    elif flip_mode == "offset":
        B, C, H, W = heatmaps.shape
        hm = heatmaps.reshape(B, C // 2, -1, H, W)[..., ::-1]
        if flip_indices is not None:
            hm = hm[:, jnp.asarray(flip_indices)]
        hm = hm.at[:, :, 0].multiply(-1.0)
        heatmaps = hm.reshape(B, C, H, W)
    else:
        raise ValueError(f'Invalid flip_mode "{flip_mode}"')

    if shift_heatmap:
        heatmaps = heatmaps.at[..., 1:].set(heatmaps[..., :-1])
    return heatmaps


def flip_vectors(
    x_labels: jnp.ndarray, y_labels: jnp.ndarray, flip_indices: List[int]
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Flip SimCC vectors (B, C, Wx)/(B, C, Wy) back."""
    idx = jnp.asarray(flip_indices)
    return x_labels[:, idx, ::-1], y_labels[:, idx]


def flip_coordinates(
    coords: jnp.ndarray, flip_indices: List[int], shift_coords: bool, input_size: Tuple[int, int]
) -> jnp.ndarray:
    """Flip normalized (B, K, D) coordinates back."""
    coords = coords.at[:, :, 0].set(1.0 - coords[:, :, 0])
    if shift_coords:
        coords = coords.at[:, :, 0].add(-1.0 / input_size[0])
    return coords[:, jnp.asarray(flip_indices)]
