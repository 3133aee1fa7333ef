"""Multi-scale deformable attention (Deformable-DETR style), XLA-native.

Parity target: the reference EDPose's deformable attention
(``mmpose/models/heads/transformer_heads/edpose_head.py:522`` via mmcv's
``MultiScaleDeformableAttention`` CUDA kernel). Each query predicts, per
head and feature level, ``num_points`` fractional sampling locations around
its reference point plus softmax attention weights; the output is the
attention-weighted sum of bilinearly-sampled value vectors.

TPU mapping: the CUDA kernel's scattered reads become four batched XLA
gathers per level (the bilinear corners) over the flattened value grid —
static shapes, fully vectorized over (batch, head, query, point). No
Python loops over queries; the only loop is the (static, small) level loop.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


def bilinear_sample(value: jnp.ndarray, locs: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sampling with zero padding outside the grid.

    value: (B, H, W, C); locs: (B, N, 2) in PIXEL coordinates (align_corners
    False convention: pixel centers at integer coords). Returns (B, N, C).
    """
    B, H, W, C = value.shape
    x = locs[..., 0]
    y = locs[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0

    def tap(xi, yi):
        inb = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        xi_c = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        flat = value.reshape(B, H * W, C)
        idx = yi_c * W + xi_c  # (B, N)
        g = jnp.take_along_axis(flat, idx[..., None], axis=1)
        return g * inb[..., None]

    v00 = tap(x0, y0)
    v01 = tap(x0 + 1, y0)
    v10 = tap(x0, y0 + 1)
    v11 = tap(x0 + 1, y0 + 1)
    top = v00 * (1 - wx)[..., None] + v01 * wx[..., None]
    bot = v10 * (1 - wx)[..., None] + v11 * wx[..., None]
    return top * (1 - wy)[..., None] + bot * wy[..., None]


class MSDeformAttention(nn.Module):
    """Deformable cross-attention over a list of feature maps.

    ``__call__(query, reference_points, values)``:
    - query: (B, Q, C)
    - reference_points: (B, Q, 2) normalized [0, 1] centers, or (B, Q, 4)
      normalized cxcywh boxes (offsets then scale with box size, like
      Deformable-DETR's box-refinement variant)
    - values: sequence of (B, H_l, W_l, C) feature maps
    """

    embed_dims: int = 256
    num_heads: int = 8
    num_points: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, query: jnp.ndarray, reference_points: jnp.ndarray, values: Sequence[jnp.ndarray]) -> jnp.ndarray:
        B, Q, C = query.shape
        h, P, L = self.num_heads, self.num_points, len(values)
        head_dim = C // h

        offsets = nn.Dense(
            h * L * P * 2, name="sampling_offsets",
            kernel_init=nn.initializers.zeros,
            bias_init=_grid_bias_init(h, L, P),
        )(query).reshape(B, Q, h, L, P, 2)
        attn = nn.Dense(h * L * P, name="attention_weights", kernel_init=nn.initializers.zeros)(query)
        attn = jax.nn.softmax(attn.reshape(B, Q, h, L * P), axis=-1).reshape(B, Q, h, L, P)

        ref_xy = reference_points[..., :2]
        ref_wh = reference_points[..., 2:4] if reference_points.shape[-1] == 4 else None

        value_proj = nn.Dense(C, dtype=self.dtype, name="value_proj")
        out = jnp.zeros((B, Q, h, head_dim), self.dtype)
        for lvl, v in enumerate(values):
            H_l, W_l = v.shape[1:3]
            vproj = value_proj(v).reshape(B, H_l, W_l, h, head_dim)
            wh = jnp.asarray([W_l, H_l], jnp.float32)
            off = offsets[:, :, :, lvl]  # (B, Q, h, P, 2)
            if ref_wh is None:
                loc = ref_xy[:, :, None, None, :] + off / wh
            else:
                loc = ref_xy[:, :, None, None, :] + off / P * ref_wh[:, :, None, None, :] * 0.5
            loc_px = loc * wh - 0.5  # align_corners=False pixel coords

            # fold heads into the batch dim for one gather per level
            vb = jnp.transpose(vproj, (0, 3, 1, 2, 4)).reshape(B * h, H_l, W_l, head_dim)
            lb = jnp.transpose(loc_px, (0, 2, 1, 3, 4)).reshape(B * h, Q * P, 2)
            sampled = bilinear_sample(vb, lb).reshape(B, h, Q, P, head_dim)
            sampled = jnp.transpose(sampled, (0, 2, 1, 3, 4))  # (B, Q, h, P, hd)
            out = out + (sampled * attn[:, :, :, lvl, :, None]).sum(axis=3).astype(self.dtype)

        return nn.Dense(C, dtype=self.dtype, name="output_proj")(out.reshape(B, Q, C))


def _grid_bias_init(h: int, L: int, P: int):
    """Deformable-DETR's sampling-offset bias init: heads point at a ring of
    directions, points at increasing radii."""
    import numpy as np

    def init(key, shape, dtype=jnp.float32):
        thetas = np.arange(h) * (2.0 * np.pi / h)
        grid = np.stack([np.cos(thetas), np.sin(thetas)], -1)  # (h, 2)
        grid = grid / np.abs(grid).max(-1, keepdims=True)
        grid = np.tile(grid[:, None, None, :], (1, L, P, 1))
        grid = grid * (np.arange(1, P + 1)[None, None, :, None])
        return jnp.asarray(grid.reshape(-1), dtype)

    return init
