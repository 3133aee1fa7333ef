"""Deformable 2-D convolution (DCN v1) as XLA-friendly gathers + matmuls.

Equivalent of ``mmcv.ops.DeformConv2d`` (used by the reference
``mmpose/models/necks/posewarper_neck.py:15``) for stride-1, same-size
output: each 3x3 tap's sampling point is displaced by a learned per-pixel
offset, the displaced points are bilinearly sampled (zero outside the
feature map), and the K*K sampled planes contract with the conv weight.

TPU-native design: instead of mmcv's im2col CUDA kernel, each tap is one
batched bilinear gather (4 corner ``take_along_axis`` reads) followed by a
(C -> Cout) matmul on the MXU — K*K = 9 gathers + 9 matmuls, all fused by
XLA into one program; no dynamic shapes.

Offset layout matches mmcv: channels ordered (deform_group, kh, kw, (dy, dx)),
i.e. ``offsets[..., 2*(g*K*K + kh*K + kw)]`` is the y-displacement of tap
(kh, kw) for channel-group g.
"""

from __future__ import annotations

import jax.numpy as jnp


def _bilinear_gather_grouped(x: jnp.ndarray, py: jnp.ndarray, px: jnp.ndarray) -> jnp.ndarray:
    """Sample x (B, H, W, G, Cg) at real-valued (py, px) (B, H, W, G) with
    zero padding outside; returns (B, H, W, G, Cg)."""
    B, H, W, G, Cg = x.shape
    xf = x.reshape(B, H * W, G, Cg)
    y0 = jnp.floor(py)
    x0 = jnp.floor(px)
    wy = py - y0
    wx = px - x0
    out = jnp.zeros_like(x)
    for dy, dx, w in (
        (0.0, 0.0, (1 - wy) * (1 - wx)),
        (0.0, 1.0, (1 - wy) * wx),
        (1.0, 0.0, wy * (1 - wx)),
        (1.0, 1.0, wy * wx),
    ):
        yy = y0 + dy
        xx = x0 + dx
        valid = (yy >= 0) & (yy <= H - 1) & (xx >= 0) & (xx <= W - 1)
        yc = jnp.clip(yy, 0, H - 1).astype(jnp.int32)
        xc = jnp.clip(xx, 0, W - 1).astype(jnp.int32)
        idx = (yc * W + xc).reshape(B, H * W, G)
        g = jnp.take_along_axis(xf, idx[..., None], axis=1).reshape(B, H, W, G, Cg)
        out = out + g * (w * valid.astype(x.dtype))[..., None]
    return out


def deform_conv2d(
    x: jnp.ndarray,
    offsets: jnp.ndarray,
    weight: jnp.ndarray,
    dilation: int = 1,
    deform_groups: int = 1,
) -> jnp.ndarray:
    """DCN v1 forward, stride 1, padding = dilation * (K // 2) (same size).

    Args:
        x: (B, H, W, C) input features.
        offsets: (B, H, W, 2 * deform_groups * K * K), mmcv channel order.
        weight: (K, K, C, Cout) conv kernel (HWIO; conv groups = 1, no bias
            — mmcv DeformConv2d has no bias).
        dilation: tap spacing; matches the reference's per-dilation layers.
        deform_groups: channel groups sharing one offset field each.

    Returns:
        (B, H, W, Cout)
    """
    B, H, W, C = x.shape
    K = weight.shape[0]
    G = deform_groups
    assert C % G == 0, (C, G)
    offs = offsets.astype(jnp.float32).reshape(B, H, W, G, K * K, 2)
    xg = x.reshape(B, H, W, G, C // G)
    gy, gx = jnp.meshgrid(
        jnp.arange(H, dtype=jnp.float32), jnp.arange(W, dtype=jnp.float32), indexing="ij"
    )
    out = jnp.zeros((B, H, W, weight.shape[-1]), x.dtype)
    half = K // 2
    for k in range(K * K):
        kh, kw = divmod(k, K)
        py = gy[None, :, :, None] + dilation * (kh - half) + offs[..., k, 0]
        px = gx[None, :, :, None] + dilation * (kw - half) + offs[..., k, 1]
        sampled = _bilinear_gather_grouped(xg, py, px).reshape(B, H, W, C)
        out = out + jnp.einsum("bhwc,co->bhwo", sampled, weight[kh, kw])
    return out
