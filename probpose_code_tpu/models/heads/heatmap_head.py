"""Deconvolutional heatmap head (flax, NHWC).

Parity target: reference ``mmpose/models/heads/heatmap_head.py`` (HeatmapHead,
SimpleBaselines): deconv stack (k4 s2 'SAME' + BN + ReLU) -> optional conv
stack -> final 1x1 conv. Internally NHWC; the public output is (B, K, H, W)
to match the framework-wide heatmap contract.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from probpose_code_tpu.registry import MODELS


class DeconvStack(nn.Module):
    """ConvTranspose(k, s=2) + BN + ReLU blocks (NHWC)."""

    out_channels: Sequence[int]
    kernel_sizes: Sequence[int]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        for i, (c, k) in enumerate(zip(self.out_channels, self.kernel_sizes)):
            if k not in (2, 3, 4):
                raise ValueError(f"Unsupported deconv kernel size {k}")
            x = nn.ConvTranspose(
                c, kernel_size=(k, k), strides=(2, 2), padding="SAME", use_bias=False,
                dtype=self.dtype, name=f"deconv{i}",
            )(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, name=f"bn{i}")(x)
            x = nn.relu(x)
        return x


class ConvStack(nn.Module):
    """Conv(k, s=1, same) + BN + ReLU blocks (NHWC)."""

    out_channels: Sequence[int]
    kernel_sizes: Sequence[int]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        for i, (c, k) in enumerate(zip(self.out_channels, self.kernel_sizes)):
            x = nn.Conv(c, kernel_size=(k, k), padding="SAME", dtype=self.dtype, name=f"conv{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, name=f"bn{i}")(x)
            x = nn.relu(x)
        return x


@MODELS.register_module()
class HeatmapHead(nn.Module):
    """SimpleBaselines-style head. ``__call__`` -> heatmaps (B, K, H, W)."""

    in_channels: int
    out_channels: int
    deconv_out_channels: Optional[Sequence[int]] = (256, 256, 256)
    deconv_kernel_sizes: Optional[Sequence[int]] = (4, 4, 4)
    conv_out_channels: Optional[Sequence[int]] = None
    conv_kernel_sizes: Optional[Sequence[int]] = None
    has_final_layer: bool = True
    final_layer_kernel_size: int = 1
    final_layer: Any = None  # reference-style dict(kernel_size=...) or None/False
    # loss configs are resolved by the estimator, not the module
    keypoint_loss: Any = None
    loss: Any = None
    decoder: Any = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = False) -> jnp.ndarray:
        x = feats[-1] if isinstance(feats, (tuple, list)) else feats  # NHWC
        if self.deconv_out_channels:
            x = DeconvStack(self.deconv_out_channels, self.deconv_kernel_sizes, self.dtype, name="deconv_layers")(
                x, train=train
            )
        if self.conv_out_channels:
            x = ConvStack(self.conv_out_channels, self.conv_kernel_sizes, self.dtype, name="conv_layers")(
                x, train=train
            )
        has_final = self.has_final_layer and self.final_layer is not False
        if has_final:
            k = self.final_layer_kernel_size
            if isinstance(self.final_layer, dict):
                k = self.final_layer.get("kernel_size", k)
            x = nn.Conv(self.out_channels, kernel_size=(k, k), padding="SAME", name="final_layer")(x)
        return jnp.transpose(x.astype(jnp.float32), (0, 3, 1, 2))  # (B, K, H, W)
