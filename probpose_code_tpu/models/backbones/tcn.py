"""Temporal Convolutional Network backbone for 2D->3D lifting (flax).

Parity target: reference ``mmpose/models/backbones/tcn.py`` (VideoPose3D
TCN): 1D conv stem over the (K*2, T) sequence, residual blocks with
dilated (or strided) temporal convs, BN + ReLU + dropout.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from probpose_code_tpu.registry import MODELS


@MODELS.register_module()
class TCN(nn.Module):
    in_channels: int = 34  # K * 2
    stem_channels: int = 1024
    num_blocks: int = 2
    kernel_sizes: Sequence[int] = (3, 3, 3)
    dropout: float = 0.25
    use_stride_conv: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Tuple[jnp.ndarray, ...]:
        """x: (B, C_in, T) -> tuple of (B, stem_channels, T') features."""
        # flax Conv expects channel-last: (B, T, C)
        x = jnp.transpose(x.astype(self.dtype), (0, 2, 1))

        k0 = self.kernel_sizes[0]
        stride0 = k0 if self.use_stride_conv else 1
        x = nn.Conv(self.stem_channels, (k0,), strides=(stride0,), padding="VALID",
                    use_bias=False, dtype=self.dtype, name="stem_conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, name="stem_bn")(x)
        x = nn.relu(x)
        if self.dropout > 0:
            x = nn.Dropout(self.dropout, deterministic=not train)(x)

        dilation = k0
        for i, k in enumerate(self.kernel_sizes[1:]):
            res = x
            if self.use_stride_conv:
                conv1 = nn.Conv(self.stem_channels, (k,), strides=(k,), padding="VALID",
                                use_bias=False, dtype=self.dtype, name=f"block{i}_conv1")
                pad = 0
            else:
                conv1 = nn.Conv(self.stem_channels, (k,), kernel_dilation=(dilation,), padding="VALID",
                                use_bias=False, dtype=self.dtype, name=f"block{i}_conv1")
            h = conv1(x)
            h = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, name=f"block{i}_bn1")(h)
            h = nn.relu(h)
            if self.dropout > 0:
                h = nn.Dropout(self.dropout, deterministic=not train)(h)
            h = nn.Conv(self.stem_channels, (1,), use_bias=False, dtype=self.dtype, name=f"block{i}_conv2")(h)
            h = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, name=f"block{i}_bn2")(h)
            h = nn.relu(h)
            if self.dropout > 0:
                h = nn.Dropout(self.dropout, deterministic=not train)(h)
            # crop the residual to the (shorter) conv output length
            trim = (res.shape[1] - h.shape[1])
            if trim > 0:
                res = res[:, trim // 2: res.shape[1] - (trim - trim // 2)]
            x = res + h
            dilation *= k

        return (jnp.transpose(x.astype(jnp.float32), (0, 2, 1)),)
