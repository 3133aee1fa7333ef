"""MobileNetV2 backbone (flax, NHWC).

Parity target: reference ``mmpose/models/backbones/mobilenet_v2.py``:
inverted residual blocks with expand-ratio 6 (1 for the first), ReLU6,
``widen_factor`` channel scaling, out_indices over the 8 stages.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from probpose_code_tpu.registry import MODELS


def _make_divisible(v: float, divisor: int = 8) -> int:
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


def _relu6(x):
    return jnp.minimum(nn.relu(x), 6.0)


class InvertedResidual(nn.Module):
    out_channels: int
    stride: int
    expand_ratio: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        hidden = in_ch * self.expand_ratio
        use_res = self.stride == 1 and in_ch == self.out_channels
        out = x
        if self.expand_ratio != 1:
            out = nn.Conv(hidden, (1, 1), use_bias=False, dtype=self.dtype, name="expand_conv")(out)
            out = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, name="expand_bn")(out)
            out = _relu6(out)
        out = nn.Conv(hidden, (3, 3), strides=(self.stride, self.stride), padding="SAME",
                      feature_group_count=hidden, use_bias=False, dtype=self.dtype, name="depthwise_conv")(out)
        out = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, name="depthwise_bn")(out)
        out = _relu6(out)
        out = nn.Conv(self.out_channels, (1, 1), use_bias=False, dtype=self.dtype, name="project_conv")(out)
        out = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, name="project_bn")(out)
        return x + out if use_res else out


# expand_ratio, channels, num_blocks, stride
ARCH_SETTINGS = [
    [1, 16, 1, 1],
    [6, 24, 2, 2],
    [6, 32, 3, 2],
    [6, 64, 4, 2],
    [6, 96, 3, 1],
    [6, 160, 3, 2],
    [6, 320, 1, 1],
]


@MODELS.register_module()
class MobileNetV2(nn.Module):
    widen_factor: float = 1.0
    out_indices: Sequence[int] = (7,)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Tuple[jnp.ndarray, ...]:
        in_ch = _make_divisible(32 * self.widen_factor)
        x = nn.Conv(in_ch, (3, 3), strides=(2, 2), padding="SAME", use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, name="bn1")(x)
        x = _relu6(x)

        outs = []
        if 0 in self.out_indices:
            outs.append(x.astype(jnp.float32))
        for i, (expand, ch, n, stride) in enumerate(ARCH_SETTINGS):
            out_ch = _make_divisible(ch * self.widen_factor)
            for b in range(n):
                x = InvertedResidual(out_ch, stride if b == 0 else 1, expand,
                                     dtype=self.dtype, name=f"layer{i + 1}_block{b}")(x, train=train)
            if i + 1 in self.out_indices:
                outs.append(x.astype(jnp.float32))
        if 8 in self.out_indices:
            ch_last = _make_divisible(1280 * max(self.widen_factor, 1.0))
            x = nn.Conv(ch_last, (1, 1), use_bias=False, dtype=self.dtype, name="conv2")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, name="bn2")(x)
            x = _relu6(x)
            outs.append(x.astype(jnp.float32))
        return tuple(outs)
