"""CSPDarknet backbone (YOLOX / RTMO).

Behavioral parity with reference ``mmpose/models/backbones/csp_darknet.py``
(Focus stem :14, DarknetBottleneck via mmcv CSPLayer, SPP :69, arch table
:161-178). TPU-native: NHWC flax modules; the Focus space-to-depth is pure
strided slicing that XLA fuses into the first convolution.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from probpose_code_tpu.registry import MODELS
from .cspnext import ConvModule, SPPBottleneck, _bn


class Focus(nn.Module):
    """Width/height → channels stem (reference ``csp_darknet.py:14-62``)."""

    out_channels: int
    kernel_size: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # NHWC: gather the 2x2 pixel phases into channels. Order matches the
        # reference concat (top-left, bottom-left, top-right, bottom-right).
        x = jnp.concatenate(
            [x[:, ::2, ::2], x[:, 1::2, ::2], x[:, ::2, 1::2], x[:, 1::2, 1::2]], axis=-1
        )
        return ConvModule(self.out_channels, self.kernel_size, dtype=self.dtype, name="conv")(x, train=train)


class DarknetBottleneck(nn.Module):
    """1x1 reduce + 3x3 conv with optional residual."""

    out_channels: int
    expansion: float = 0.5
    add_identity: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid = int(self.out_channels * self.expansion)
        out = ConvModule(mid, 1, dtype=self.dtype, name="conv1")(x, train=train)
        out = ConvModule(self.out_channels, 3, dtype=self.dtype, name="conv2")(out, train=train)
        if self.add_identity and x.shape[-1] == self.out_channels:
            out = out + x
        return out


class DarknetCSPLayer(nn.Module):
    """CSP stage with Darknet bottlenecks (no channel attention)."""

    out_channels: int
    num_blocks: int = 1
    add_identity: bool = True
    expand_ratio: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid = int(self.out_channels * self.expand_ratio)
        x_short = ConvModule(mid, 1, dtype=self.dtype, name="short_conv")(x, train=train)
        x_main = ConvModule(mid, 1, dtype=self.dtype, name="main_conv")(x, train=train)
        for i in range(self.num_blocks):
            x_main = DarknetBottleneck(
                mid, expansion=1.0, add_identity=self.add_identity, dtype=self.dtype, name=f"block{i}"
            )(x_main, train=train)
        x = jnp.concatenate([x_main, x_short], axis=-1)
        return ConvModule(self.out_channels, 1, dtype=self.dtype, name="final_conv")(x, train=train)


DARKNET_ARCH = {
    # in_channels, out_channels, num_blocks, add_identity, use_spp
    "P5": [
        [64, 128, 3, True, False],
        [128, 256, 9, True, False],
        [256, 512, 9, True, False],
        [512, 1024, 3, False, True],
    ],
}


@MODELS.register_module()
class CSPDarknet(nn.Module):
    """YOLOX backbone (reference ``csp_darknet.py:110-283``).

    Stem is a Focus module at stride 2; each stage is a stride-2 ConvModule
    followed by a CSP layer (the last stage inserts SPP before the CSP
    layer). Outputs the feature maps at ``out_indices`` (stage numbers,
    stem = 0).
    """

    arch: str = "P5"
    deepen_factor: float = 1.0
    widen_factor: float = 1.0
    out_indices: Tuple[int, ...] = (2, 3, 4)
    spp_kernal_sizes: Sequence[int] = (5, 9, 13)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        setting = DARKNET_ARCH[self.arch]
        outs = []
        x = Focus(int(setting[0][0] * self.widen_factor), kernel_size=3, dtype=self.dtype, name="stem")(
            x, train=train
        )
        if 0 in self.out_indices:
            outs.append(x)
        for i, (in_c, out_c, n_blocks, add_id, use_spp) in enumerate(setting):
            out_c = int(out_c * self.widen_factor)
            n_blocks = max(round(n_blocks * self.deepen_factor), 1)
            x = ConvModule(out_c, 3, stride=2, dtype=self.dtype, name=f"stage{i + 1}_conv")(x, train=train)
            if use_spp:
                x = SPPBottleneck(
                    out_c, kernel_sizes=tuple(self.spp_kernal_sizes), dtype=self.dtype, name=f"stage{i + 1}_spp"
                )(x, train=train)
            x = DarknetCSPLayer(
                out_c, num_blocks=n_blocks, add_identity=add_id, dtype=self.dtype, name=f"stage{i + 1}_csp"
            )(x, train=train)
            if i + 1 in self.out_indices:
                outs.append(x)
        return tuple(outs)
