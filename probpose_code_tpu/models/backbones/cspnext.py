"""CSPNeXt backbone (flax, NHWC) — RTMPose / RTMO / RTMDet family.

Parity target: reference ``mmpose/models/backbones/cspnext.py`` +
``models/utils/csp_layer.py``: stem of three 3x3 convs (first s2), four P5
stages of [strided conv, (SPP), CSP layer]; CSPNeXt blocks are 3x3 conv +
5x5 depthwise-separable conv with residual; channel attention per stage
(global-pool -> 1x1 conv -> hardsigmoid). BN momentum 0.03 eps 1e-3, SiLU.
``deepen_factor`` / ``widen_factor`` select -t/-s/-m/-l variants.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from probpose_code_tpu.registry import MODELS


def _bn(train: bool, name: str):
    # torch BN(momentum=0.03) keeps 0.97 of the running stats per step
    return nn.BatchNorm(use_running_average=not train, momentum=0.97, epsilon=1e-3, name=name)


class ConvModule(nn.Module):
    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    groups: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # torch pads k//2 on BOTH sides; XLA SAME pads (0,1) for stride-2 on
        # even inputs — a one-pixel shift that breaks converted torch weights
        pad = self.kernel_size // 2
        x = nn.Conv(
            self.out_channels,
            (self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=((pad, pad), (pad, pad)),
            feature_group_count=self.groups,
            use_bias=False,
            dtype=self.dtype,
            name="conv",
        )(x)
        x = _bn(train, "bn")(x)
        return nn.silu(x)


class DepthwiseSeparableConv(nn.Module):
    out_channels: int
    kernel_size: int = 5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        x = ConvModule(in_ch, self.kernel_size, groups=in_ch, dtype=self.dtype, name="depthwise")(x, train=train)
        x = ConvModule(self.out_channels, 1, dtype=self.dtype, name="pointwise")(x, train=train)
        return x


class ChannelAttention(nn.Module):
    channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        w = jnp.mean(x, axis=(1, 2), keepdims=True)
        w = nn.Conv(self.channels, (1, 1), use_bias=True, dtype=self.dtype, name="fc")(w)
        w = jax.nn.hard_sigmoid(w)
        return x * w


class CSPNeXtBlock(nn.Module):
    out_channels: int
    expansion: float = 0.5
    add_identity: bool = True
    kernel_size: int = 5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = int(self.out_channels * self.expansion)
        out = ConvModule(hidden, 3, dtype=self.dtype, name="conv1")(x, train=train)
        out = DepthwiseSeparableConv(self.out_channels, self.kernel_size, dtype=self.dtype, name="conv2")(
            out, train=train
        )
        if self.add_identity and x.shape[-1] == self.out_channels:
            out = out + x
        return out


class SPPBottleneck(nn.Module):
    out_channels: int
    kernel_sizes: Sequence[int] = (5, 9, 13)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid = x.shape[-1] // 2
        x = ConvModule(mid, 1, dtype=self.dtype, name="conv1")(x, train=train)
        pools = [x]
        for k in self.kernel_sizes:
            pools.append(
                nn.max_pool(x, window_shape=(k, k), strides=(1, 1), padding=((k // 2, k // 2), (k // 2, k // 2)))
            )
        x = jnp.concatenate(pools, axis=-1)
        return ConvModule(self.out_channels, 1, dtype=self.dtype, name="conv2")(x, train=train)


class CSPLayer(nn.Module):
    out_channels: int
    expand_ratio: float = 0.5
    num_blocks: int = 1
    add_identity: bool = True
    channel_attention: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid = int(self.out_channels * self.expand_ratio)
        x_short = ConvModule(mid, 1, dtype=self.dtype, name="short_conv")(x, train=train)
        x_main = ConvModule(mid, 1, dtype=self.dtype, name="main_conv")(x, train=train)
        for i in range(self.num_blocks):
            x_main = CSPNeXtBlock(
                mid, expansion=1.0, add_identity=self.add_identity, dtype=self.dtype, name=f"block{i}"
            )(x_main, train=train)
        x_final = jnp.concatenate([x_main, x_short], axis=-1)
        if self.channel_attention:
            x_final = ChannelAttention(2 * mid, dtype=self.dtype, name="attention")(x_final)
        return ConvModule(self.out_channels, 1, dtype=self.dtype, name="final_conv")(x_final, train=train)


ARCH_SETTINGS = {
    # in_channels, out_channels, num_blocks, add_identity, use_spp
    "P5": [
        [64, 128, 3, True, False],
        [128, 256, 6, True, False],
        [256, 512, 6, True, False],
        [512, 1024, 3, False, True],
    ],
    "P6": [
        [64, 128, 3, True, False],
        [128, 256, 6, True, False],
        [256, 512, 6, True, False],
        [512, 768, 3, True, False],
        [768, 1024, 3, False, True],
    ],
}


@MODELS.register_module()
class CSPNeXt(nn.Module):
    arch: str = "P5"
    deepen_factor: float = 1.0
    widen_factor: float = 1.0
    out_indices: Sequence[int] = (4,)
    expand_ratio: float = 0.5
    spp_kernel_sizes: Sequence[int] = (5, 9, 13)
    channel_attention: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Tuple[jnp.ndarray, ...]:
        arch_setting = ARCH_SETTINGS[self.arch]
        stem_ch = int(arch_setting[0][0] * self.widen_factor // 2)
        x = ConvModule(stem_ch, 3, stride=2, dtype=self.dtype, name="stem0")(x, train=train)
        x = ConvModule(stem_ch, 3, dtype=self.dtype, name="stem1")(x, train=train)
        x = ConvModule(stem_ch * 2, 3, dtype=self.dtype, name="stem2")(x, train=train)

        outs = []
        if 0 in self.out_indices:
            outs.append(x.astype(jnp.float32))
        for i, (in_ch, out_ch, num_blocks, add_identity, use_spp) in enumerate(arch_setting):
            out_ch = int(out_ch * self.widen_factor)
            num_blocks = max(round(num_blocks * self.deepen_factor), 1)
            x = ConvModule(out_ch, 3, stride=2, dtype=self.dtype, name=f"stage{i + 1}_conv")(x, train=train)
            if use_spp:
                x = SPPBottleneck(out_ch, self.spp_kernel_sizes, dtype=self.dtype, name=f"stage{i + 1}_spp")(
                    x, train=train
                )
            x = CSPLayer(
                out_ch,
                expand_ratio=self.expand_ratio,
                num_blocks=num_blocks,
                add_identity=add_identity,
                channel_attention=self.channel_attention,
                dtype=self.dtype,
                name=f"stage{i + 1}_csp",
            )(x, train=train)
            if i + 1 in self.out_indices:
                outs.append(x.astype(jnp.float32))
        return tuple(outs)
