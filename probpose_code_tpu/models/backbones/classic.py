"""Classic CNN backbones: ShuffleNetV1/V2, MobileNetV3, VGG, AlexNet,
SEResNet, SCNet, RegNet.

Behavioral parity targets (reference ``mmpose/models/backbones/``):
shufflenet_v1.py (grouped 1x1 + channel shuffle), shufflenet_v2.py
(split/shuffle units), mobilenet_v3.py:46-192 (arch tables small/big),
vgg.py:86 (plain conv stacks), alexnet.py, seresnet.py (SE bottleneck),
scnet.py:15-216 (self-calibrated conv), regnet.py:80-292 (quantized
width ramp). NHWC flax; channel shuffle is a reshape/transpose pair that
XLA folds into the adjacent convolutions.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from probpose_code_tpu.registry import MODELS
from .resnet import ResBottleneck, _bn
from .multistage import ConvBNReLU


def make_divisible(v, divisor=8, min_value=None):
    if min_value is None:
        min_value = divisor
    new_v = max(min_value, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


def channel_shuffle(x: jnp.ndarray, groups: int) -> jnp.ndarray:
    b, h, w, c = x.shape
    x = x.reshape(b, h, w, groups, c // groups)
    return jnp.swapaxes(x, -1, -2).reshape(b, h, w, c)


# ---------------------------------------------------------------- ShuffleNet


class ShuffleUnitV1(nn.Module):
    out_channels: int
    groups: int = 3
    first_block: bool = False  # first block uses ungrouped 1x1
    combine: str = "add"  # 'add' | 'concat'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid = self.out_channels // 4
        out_c = self.out_channels - x.shape[-1] if self.combine == "concat" else self.out_channels
        g1 = 1 if self.first_block else self.groups
        y = nn.Conv(mid, (1, 1), feature_group_count=g1, use_bias=False, dtype=self.dtype, name="g_conv1")(x)
        y = _bn(train, "bn1")(y)
        y = nn.relu(y)
        y = channel_shuffle(y, self.groups)
        stride = 2 if self.combine == "concat" else 1
        y = nn.Conv(mid, (3, 3), strides=(stride, stride), padding="SAME", feature_group_count=mid,
                    use_bias=False, dtype=self.dtype, name="dw_conv")(y)
        y = _bn(train, "bn2")(y)
        y = nn.Conv(out_c, (1, 1), feature_group_count=self.groups, use_bias=False, dtype=self.dtype,
                    name="g_conv2")(y)
        y = _bn(train, "bn3")(y)
        if self.combine == "concat":
            short = nn.avg_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
            return nn.relu(jnp.concatenate([short, y], axis=-1))
        return nn.relu(x + y)


@MODELS.register_module()
class ShuffleNetV1(nn.Module):
    """reference ``shufflenet_v1.py:150-337``."""

    groups: int = 3
    widen_factor: float = 1.0
    out_indices: Sequence[int] = (2,)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        channels_map = {1: (144, 288, 576), 2: (200, 400, 800), 3: (240, 480, 960),
                        4: (272, 544, 1088), 8: (384, 768, 1536)}
        channels = [make_divisible(c * self.widen_factor, 8) for c in channels_map[self.groups]]
        x = ConvBNReLU(int(24 * self.widen_factor), 3, stride=2, dtype=self.dtype, name="conv1")(x, train=train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        outs = []
        for i, n_blocks in enumerate([4, 8, 4]):
            for b in range(n_blocks):
                x = ShuffleUnitV1(
                    channels[i], self.groups, first_block=(i == 0 and b == 0),
                    combine="concat" if b == 0 else "add", dtype=self.dtype, name=f"layer{i}_{b}",
                )(x, train=train)
            if i in self.out_indices:
                outs.append(x.astype(jnp.float32))
        return tuple(outs)


class ShuffleUnitV2(nn.Module):
    out_channels: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        branch_c = self.out_channels // 2
        if self.stride == 1:
            x1, x2 = jnp.split(x, 2, axis=-1)
        else:
            x1 = nn.Conv(x.shape[-1], (3, 3), strides=(2, 2), padding="SAME", feature_group_count=x.shape[-1],
                         use_bias=False, dtype=self.dtype, name="short_dw")(x)
            x1 = _bn(train, "short_bn1")(x1)
            x1 = ConvBNReLU(branch_c, 1, dtype=self.dtype, name="short_pw")(x1, train=train)
            x2 = x
        y = ConvBNReLU(branch_c, 1, dtype=self.dtype, name="pw1")(x2, train=train)
        y = nn.Conv(branch_c, (3, 3), strides=(self.stride, self.stride), padding="SAME",
                    feature_group_count=branch_c, use_bias=False, dtype=self.dtype, name="dw")(y)
        y = _bn(train, "dw_bn")(y)
        y = ConvBNReLU(branch_c, 1, dtype=self.dtype, name="pw2")(y, train=train)
        return channel_shuffle(jnp.concatenate([x1, y], axis=-1), 2)


@MODELS.register_module()
class ShuffleNetV2(nn.Module):
    """reference ``shufflenet_v2.py:138-319``."""

    widen_factor: float = 1.0
    out_indices: Sequence[int] = (3,)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        channels_map = {0.5: (48, 96, 192, 1024), 1.0: (116, 232, 464, 1024),
                        1.5: (176, 352, 704, 1024), 2.0: (244, 488, 976, 2048)}
        channels = channels_map[self.widen_factor]
        x = ConvBNReLU(24, 3, stride=2, dtype=self.dtype, name="conv1")(x, train=train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        outs = []
        for i, n_blocks in enumerate([4, 8, 4]):
            for b in range(n_blocks):
                x = ShuffleUnitV2(channels[i], stride=2 if b == 0 else 1, dtype=self.dtype,
                                  name=f"layer{i}_{b}")(x, train=train)
            if i in self.out_indices:
                outs.append(x.astype(jnp.float32))
        if 3 in self.out_indices:
            x = ConvBNReLU(channels[3], 1, dtype=self.dtype, name="conv_last")(x, train=train)
            outs.append(x.astype(jnp.float32))
        return tuple(outs)


# ---------------------------------------------------------------- MobileNetV3


class SELayer(nn.Module):
    ratio: int = 16
    hsigmoid: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        s = x.mean(axis=(1, 2))
        s = nn.relu(nn.Dense(make_divisible(c // self.ratio, 8), dtype=self.dtype, name="fc1")(s))
        s = nn.Dense(c, dtype=self.dtype, name="fc2")(s)
        s = jnp.clip((s + 3) / 6, 0, 1) if self.hsigmoid else jax.nn.sigmoid(s)
        return x * s[:, None, None, :]


def _hswish(x):
    return x * jnp.clip((x + 3) / 6, 0, 1)


MBV3_ARCH = {
    # kernel, mid_channels, out_channels, with_se, act, stride
    "small": [
        [3, 16, 16, True, "ReLU", 2], [3, 72, 24, False, "ReLU", 2], [3, 88, 24, False, "ReLU", 1],
        [5, 96, 40, True, "HSwish", 2], [5, 240, 40, True, "HSwish", 1], [5, 240, 40, True, "HSwish", 1],
        [5, 120, 48, True, "HSwish", 1], [5, 144, 48, True, "HSwish", 1], [5, 288, 96, True, "HSwish", 2],
        [5, 576, 96, True, "HSwish", 1], [5, 576, 96, True, "HSwish", 1],
    ],
    "big": [
        [3, 16, 16, False, "ReLU", 1], [3, 64, 24, False, "ReLU", 2], [3, 72, 24, False, "ReLU", 1],
        [5, 72, 40, True, "ReLU", 2], [5, 120, 40, True, "ReLU", 1], [5, 120, 40, True, "ReLU", 1],
        [3, 240, 80, False, "HSwish", 2], [3, 200, 80, False, "HSwish", 1], [3, 184, 80, False, "HSwish", 1],
        [3, 184, 80, False, "HSwish", 1], [3, 480, 112, True, "HSwish", 1], [3, 672, 112, True, "HSwish", 1],
        [5, 672, 160, True, "HSwish", 1], [5, 672, 160, True, "HSwish", 2], [5, 960, 160, True, "HSwish", 1],
    ],
}


@MODELS.register_module()
class MobileNetV3(nn.Module):
    """reference ``mobilenet_v3.py:15-192`` (arch tables copied verbatim)."""

    arch: str = "small"
    out_indices: Sequence[int] = (-1,)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        table = MBV3_ARCH[self.arch]
        n = len(table)
        out_idx = tuple(i % n for i in self.out_indices)
        x = nn.Conv(16, (3, 3), strides=(2, 2), padding="SAME", use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = _bn(train, "bn1")(x)
        x = _hswish(x)
        outs = []
        for i, (k, mid, out_c, with_se, act, stride) in enumerate(table):
            act_fn = _hswish if act == "HSwish" else nn.relu
            identity = x
            y = ConvBNReLU(mid, 1, act=False, dtype=self.dtype, name=f"layer{i}_expand")(x, train=train)
            y = act_fn(y)
            y = nn.Conv(mid, (k, k), strides=(stride, stride), padding="SAME", feature_group_count=mid,
                        use_bias=False, dtype=self.dtype, name=f"layer{i}_dw")(y)
            y = _bn(train, f"layer{i}_dw_bn")(y)
            y = act_fn(y)
            if with_se:
                y = SELayer(ratio=4, hsigmoid=True, dtype=self.dtype, name=f"layer{i}_se")(y)
            y = ConvBNReLU(out_c, 1, act=False, dtype=self.dtype, name=f"layer{i}_project")(y, train=train)
            x = y + identity if (stride == 1 and identity.shape[-1] == out_c) else y
            if i in out_idx:
                outs.append(x.astype(jnp.float32))
        return tuple(outs)


# ---------------------------------------------------------------- VGG/AlexNet


@MODELS.register_module()
class VGG(nn.Module):
    """reference ``vgg.py:14-199`` (BN variant)."""

    depth: int = 16
    num_stages: int = 5
    out_indices: Sequence[int] = (4,)
    with_bn: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        arch = {11: (1, 1, 2, 2, 2), 13: (2, 2, 2, 2, 2), 16: (2, 2, 3, 3, 3), 19: (2, 2, 4, 4, 4)}[self.depth]
        outs = []
        for i in range(self.num_stages):
            c = min(64 * 2**i, 512)
            for b in range(arch[i]):
                if self.with_bn:
                    x = ConvBNReLU(c, 3, dtype=self.dtype, name=f"stage{i}_conv{b}")(x, train=train)
                else:
                    x = nn.relu(nn.Conv(c, (3, 3), padding="SAME", dtype=self.dtype, name=f"stage{i}_conv{b}")(x))
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
            if i in self.out_indices:
                outs.append(x.astype(jnp.float32))
        return tuple(outs)


@MODELS.register_module()
class AlexNet(nn.Module):
    """reference ``alexnet.py`` (feature extractor portion)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.relu(nn.Conv(64, (11, 11), strides=(4, 4), padding=((2, 2), (2, 2)), dtype=self.dtype, name="conv1")(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = nn.relu(nn.Conv(192, (5, 5), padding=((2, 2), (2, 2)), dtype=self.dtype, name="conv2")(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = nn.relu(nn.Conv(384, (3, 3), padding="SAME", dtype=self.dtype, name="conv3")(x))
        x = nn.relu(nn.Conv(256, (3, 3), padding="SAME", dtype=self.dtype, name="conv4")(x))
        x = nn.relu(nn.Conv(256, (3, 3), padding="SAME", dtype=self.dtype, name="conv5")(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        return (x.astype(jnp.float32),)


# ---------------------------------------------------------------- SE-ResNet / SCNet


class SEBottleneck(nn.Module):
    """reference ``seresnet.py:9-62``: ResNet bottleneck + SE on the output.
    With ``groups > 1`` this is the SEResNeXt bottleneck (reference
    ``seresnext.py:10-77``: grouped 3x3 conv with the ResNeXt width rule)."""

    channels: int
    stride: int = 1
    se_ratio: int = 16
    groups: int = 1
    width_per_group: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        out_ch = self.channels * 4
        width = self.channels
        if self.groups != 1:
            # reference seresnext.py:50-52 (base_channels=64)
            width = self.groups * self.width_per_group * self.channels // 64
        y = ConvBNReLU(width, 1, dtype=self.dtype, name="conv1")(x, train=train)
        y = ConvBNReLU(width, 3, stride=self.stride, groups=self.groups,
                       dtype=self.dtype, name="conv2")(y, train=train)
        y = ConvBNReLU(out_ch, 1, act=False, dtype=self.dtype, name="conv3")(y, train=train)
        y = SELayer(ratio=self.se_ratio, dtype=self.dtype, name="se")(y)
        if self.stride != 1 or x.shape[-1] != out_ch:
            identity = ConvBNReLU(out_ch, 1, stride=self.stride, act=False, dtype=self.dtype,
                                  name="downsample")(x, train=train)
        return nn.relu(y + identity)


class SCBottleneck(nn.Module):
    """Self-calibrated bottleneck (reference ``scnet.py:73-171``)."""

    channels: int
    stride: int = 1
    pooling_r: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        out_ch = self.channels * 4
        mid = out_ch // 4 // 2
        identity = x
        # branch a: plain 3x3
        a = ConvBNReLU(mid, 1, dtype=self.dtype, name="conv1")(x, train=train)
        a = ConvBNReLU(mid, 3, stride=self.stride, dtype=self.dtype, name="k1")(a, train=train)
        # branch b: SCConv
        b = ConvBNReLU(mid, 1, dtype=self.dtype, name="conv2")(x, train=train)
        pooled = nn.avg_pool(b, (self.pooling_r, self.pooling_r), strides=(self.pooling_r, self.pooling_r))
        k2 = ConvBNReLU(mid, 3, act=False, dtype=self.dtype, name="k2")(pooled, train=train)
        k2 = jax.image.resize(k2, b.shape, "bilinear")
        gate = jax.nn.sigmoid(b + k2)
        k3 = ConvBNReLU(mid, 3, act=False, dtype=self.dtype, name="k3")(b, train=train)
        sc = ConvBNReLU(mid, 3, stride=self.stride, dtype=self.dtype, name="k4")(k3 * gate, train=train)
        y = ConvBNReLU(out_ch, 1, act=False, dtype=self.dtype, name="conv3")(
            jnp.concatenate([a, sc], axis=-1), train=train
        )
        if self.stride != 1 or x.shape[-1] != out_ch:
            identity = ConvBNReLU(out_ch, 1, stride=self.stride, act=False, dtype=self.dtype,
                                  name="downsample")(x, train=train)
        return nn.relu(y + identity)


class _ResNetLike(nn.Module):
    """Shared stem + 4-stage layout for SEResNet/SEResNeXt/SCNet."""

    block: Any = None
    depth: int = 50
    out_indices: Sequence[int] = (3,)
    strides: Sequence[int] = (1, 2, 2, 2)
    dtype: Any = jnp.float32

    def _block_kwargs(self) -> dict:
        return {}

    @nn.compact
    def __call__(self, x, train: bool = False):
        stage_blocks = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3), 152: (3, 8, 36, 3)}[self.depth]
        x = ConvBNReLU(64, 7, stride=2, dtype=self.dtype, name="conv1")(x, train=train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        outs = []
        c = 64
        for i, n_blocks in enumerate(stage_blocks):
            for b in range(n_blocks):
                x = self.block(c, stride=self.strides[i] if b == 0 else 1, dtype=self.dtype,
                               name=f"layer{i + 1}_block{b}", **self._block_kwargs())(x, train=train)
            if i in self.out_indices:
                outs.append(x.astype(jnp.float32))
            c *= 2
        return tuple(outs)


@MODELS.register_module()
class SEResNet(_ResNetLike):
    """reference ``seresnet.py:66-134``."""

    block: Any = SEBottleneck


@MODELS.register_module()
class SEResNeXt(_ResNetLike):
    """reference ``seresnext.py:80-168``: SEResNet with grouped (ResNeXt)
    bottlenecks; default 32x4d."""

    block: Any = SEBottleneck
    groups: int = 32
    width_per_group: int = 4

    def _block_kwargs(self) -> dict:
        return dict(groups=self.groups, width_per_group=self.width_per_group)


@MODELS.register_module()
class SCNet(_ResNetLike):
    """reference ``scnet.py:174-216``."""

    block: Any = SCBottleneck


# ---------------------------------------------------------------- RegNet


REGNET_ARCH = {
    "regnetx_400mf": dict(w0=24, wa=24.48, wm=2.54, group_w=16, depth=22, bot_mul=1.0),
    "regnetx_800mf": dict(w0=56, wa=35.73, wm=2.28, group_w=16, depth=16, bot_mul=1.0),
    "regnetx_1.6gf": dict(w0=80, wa=34.01, wm=2.25, group_w=24, depth=18, bot_mul=1.0),
    "regnetx_3.2gf": dict(w0=88, wa=26.31, wm=2.25, group_w=48, depth=25, bot_mul=1.0),
    "regnetx_4.0gf": dict(w0=96, wa=38.65, wm=2.43, group_w=40, depth=23, bot_mul=1.0),
    "regnetx_6.4gf": dict(w0=184, wa=60.83, wm=2.07, group_w=56, depth=17, bot_mul=1.0),
    "regnetx_8.0gf": dict(w0=80, wa=49.56, wm=2.88, group_w=120, depth=23, bot_mul=1.0),
    "regnetx_12gf": dict(w0=168, wa=73.36, wm=2.37, group_w=112, depth=19, bot_mul=1.0),
}


def generate_regnet(w0, wa, wm, depth, q=8):
    """Quantized linear width ramp (reference ``regnet.py:124-180``)."""
    ws_cont = np.arange(depth) * wa + w0
    ks = np.round(np.log(ws_cont / w0) / np.log(wm))
    widths = w0 * np.power(wm, ks)
    widths = np.round(widths / q) * q
    num_stages = len(np.unique(widths))
    widths = widths.astype(int).tolist()
    return widths, num_stages


@MODELS.register_module()
class RegNet(nn.Module):
    """RegNetX (reference ``regnet.py:14-292``): grouped bottlenecks with
    per-stage widths from the quantized ramp."""

    arch: Any = "regnetx_3.2gf"
    out_indices: Sequence[int] = (3,)
    strides: Sequence[int] = (2, 2, 2, 2)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        arch = REGNET_ARCH[self.arch] if isinstance(self.arch, str) else dict(self.arch)
        widths, _ = generate_regnet(arch["w0"], arch["wa"], arch["wm"], arch["depth"])
        # group per stage
        stage_widths, stage_blocks = [], []
        for w in widths:
            if stage_widths and stage_widths[-1] == w:
                stage_blocks[-1] += 1
            else:
                stage_widths.append(w)
                stage_blocks.append(1)
        group_w, bot_mul = arch["group_w"], arch["bot_mul"]
        x = ConvBNReLU(32, 3, stride=2, dtype=self.dtype, name="conv1")(x, train=train)
        outs = []
        for i, (w, n_blocks) in enumerate(zip(stage_widths, stage_blocks)):
            bw = int(round(w * bot_mul))
            groups = min(bw // group_w, bw) or 1
            bw = int(round(bw / groups) * groups)
            for b in range(n_blocks):
                stride = self.strides[i] if b == 0 else 1
                identity = x
                y = ConvBNReLU(bw, 1, dtype=self.dtype, name=f"s{i}_b{b}_conv1")(x, train=train)
                y = nn.Conv(bw, (3, 3), strides=(stride, stride), padding="SAME", feature_group_count=groups,
                            use_bias=False, dtype=self.dtype, name=f"s{i}_b{b}_conv2")(y)
                y = _bn(train, f"s{i}_b{b}_bn2")(y)
                y = nn.relu(y)
                y = ConvBNReLU(w, 1, act=False, dtype=self.dtype, name=f"s{i}_b{b}_conv3")(y, train=train)
                if stride != 1 or identity.shape[-1] != w:
                    identity = ConvBNReLU(w, 1, stride=stride, act=False, dtype=self.dtype,
                                          name=f"s{i}_b{b}_down")(identity, train=train)
                x = nn.relu(y + identity)
            if i in self.out_indices:
                outs.append(x.astype(jnp.float32))
        return tuple(outs)
