"""Multi-stage pose backbones: HourglassNet, CPM, MSPN, RSN.

Behavioral parity targets:
- HourglassNet: reference ``mmpose/models/backbones/hourglass.py:70-176``
  (recursive hourglass of BasicBlocks, stacked with intermediate remaps)
- CPM: reference ``cpm.py:46-177`` (stem + per-stage 11x11 conv blocks on
  concat(prev stage output, middle features))
- MSPN: reference ``mspn.py:38-507`` (ResNetTop + per-stage U-shaped
  down/upsample with cross-stage skip connections)
- RSN: reference ``rsn.py:14-639`` (same skeleton with Residual Steps
  Blocks)

TPU-native: NHWC flax modules; bilinear/nearest resizes via jax.image; the
recursive hourglass is unrolled at trace time (static depth).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from probpose_code_tpu.registry import MODELS
from .resnet import ResBasicBlock, ResBottleneck, _bn


class ConvBNReLU(nn.Module):
    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    act: bool = True
    groups: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.out_channels, (self.kernel_size, self.kernel_size),
                    strides=(self.stride, self.stride), padding="SAME", use_bias=False,
                    feature_group_count=self.groups, dtype=self.dtype, name="conv")(x)
        x = _bn(train, "bn")(x)
        return nn.relu(x) if self.act else x


class _ResLayer(nn.Module):
    """Stack of BasicBlocks, optionally downsampling first or last."""

    channels: int
    num_blocks: int
    stride: int = 1
    downsample_first: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for b in range(self.num_blocks):
            if self.downsample_first:
                s = self.stride if b == 0 else 1
            else:
                s = self.stride if b == self.num_blocks - 1 else 1
            x = ResBasicBlock(self.channels, s, dtype=self.dtype, name=f"block{b}")(x, train=train)
        return x


class HourglassModule(nn.Module):
    """One recursive hourglass (reference ``hourglass.py:13-67``)."""

    depth: int
    stage_channels: Sequence[int]
    stage_blocks: Sequence[int]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        cur_c, next_c = self.stage_channels[0], self.stage_channels[1]
        cur_b, next_b = self.stage_blocks[0], self.stage_blocks[1]
        up1 = _ResLayer(cur_c, cur_b, dtype=self.dtype, name="up1")(x, train=train)
        low1 = _ResLayer(next_c, cur_b, stride=2, dtype=self.dtype, name="low1")(x, train=train)
        if self.depth > 1:
            low2 = HourglassModule(
                self.depth - 1, self.stage_channels[1:], self.stage_blocks[1:], dtype=self.dtype, name="low2"
            )(low1, train=train)
        else:
            low2 = _ResLayer(next_c, next_b, dtype=self.dtype, name="low2")(low1, train=train)
        low3 = _ResLayer(cur_c, cur_b, downsample_first=False, dtype=self.dtype, name="low3")(low2, train=train)
        b, h, w, c = low3.shape
        up2 = jnp.broadcast_to(low3[:, :, None, :, None, :], (b, h, 2, w, 2, c)).reshape(b, 2 * h, 2 * w, c)
        return up1 + up2


@MODELS.register_module()
class HourglassNet(nn.Module):
    """Stacked hourglass (reference ``hourglass.py:70-176``).

    Returns one feature map per stack.
    """

    downsample_times: int = 5
    num_stacks: int = 2
    stage_channels: Sequence[int] = (256, 256, 384, 384, 384, 512)
    stage_blocks: Sequence[int] = (2, 2, 2, 2, 2, 4)
    feat_channel: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        cur_c = self.stage_channels[0]
        x = ConvBNReLU(128, 7, stride=2, dtype=self.dtype, name="stem_conv")(x, train=train)
        inter = _ResLayer(cur_c, 1, stride=2, dtype=self.dtype, name="stem_res")(x, train=train)
        outs = []
        for i in range(self.num_stacks):
            hg = HourglassModule(
                self.downsample_times, self.stage_channels, self.stage_blocks, dtype=self.dtype, name=f"hourglass{i}"
            )(inter, train=train)
            out = ConvBNReLU(self.feat_channel, 3, dtype=self.dtype, name=f"out_conv{i}")(hg, train=train)
            outs.append(out.astype(jnp.float32))
            if i < self.num_stacks - 1:
                a = ConvBNReLU(cur_c, 1, act=False, dtype=self.dtype, name=f"conv1x1_{i}")(inter, train=train)
                b = ConvBNReLU(cur_c, 1, act=False, dtype=self.dtype, name=f"remap{i}")(out, train=train)
                inter = _ResLayer(cur_c, 1, dtype=self.dtype, name=f"inter{i}")(nn.relu(a + b), train=train)
        return outs


class HourglassAEModule(nn.Module):
    """Recursive AE hourglass (reference ``hourglass_ae.py:14-75``): single
    3x3 convs per level (vs residual stacks in the classic hourglass) and a
    nearest-neighbor upsample."""

    depth: int
    stage_channels: Sequence[int]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        cur_c, next_c = self.stage_channels[0], self.stage_channels[1]
        up1 = ConvBNReLU(cur_c, 3, dtype=self.dtype, name="up1")(x, train=train)
        low = nn.max_pool(x, (2, 2), strides=(2, 2))
        low = ConvBNReLU(next_c, 3, dtype=self.dtype, name="low1")(low, train=train)
        if self.depth > 1:
            low = HourglassAEModule(self.depth - 1, self.stage_channels[1:],
                                    dtype=self.dtype, name="low2")(low, train=train)
        else:
            low = ConvBNReLU(next_c, 3, dtype=self.dtype, name="low2")(low, train=train)
        low = ConvBNReLU(cur_c, 3, dtype=self.dtype, name="low3")(low, train=train)
        B, H, W, C = low.shape
        up2 = jax.image.resize(low, (B, H * 2, W * 2, C), "nearest")
        return up1 + up2


@MODELS.register_module()
class HourglassAENet(nn.Module):
    """Hourglass for Associative Embedding (reference
    ``hourglass_ae.py:78-184``): stem to 1/4 resolution, ``num_stacks``
    AE-hourglasses, per-stack 1x1 heads emitting ``out_channels`` maps
    (kpts + AE tags), inter-stack remapping."""

    downsample_times: int = 4
    num_stacks: int = 1
    out_channels: int = 34
    stage_channels: Sequence[int] = (256, 384, 512, 640, 768)
    feat_channels: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert len(self.stage_channels) > self.downsample_times
        x = ConvBNReLU(64, 7, stride=2, dtype=self.dtype, name="stem_conv1")(x, train=train)
        x = ConvBNReLU(128, 3, dtype=self.dtype, name="stem_conv2")(x, train=train)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = ConvBNReLU(128, 3, dtype=self.dtype, name="stem_conv3")(x, train=train)
        inter = ConvBNReLU(self.feat_channels, 3, dtype=self.dtype, name="stem_conv4")(x, train=train)

        outs = []
        for i in range(self.num_stacks):
            hg = HourglassAEModule(self.downsample_times, self.stage_channels,
                                   dtype=self.dtype, name=f"hourglass{i}")(inter, train=train)
            hg = ConvBNReLU(self.feat_channels, 3, dtype=self.dtype, name=f"post_conv{i}a")(hg, train=train)
            hg = ConvBNReLU(self.feat_channels, 3, dtype=self.dtype, name=f"post_conv{i}b")(hg, train=train)
            out = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name=f"out_conv{i}")(hg)
            outs.append(out.astype(jnp.float32))
            if i < self.num_stacks - 1:
                remap_out = ConvBNReLU(self.feat_channels, 1, act=False, dtype=self.dtype,
                                       name=f"remap_out{i}")(out, train=train)
                remap_feat = ConvBNReLU(self.feat_channels, 1, act=False, dtype=self.dtype,
                                        name=f"remap_feat{i}")(hg, train=train)
                inter = inter + remap_out + remap_feat
        return outs


@MODELS.register_module()
class CPM(nn.Module):
    """Convolutional Pose Machines (reference ``cpm.py:46-177``).

    Emits ``num_stages`` per-stage belief maps at 1/8 resolution.
    """

    in_channels: int = 3
    out_channels: int = 17
    feat_channels: int = 128
    middle_channels: int = 32
    num_stages: int = 6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        def pool(z):
            return nn.max_pool(z, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        s = x
        for i, (c, k) in enumerate([(128, 9), (128, 9), (128, 9)]):
            s = pool(ConvBNReLU(c, k, dtype=self.dtype, name=f"stem{i}")(s, train=train))
        s = ConvBNReLU(32, 5, dtype=self.dtype, name="stem3")(s, train=train)
        s = ConvBNReLU(512, 9, dtype=self.dtype, name="stem4")(s, train=train)
        s = ConvBNReLU(512, 1, dtype=self.dtype, name="stem5")(s, train=train)
        stage1 = nn.Conv(self.out_channels, (1, 1), name="stem_out")(s)

        m = x
        for i in range(3):
            m = pool(ConvBNReLU(128, 9, dtype=self.dtype, name=f"middle{i}")(m, train=train))

        outs = [stage1.astype(jnp.float32)]
        for i in range(self.num_stages - 1):
            mid = ConvBNReLU(self.middle_channels, 5, dtype=self.dtype, name=f"middle_conv{i}")(m, train=train)
            f = jnp.concatenate([outs[-1].astype(self.dtype), mid], axis=-1)
            for j in range(3):
                f = ConvBNReLU(self.feat_channels, 11, dtype=self.dtype, name=f"stage{i}_conv{j}")(f, train=train)
            f = ConvBNReLU(self.feat_channels, 1, dtype=self.dtype, name=f"stage{i}_out0")(f, train=train)
            out = nn.Conv(self.out_channels, (1, 1), name=f"stage{i}_out1")(f)
            outs.append(out.astype(jnp.float32))
        return outs


class RSB(nn.Module):
    """Residual Steps Block (reference ``rsn.py:14-133``)."""

    out_channels: int
    num_steps: int = 4
    stride: int = 1
    expand_times: int = 26
    res_top_channels: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_c = x.shape[-1]
        branch_c = in_c * self.expand_times // self.res_top_channels
        identity = x
        y = ConvBNReLU(self.num_steps * branch_c, 1, stride=self.stride, dtype=self.dtype, name="conv1")(
            x, train=train
        )
        spx = jnp.split(y, self.num_steps, axis=-1)
        outputs = []
        outs = []
        for i in range(self.num_steps):
            row = []
            for j in range(i + 1):
                inp = spx[i] if j == 0 else row[j - 1]
                if i > j:
                    inp = inp + outputs[i - 1][j]
                row.append(
                    ConvBNReLU(branch_c, 3, dtype=self.dtype, name=f"conv2_{i + 1}_{j + 1}")(inp, train=train)
                )
            outputs.append(row)
            outs.append(row[i])
        out = ConvBNReLU(self.out_channels, 1, act=False, dtype=self.dtype, name="conv3")(
            jnp.concatenate(outs, axis=-1), train=train
        )
        if self.stride != 1 or in_c != self.out_channels:
            identity = ConvBNReLU(self.out_channels, 1, stride=self.stride, act=False, dtype=self.dtype,
                                  name="downsample")(x, train=train)
        return nn.relu(out + identity)


class _UpsampleUnit(nn.Module):
    """MSPN/RSN upsample unit (reference ``mspn.py:110-212``)."""

    ind: int
    num_units: int
    unit_channels: int
    gen_skip: bool
    gen_cross_conv: bool
    out_channels: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, up_x, train: bool = False):
        out = ConvBNReLU(self.unit_channels, 1, act=False, dtype=self.dtype, name="in_skip")(x, train=train)
        if self.ind > 0:
            up = jax.image.resize(up_x, (up_x.shape[0], x.shape[1], x.shape[2], up_x.shape[3]), "bilinear")
            up = ConvBNReLU(self.unit_channels, 1, act=False, dtype=self.dtype, name="up_conv")(up, train=train)
            out = out + up
        out = nn.relu(out)
        skip1 = skip2 = cross = None
        if self.gen_skip:
            skip1 = ConvBNReLU(x.shape[-1], 1, dtype=self.dtype, name="out_skip1")(x, train=train)
            skip2 = ConvBNReLU(x.shape[-1], 1, dtype=self.dtype, name="out_skip2")(out, train=train)
        if self.ind == self.num_units - 1 and self.gen_cross_conv:
            cross = ConvBNReLU(self.out_channels, 1, dtype=self.dtype, name="cross_conv")(out, train=train)
        return out, skip1, skip2, cross


class _SingleStage(nn.Module):
    """One U-stage: bottleneck/RSB downsampling + upsample units
    (reference ``mspn.py:292-346``)."""

    block: str  # 'bottleneck' | 'rsb'
    has_skip: bool
    gen_skip: bool
    gen_cross_conv: bool
    unit_channels: int
    num_units: int
    num_blocks: Sequence[int]
    num_steps: int = 4
    in_channels: int = 64
    expand_times: int = 26
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, skip1, skip2, train: bool = False):
        downs = []
        for i in range(self.num_units):
            stride = 1 if i == 0 else 2
            out_c = self.in_channels * (2 ** i)
            for b in range(self.num_blocks[i]):
                s = stride if b == 0 else 1
                if self.block == "bottleneck":
                    x = ResBottleneck(out_c, s, dtype=self.dtype, name=f"down{i}_block{b}")(x, train=train)
                else:
                    x = RSB(out_c, num_steps=self.num_steps, stride=s, expand_times=self.expand_times,
                            res_top_channels=self.in_channels, dtype=self.dtype,
                            name=f"down{i}_block{b}")(x, train=train)
            if self.has_skip:
                x = x + skip1[i] + skip2[i]
            downs.append(x)
        downs.reverse()

        outs, s1, s2, cross = [], [], [], None
        for i in range(self.num_units):
            unit = _UpsampleUnit(i, self.num_units, self.unit_channels, self.gen_skip, self.gen_cross_conv,
                                 out_channels=self.in_channels, dtype=self.dtype, name=f"up{i + 1}")
            o, k1, k2, c = unit(downs[i], outs[i - 1] if i > 0 else None, train=train)
            outs.append(o)
            s1.append(k1)
            s2.append(k2)
            if c is not None:
                cross = c
        s1.reverse()
        s2.reverse()
        return outs, s1, s2, cross


class _MultiStageBase(nn.Module):
    """Shared MSPN/RSN skeleton (reference ``mspn.py:403-507``)."""

    block: str = "bottleneck"
    unit_channels: int = 256
    num_stages: int = 4
    num_units: int = 4
    num_blocks: Sequence[int] = (2, 2, 2, 2)
    num_steps: int = 4
    res_top_channels: int = 64
    expand_times: int = 26
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBNReLU(self.res_top_channels, 7, stride=2, dtype=self.dtype, name="top")(x, train=train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        out_feats = []
        skip1 = skip2 = None
        for i in range(self.num_stages):
            stage = _SingleStage(
                block=self.block,
                has_skip=i > 0,
                gen_skip=i != self.num_stages - 1,
                gen_cross_conv=i != self.num_stages - 1,
                unit_channels=self.unit_channels,
                num_units=self.num_units,
                num_blocks=tuple(self.num_blocks),
                num_steps=self.num_steps,
                in_channels=self.res_top_channels,
                expand_times=self.expand_times,
                dtype=self.dtype,
                name=f"stage{i}",
            )
            outs, skip1, skip2, x = stage(x, skip1, skip2, train=train)
            out_feats.append([o.astype(jnp.float32) for o in outs])
        return out_feats


@MODELS.register_module()
class MSPN(_MultiStageBase):
    """Multi-Stage Pose Network (reference ``mspn.py:403``)."""

    block: str = "bottleneck"


@MODELS.register_module()
class RSN(_MultiStageBase):
    """Residual Steps Network (reference ``rsn.py:520``)."""

    block: str = "rsb"
