"""LiteHRNet and ResNeSt backbones.

Behavioral parity targets:
- LiteHRNet: reference ``mmpose/models/backbones/litehrnet.py`` —
  shuffle stem (:217-350), conditional channel weighting blocks with
  cross-resolution weighting (:20-215), multi-branch stages with
  depthwise+pointwise fuse layers (:543-783), IterativeHead (:352-414).
- ResNeSt: reference ``resnest.py:14-337`` — split-attention bottleneck
  (radix softmax over cardinal groups).
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from probpose_code_tpu.registry import MODELS
from .classic import channel_shuffle
from .multistage import ConvBNReLU
from .resnet import _bn


def _resize_nearest(x, h, w):
    return jax.image.resize(x, (x.shape[0], h, w, x.shape[3]), "nearest")


class SpatialWeighting(nn.Module):
    """SE-style gate (reference ``litehrnet.py:20-76``)."""

    ratio: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        s = x.mean(axis=(1, 2))
        s = nn.relu(nn.Dense(max(1, int(c / self.ratio)), dtype=self.dtype, name="fc1")(s))
        s = jax.nn.sigmoid(nn.Dense(c, dtype=self.dtype, name="fc2")(s))
        return x * s[:, None, None, :]


class CrossResolutionWeighting(nn.Module):
    """Reference ``litehrnet.py:78-139``: pool all branches to the smallest
    resolution, joint 1x1 squeeze/excite, redistribute per branch."""

    channels: Sequence[int]
    ratio: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xs: List[jnp.ndarray]):
        mini_h, mini_w = xs[-1].shape[1:3]
        pooled = []
        for s in xs[:-1]:
            f = s.shape[1] // mini_h
            pooled.append(nn.avg_pool(s, (f, f), strides=(f, f)))
        pooled.append(xs[-1])
        out = jnp.concatenate(pooled, axis=-1)
        total = sum(self.channels)
        out = nn.relu(ConvBNReLU(max(1, int(total / self.ratio)), 1, act=False, dtype=self.dtype,
                                 name="conv1")(out, train=False))
        out = jax.nn.sigmoid(ConvBNReLU(total, 1, act=False, dtype=self.dtype, name="conv2")(out, train=False))
        splits = jnp.split(out, list(jnp.cumsum(jnp.asarray(self.channels))[:-1]), axis=-1)
        return [s * _resize_nearest(a, s.shape[1], s.shape[2]) for s, a in zip(xs, splits)]


class ConditionalChannelWeighting(nn.Module):
    """Reference ``litehrnet.py:141-215``: split channels, CCW + depthwise +
    spatial weighting on one half, shuffle-merge."""

    in_channels: Sequence[int]
    reduce_ratio: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xs: List[jnp.ndarray], train: bool = False):
        halves = [c // 2 for c in self.in_channels]
        x1 = [s[..., : c] for s, c in zip(xs, halves)]
        x2 = [s[..., c:] for s, c in zip(xs, halves)]
        x2 = CrossResolutionWeighting(tuple(halves), self.reduce_ratio, dtype=self.dtype, name="crw")(x2)
        out2 = []
        for i, s in enumerate(x2):
            d = nn.Conv(s.shape[-1], (3, 3), strides=(self.stride, self.stride), padding="SAME",
                        feature_group_count=s.shape[-1], use_bias=False, dtype=self.dtype, name=f"dw{i}")(s)
            d = _bn(train, f"dw_bn{i}")(d)
            out2.append(SpatialWeighting(ratio=4, dtype=self.dtype, name=f"sw{i}")(d))
        return [channel_shuffle(jnp.concatenate([a, b], axis=-1), 2) for a, b in zip(x1, out2)]


class LiteStem(nn.Module):
    """Reference ``litehrnet.py:217-350``."""

    stem_channels: int = 32
    out_channels: int = 32
    expand_ratio: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBNReLU(self.stem_channels, 3, stride=2, dtype=self.dtype, name="conv1")(x, train=train)
        branch_c = self.stem_channels // 2
        inc = (self.out_channels - branch_c) if self.stem_channels == self.out_channels \
            else (self.out_channels - self.stem_channels)
        mid = int(round(self.stem_channels * self.expand_ratio))
        x1, x2 = x[..., :branch_c], x[..., branch_c:]
        # branch1: dw s2 + pw
        b1 = nn.Conv(branch_c, (3, 3), strides=(2, 2), padding="SAME", feature_group_count=branch_c,
                     use_bias=False, dtype=self.dtype, name="b1_dw")(x1)
        b1 = _bn(train, "b1_dw_bn")(b1)
        b1 = ConvBNReLU(inc, 1, dtype=self.dtype, name="b1_pw")(b1, train=train)
        # branch2: expand pw + dw s2 + linear pw
        b2 = ConvBNReLU(mid, 1, dtype=self.dtype, name="b2_expand")(x2, train=train)
        b2 = nn.Conv(mid, (3, 3), strides=(2, 2), padding="SAME", feature_group_count=mid,
                     use_bias=False, dtype=self.dtype, name="b2_dw")(b2)
        b2 = _bn(train, "b2_dw_bn")(b2)
        out_b2 = branch_c if self.stem_channels == self.out_channels else self.stem_channels
        b2 = ConvBNReLU(out_b2, 1, dtype=self.dtype, name="b2_linear")(b2, train=train)
        return channel_shuffle(jnp.concatenate([b1, b2], axis=-1), 2)


@MODELS.register_module()
class LiteHRNet(nn.Module):
    """Reference ``litehrnet.py:785-1021``. Returns (highest-res branch,)
    refined by the IterativeHead when ``with_head``."""

    extra: Dict[str, Any] = None
    in_channels: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        extra = self.extra or dict(
            stem=dict(stem_channels=32, out_channels=32, expand_ratio=1),
            num_stages=3,
            stages_spec=dict(
                num_modules=(2, 4, 2), num_branches=(2, 3, 4), num_blocks=(2, 2, 2),
                module_type=("LITE",) * 3, with_fuse=(True,) * 3, reduce_ratios=(8, 8, 8),
                num_channels=((40, 80), (40, 80, 160), (40, 80, 160, 320)),
            ),
            with_head=True,
        )
        stem_cfg = extra["stem"]
        spec = extra["stages_spec"]
        y = [LiteStem(stem_cfg["stem_channels"], stem_cfg["out_channels"], stem_cfg["expand_ratio"],
                      dtype=self.dtype, name="stem")(x, train=train)]
        for i in range(extra["num_stages"]):
            chans = spec["num_channels"][i]
            nb = spec["num_branches"][i]
            # transition: match channels / create new branch by dw+pw stride 2
            xs = []
            for j in range(nb):
                if j < len(y):
                    src = y[j]
                    if src.shape[-1] != chans[j]:
                        src = ConvBNReLU(chans[j], 1, dtype=self.dtype,
                                         name=f"t{i}_proj{j}")(src, train=train)
                    xs.append(src)
                else:
                    src = y[-1]
                    d = nn.Conv(src.shape[-1], (3, 3), strides=(2, 2), padding="SAME",
                                feature_group_count=src.shape[-1], use_bias=False, dtype=self.dtype,
                                name=f"t{i}_dw{j}")(src)
                    d = _bn(train, f"t{i}_dw_bn{j}")(d)
                    xs.append(ConvBNReLU(chans[j], 1, dtype=self.dtype, name=f"t{i}_pw{j}")(d, train=train))
            # modules
            for m in range(spec["num_modules"][i]):
                for b in range(spec["num_blocks"][i]):
                    xs = ConditionalChannelWeighting(
                        tuple(chans), spec["reduce_ratios"][i], dtype=self.dtype, name=f"s{i}_m{m}_b{b}"
                    )(xs, train=train)
                if spec["with_fuse"][i]:
                    fused = []
                    for a in range(nb):
                        acc = xs[a]
                        for bidx in range(nb):
                            if bidx == a:
                                continue
                            src = xs[bidx]
                            if bidx > a:  # upsample lower-res
                                src = ConvBNReLU(chans[a], 1, act=False, dtype=self.dtype,
                                                 name=f"s{i}_m{m}_fuse{a}_{bidx}")(src, train=train)
                                src = _resize_nearest(src, acc.shape[1], acc.shape[2])
                            else:  # downsample higher-res with dw s2 chains
                                for step in range(a - bidx):
                                    src_c = src.shape[-1]
                                    src = nn.Conv(src_c, (3, 3), strides=(2, 2), padding="SAME",
                                                  feature_group_count=src_c, use_bias=False, dtype=self.dtype,
                                                  name=f"s{i}_m{m}_fuse{a}_{bidx}_dw{step}")(src)
                                    src = _bn(train, f"s{i}_m{m}_fuse{a}_{bidx}_dwbn{step}")(src)
                                    out_c = chans[a] if step == a - bidx - 1 else src_c
                                    src = ConvBNReLU(out_c, 1, act=False, dtype=self.dtype,
                                                     name=f"s{i}_m{m}_fuse{a}_{bidx}_pw{step}")(src, train=train)
                            acc = acc + src
                        fused.append(nn.relu(acc))
                    xs = fused
            y = xs
        if extra.get("with_head", False):
            # IterativeHead: top-down refinement, return the highest branch
            rev = y[::-1]
            last = None
            outs = []
            for i, s in enumerate(rev):
                if last is not None:
                    last = jax.image.resize(last, (s.shape[0], s.shape[1], s.shape[2], last.shape[3]), "bilinear")
                    s = s + last
                out_c = rev[i + 1].shape[-1] if i + 1 < len(rev) else s.shape[-1]
                d = nn.Conv(s.shape[-1], (3, 3), padding="SAME", feature_group_count=s.shape[-1],
                            use_bias=False, dtype=self.dtype, name=f"head_dw{i}")(s)
                d = _bn(train, f"head_dw_bn{i}")(d)
                d = ConvBNReLU(out_c, 1, dtype=self.dtype, name=f"head_pw{i}")(d, train=train)
                outs.append(d)
                last = d
            return (outs[-1].astype(jnp.float32),)
        return (y[0].astype(jnp.float32),)


class SplitAttentionConv(nn.Module):
    """Split-attention conv (reference ``resnest.py:38-120``), radix softmax
    over cardinal groups."""

    channels: int
    radix: int = 2
    groups: int = 1
    reduction_factor: int = 4
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.channels
        y = nn.Conv(c * self.radix, (3, 3), strides=(self.stride, self.stride), padding="SAME",
                    feature_group_count=self.groups * self.radix, use_bias=False, dtype=self.dtype, name="conv")(x)
        y = _bn(train, "bn0")(y)
        y = nn.relu(y)
        B, H, W, _ = y.shape
        splits = y.reshape(B, H, W, self.radix, c)
        gap = splits.sum(axis=3).mean(axis=(1, 2))  # (B, c)
        inter = max(c * self.radix // self.reduction_factor, 32)
        g = nn.relu(_bn(train, "fc_bn")(nn.Dense(inter, use_bias=False, dtype=self.dtype, name="fc1")(gap)))
        att = nn.Dense(c * self.radix, dtype=self.dtype, name="fc2")(g).reshape(B, self.radix, c)
        att = jax.nn.softmax(att, axis=1) if self.radix > 1 else jax.nn.sigmoid(att)
        return (splits * att[:, None, None].transpose(0, 1, 2, 3, 4)).sum(axis=3)


@MODELS.register_module()
class ResNeSt(nn.Module):
    """ResNeSt (reference ``resnest.py:123-337``): ResNet-D layout with
    split-attention bottlenecks."""

    depth: int = 50
    radix: int = 2
    groups: int = 1
    out_indices: Sequence[int] = (3,)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        stage_blocks = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3), 152: (3, 8, 36, 3), 200: (3, 24, 36, 3)}[self.depth]
        # deep stem (ResNet-D)
        for i, c in enumerate([32, 32, 64]):
            x = ConvBNReLU(c, 3, stride=2 if i == 0 else 1, dtype=self.dtype, name=f"stem{i}")(x, train=train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        outs = []
        width = 64
        for i, n_blocks in enumerate(stage_blocks):
            out_c = width * 4
            for b in range(n_blocks):
                stride = (2 if i > 0 else 1) if b == 0 else 1
                identity = x
                y = ConvBNReLU(width, 1, dtype=self.dtype, name=f"l{i}_b{b}_conv1")(x, train=train)
                y = SplitAttentionConv(width, radix=self.radix, groups=self.groups, dtype=self.dtype,
                                       name=f"l{i}_b{b}_sa")(y, train=train)
                if stride > 1:  # avg-pool downsample (ResNeSt-fast style)
                    y = nn.avg_pool(y, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
                y = ConvBNReLU(out_c, 1, act=False, dtype=self.dtype, name=f"l{i}_b{b}_conv3")(y, train=train)
                if stride != 1 or identity.shape[-1] != out_c:
                    if stride != 1:
                        identity = nn.avg_pool(identity, (2, 2), strides=(2, 2))
                    identity = ConvBNReLU(out_c, 1, act=False, dtype=self.dtype,
                                          name=f"l{i}_b{b}_down")(identity, train=train)
                x = nn.relu(y + identity)
            if i in self.out_indices:
                outs.append(x.astype(jnp.float32))
            width *= 2
        return tuple(outs)
