"""HRNet backbone (flax, NHWC).

Parity target: reference ``mmpose/models/backbones/hrnet.py`` (570 LoC
torch): stem (2x conv3x3 s2) -> stage1 bottlenecks -> transitions adding
parallel branches at halved resolutions -> HR modules exchanging information
through fuse layers (strided-conv down, 1x1-conv + nearest-upsample up).
Config surface identical (``extra=dict(stage1..stage4)`` with
BASIC/BOTTLENECK blocks). Output: the highest-resolution branch (or all
branches with ``multiscale_output``).

TPU notes: NHWC convs; BN statistics in f32; fuse-layer upsampling is
nearest-neighbor (matches torch ``Upsample(mode='nearest')``).
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from probpose_code_tpu.registry import MODELS


def _bn(train: bool, name: str):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, name=name)


class BasicBlock(nn.Module):
    channels: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        out = nn.Conv(self.channels, (3, 3), strides=(self.stride, self.stride), padding="SAME",
                      use_bias=False, dtype=self.dtype, name="conv1")(x)
        out = _bn(train, "bn1")(out)
        out = nn.relu(out)
        out = nn.Conv(self.channels, (3, 3), padding="SAME", use_bias=False, dtype=self.dtype, name="conv2")(out)
        out = _bn(train, "bn2")(out)
        if x.shape[-1] != self.channels or self.stride != 1:
            identity = nn.Conv(self.channels, (1, 1), strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype, name="downsample_conv")(x)
            identity = _bn(train, "downsample_bn")(identity)
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    channels: int  # bottleneck width; output is channels * 4
    stride: int = 1
    dtype: Any = jnp.float32
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        out_ch = self.channels * self.expansion
        out = nn.Conv(self.channels, (1, 1), use_bias=False, dtype=self.dtype, name="conv1")(x)
        out = _bn(train, "bn1")(out)
        out = nn.relu(out)
        out = nn.Conv(self.channels, (3, 3), strides=(self.stride, self.stride), padding="SAME",
                      use_bias=False, dtype=self.dtype, name="conv2")(out)
        out = _bn(train, "bn2")(out)
        out = nn.relu(out)
        out = nn.Conv(out_ch, (1, 1), use_bias=False, dtype=self.dtype, name="conv3")(out)
        out = _bn(train, "bn3")(out)
        if x.shape[-1] != out_ch or self.stride != 1:
            identity = nn.Conv(out_ch, (1, 1), strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype, name="downsample_conv")(x)
            identity = _bn(train, "downsample_bn")(identity)
        return nn.relu(out + identity)


_BLOCKS = {"BASIC": (BasicBlock, 1), "BOTTLENECK": (Bottleneck, 4)}


def _nearest_upsample(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    B, H, W, C = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (B, H, factor, W, factor, C))
    return x.reshape(B, H * factor, W * factor, C)


class HRModule(nn.Module):
    """Parallel branches + full information exchange (fuse layers)."""

    num_branches: int
    block: str
    num_blocks: Sequence[int]
    num_channels: Sequence[int]
    multiscale_output: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        block_cls, expansion = _BLOCKS[self.block]
        outs = []
        for b in range(self.num_branches):
            x = inputs[b]
            for i in range(self.num_blocks[b]):
                x = block_cls(self.num_channels[b], dtype=self.dtype, name=f"branch{b}_block{i}")(x, train=train)
            outs.append(x)

        if self.num_branches == 1:
            return outs

        n_out = self.num_branches if self.multiscale_output else 1
        fused = []
        for i in range(n_out):
            target_c = self.num_channels[i] * expansion
            acc = None
            for j in range(self.num_branches):
                y = outs[j]
                if j > i:  # upsample lower-res branch: 1x1 conv + nearest up
                    y = nn.Conv(target_c, (1, 1), use_bias=False, dtype=self.dtype, name=f"fuse{i}_{j}_conv")(y)
                    y = _bn(train, f"fuse{i}_{j}_bn")(y)
                    y = _nearest_upsample(y, 2 ** (j - i))
                elif j < i:  # downsample with strided 3x3 convs
                    for k in range(i - j):
                        last = k == i - j - 1
                        c = target_c if last else self.num_channels[j] * expansion
                        y = nn.Conv(c, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)), use_bias=False,
                                    dtype=self.dtype, name=f"fuse{i}_{j}_down{k}_conv")(y)
                        y = _bn(train, f"fuse{i}_{j}_down{k}_bn")(y)
                        if not last:
                            y = nn.relu(y)
                acc = y if acc is None else acc + y
            fused.append(nn.relu(acc))
        return fused


@MODELS.register_module()
class HRNet(nn.Module):
    """High-Resolution Net; ``extra`` uses the reference config schema."""

    extra: Dict[str, Any]
    in_channels: int = 3
    multiscale_output: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        # stem
        x = nn.Conv(64, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)), use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = _bn(train, "bn1")(x)
        x = nn.relu(x)
        x = nn.Conv(64, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)), use_bias=False, dtype=self.dtype, name="conv2")(x)
        x = _bn(train, "bn2")(x)
        x = nn.relu(x)

        # stage 1
        s1 = self.extra["stage1"]
        block_cls, expansion = _BLOCKS[s1["block"]]
        for i in range(s1["num_blocks"][0]):
            x = block_cls(s1["num_channels"][0], dtype=self.dtype, name=f"layer1_block{i}")(x, train=train)
        xs = [x]
        prev_channels = [s1["num_channels"][0] * expansion]

        for stage_idx in (2, 3, 4):
            cfg = self.extra[f"stage{stage_idx}"]
            block_cls, expansion = _BLOCKS[cfg["block"]]
            cur_channels = [c * expansion for c in cfg["num_channels"]]

            # transition: adapt existing branches, create new ones
            new_xs = []
            for b in range(cfg["num_branches"]):
                if b < len(xs):
                    y = xs[b]
                    if prev_channels[b] != cur_channels[b]:
                        y = nn.Conv(cur_channels[b], (3, 3), padding="SAME", use_bias=False,
                                    dtype=self.dtype, name=f"transition{stage_idx - 1}_{b}_conv")(y)
                        y = _bn(train, f"transition{stage_idx - 1}_{b}_bn")(y)
                        y = nn.relu(y)
                    new_xs.append(y)
                else:
                    y = xs[-1]
                    y = nn.Conv(cur_channels[b], (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)), use_bias=False,
                                dtype=self.dtype, name=f"transition{stage_idx - 1}_{b}_conv")(y)
                    y = _bn(train, f"transition{stage_idx - 1}_{b}_bn")(y)
                    new_xs.append(nn.relu(y))
            xs = new_xs

            # modules
            # the reference schema may request multi-scale output either via the
            # top-level flag or inside extra["stage4"] (HRNetV2-style face/hand
            # recipes, reference td-hm_hrnetv2-w18_* configs)
            ms_requested = self.multiscale_output or bool(
                self.extra.get("stage4", {}).get("multiscale_output", False)
            )
            for m in range(cfg["num_modules"]):
                last_module = m == cfg["num_modules"] - 1
                ms_out = True if stage_idx < 4 else (ms_requested or not last_module)
                xs = HRModule(
                    num_branches=cfg["num_branches"],
                    block=cfg["block"],
                    num_blocks=cfg["num_blocks"],
                    num_channels=cfg["num_channels"],
                    multiscale_output=ms_out,
                    dtype=self.dtype,
                    name=f"stage{stage_idx}_module{m}",
                )(xs, train=train)
            prev_channels = cur_channels[: len(xs)]

        return tuple(y.astype(jnp.float32) for y in xs)
