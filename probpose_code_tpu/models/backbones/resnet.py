"""ResNet backbone family (flax, NHWC).

Parity target: reference ``mmpose/models/backbones/resnet.py`` (715 LoC
torch): standard torchvision-style ResNet with BasicBlock (18/34) and
Bottleneck (50/101/152), 7x7 stem (or deep 3x3 stem), stride-2 stages,
``out_indices`` selection. Also covers the config surface of the SE/ResNeXt
variants' common options (groups/width_per_group).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from probpose_code_tpu.registry import MODELS


def _bn(train: bool, name: str, frozen: bool = False):
    if frozen:
        return FrozenBatchNorm2d(name=name)
    return nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, name=name)


@MODELS.register_module()
class FrozenBatchNorm2d(nn.Module):
    """BatchNorm whose statistics AND affine parameters never update
    (gradients stopped), matching the reference's
    ``models/utils/misc.py:FrozenBatchNorm2d`` used when fine-tuning
    DETR-family heads on a pretrained backbone
    (reference ``configs/body_2d_keypoint/edpose/coco/edpose_res50...py:69``).

    Keeps the same variable layout as ``nn.BatchNorm`` (params scale/bias,
    batch_stats mean/var) so torch checkpoint conversion is unchanged.
    """

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, use_running_average: bool = True):
        C = x.shape[-1]
        scale = jax.lax.stop_gradient(self.param("scale", nn.initializers.ones, (C,)))
        bias = jax.lax.stop_gradient(self.param("bias", nn.initializers.zeros, (C,)))
        mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((C,), jnp.float32)).value
        var = self.variable("batch_stats", "var", lambda: jnp.ones((C,), jnp.float32)).value
        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        return y * scale + bias


class ResBasicBlock(nn.Module):
    channels: int
    stride: int = 1
    frozen_bn: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        out = nn.Conv(self.channels, (3, 3), strides=(self.stride, self.stride), padding=((1, 1), (1, 1)),
                      use_bias=False, dtype=self.dtype, name="conv1")(x)
        out = _bn(train, "bn1", self.frozen_bn)(out)
        out = nn.relu(out)
        out = nn.Conv(self.channels, (3, 3), padding="SAME", use_bias=False, dtype=self.dtype, name="conv2")(out)
        out = _bn(train, "bn2", self.frozen_bn)(out)
        if self.stride != 1 or x.shape[-1] != self.channels:
            identity = nn.Conv(self.channels, (1, 1), strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype, name="downsample_conv")(x)
            identity = _bn(train, "downsample_bn", self.frozen_bn)(identity)
        return nn.relu(out + identity)


class ResBottleneck(nn.Module):
    channels: int  # bottleneck width; output channels * 4
    stride: int = 1
    groups: int = 1
    width_per_group: int = 64
    frozen_bn: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        width = int(self.channels * (self.width_per_group / 64.0)) * self.groups
        out_ch = self.channels * 4
        out = nn.Conv(width, (1, 1), use_bias=False, dtype=self.dtype, name="conv1")(x)
        out = _bn(train, "bn1", self.frozen_bn)(out)
        out = nn.relu(out)
        out = nn.Conv(width, (3, 3), strides=(self.stride, self.stride), padding=((1, 1), (1, 1)),
                      feature_group_count=self.groups, use_bias=False, dtype=self.dtype, name="conv2")(out)
        out = _bn(train, "bn2", self.frozen_bn)(out)
        out = nn.relu(out)
        out = nn.Conv(out_ch, (1, 1), use_bias=False, dtype=self.dtype, name="conv3")(out)
        out = _bn(train, "bn3", self.frozen_bn)(out)
        if self.stride != 1 or x.shape[-1] != out_ch:
            identity = nn.Conv(out_ch, (1, 1), strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype, name="downsample_conv")(x)
            identity = _bn(train, "downsample_bn", self.frozen_bn)(identity)
        return nn.relu(out + identity)


ARCH_SETTINGS = {
    18: ("basic", (2, 2, 2, 2)),
    34: ("basic", (3, 4, 6, 3)),
    50: ("bottleneck", (3, 4, 6, 3)),
    101: ("bottleneck", (3, 4, 23, 3)),
    152: ("bottleneck", (3, 8, 36, 3)),
}


@MODELS.register_module()
class ResNet(nn.Module):
    depth: int = 50
    in_channels: int = 3
    stem_channels: int = 64
    base_channels: int = 64
    num_stages: int = 4
    strides: Sequence[int] = (1, 2, 2, 2)
    out_indices: Sequence[int] = (3,)
    deep_stem: bool = False
    groups: int = 1
    width_per_group: int = 64
    norm_cfg: Any = None  # dict(type='FrozenBatchNorm2d') freezes all BN
    # reference ``resnet.py:_freeze_stages``: >=0 freezes the stem, k>=1
    # additionally freezes stages 1..k (params get zero grads via
    # stop_gradient on the stage output; BN runs in eval mode so batch
    # statistics never update)
    frozen_stages: int = -1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Tuple[jnp.ndarray, ...]:
        block_type, stage_blocks = ARCH_SETTINGS[self.depth]
        frozen = bool(self.norm_cfg) and dict(self.norm_cfg).get("type") == "FrozenBatchNorm2d"
        stem_train = train and self.frozen_stages < 0
        if self.deep_stem:
            for i, c in enumerate([self.stem_channels // 2, self.stem_channels // 2, self.stem_channels]):
                x = nn.Conv(c, (3, 3), strides=(2, 2) if i == 0 else (1, 1), padding=((1, 1), (1, 1)),
                            use_bias=False, dtype=self.dtype, name=f"stem_conv{i}")(x)
                x = _bn(stem_train, f"stem_bn{i}", frozen)(x)
                x = nn.relu(x)
        else:
            x = nn.Conv(self.stem_channels, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                        use_bias=False, dtype=self.dtype, name="conv1")(x)
            x = _bn(stem_train, "bn1", frozen)(x)
            x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        if self.frozen_stages >= 0:
            x = jax.lax.stop_gradient(x)

        outs = []
        channels = self.base_channels
        for stage_idx in range(self.num_stages):
            stage_frozen = stage_idx + 1 <= self.frozen_stages
            n_blocks = stage_blocks[stage_idx]
            for b in range(n_blocks):
                stride = self.strides[stage_idx] if b == 0 else 1
                if block_type == "basic":
                    x = ResBasicBlock(channels, stride, frozen_bn=frozen, dtype=self.dtype,
                                      name=f"layer{stage_idx + 1}_block{b}")(x, train=train and not stage_frozen)
                else:
                    x = ResBottleneck(channels, stride, self.groups, self.width_per_group,
                                      frozen_bn=frozen, dtype=self.dtype,
                                      name=f"layer{stage_idx + 1}_block{b}")(x, train=train and not stage_frozen)
            if stage_frozen:
                x = jax.lax.stop_gradient(x)
            if stage_idx in self.out_indices:
                outs.append(x.astype(jnp.float32))
            channels *= 2
        return tuple(outs)


@MODELS.register_module()
class ResNeXt(ResNet):
    """ResNeXt = ResNet with grouped 3x3 bottleneck convs."""

    groups: int = 32
    width_per_group: int = 4


@MODELS.register_module()
class ResNetV1d(ResNet):
    """ResNet with the deep 3x3 stem (used by SCNet/ResNeSt-style configs)."""

    deep_stem: bool = True
