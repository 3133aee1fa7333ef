"""Necks (flax, NHWC).

Parity targets in reference ``mmpose/models/necks/``:
- ``FeatureMapProcessor``: select / concat (with rescale to a common
  resolution) / scale feature maps — pure function, no params
- ``GlobalAveragePooling`` (GAP)
- ``FPN``: lateral 1x1 convs + top-down nearest upsample + 3x3 output convs
- ``ChannelMapper``: per-level 1x1/3x3 conv to a common channel count
- ``CSPNeXtPAFPN``: top-down + bottom-up path aggregation with CSP layers
  (RTMO / RTMDet neck)
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from probpose_code_tpu.registry import MODELS

from ..backbones.cspnext import CSPLayer, ConvModule


def _resize_nearest(x: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    return jax.image.resize(x, (x.shape[0], size[0], size[1], x.shape[-1]), method="nearest")


def _resize_bilinear(x: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    return jax.image.resize(x, (x.shape[0], size[0], size[1], x.shape[-1]), method="bilinear")


@MODELS.register_module()
class FeatureMapProcessor(nn.Module):
    """Select / concat / rescale multi-scale features (parameter-free)."""

    select_index: Optional[Union[int, Sequence[int]]] = None
    concat: bool = False
    scale_factor: float = 1.0
    apply_relu: bool = False
    align_corners: bool = False

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        if not isinstance(inputs, (tuple, list)):
            inputs = (inputs,)
            sequential_input = False
        else:
            sequential_input = True

        if self.select_index is not None:
            if isinstance(self.select_index, int):
                inputs = (inputs[self.select_index],)
            else:
                inputs = tuple(inputs[i] for i in self.select_index)

        if self.concat and len(inputs) > 1:
            size = inputs[0].shape[1:3]
            resized = [inputs[0]] + [_resize_bilinear(x, size) for x in inputs[1:]]
            inputs = (jnp.concatenate(resized, axis=-1),)

        if self.scale_factor != 1.0:
            inputs = tuple(
                _resize_bilinear(
                    x, (int(x.shape[1] * self.scale_factor), int(x.shape[2] * self.scale_factor))
                )
                for x in inputs
            )
        if self.apply_relu:
            inputs = tuple(nn.relu(x) for x in inputs)

        if not sequential_input and len(inputs) == 1:
            return inputs[0]
        return tuple(inputs)


@MODELS.register_module()
class GlobalAveragePooling(nn.Module):
    """Spatial GAP of each feature map."""

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        if isinstance(inputs, (tuple, list)):
            return tuple(jnp.mean(x, axis=(1, 2)) for x in inputs)
        return jnp.mean(inputs, axis=(1, 2))


GAP = GlobalAveragePooling
MODELS.register_module(name="GAP", module=GlobalAveragePooling, force=True)


@MODELS.register_module()
class FPN(nn.Module):
    in_channels: Sequence[int]
    out_channels: int
    num_outs: Optional[int] = None
    start_level: int = 0
    end_level: int = -1
    add_extra_convs: bool = False
    relu_before_extra_convs: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        assert len(inputs) == len(self.in_channels)
        end = len(inputs) if self.end_level == -1 else self.end_level + 1
        used = list(inputs[self.start_level:end])

        laterals = [
            nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name=f"lateral{i}")(x)
            for i, x in enumerate(used)
        ]
        for i in range(len(laterals) - 1, 0, -1):
            laterals[i - 1] = laterals[i - 1] + _resize_nearest(laterals[i], laterals[i - 1].shape[1:3])
        outs = [
            nn.Conv(self.out_channels, (3, 3), padding="SAME", dtype=self.dtype, name=f"fpn_conv{i}")(x)
            for i, x in enumerate(laterals)
        ]
        num_outs = self.num_outs or len(outs)
        while len(outs) < num_outs:
            src = outs[-1]
            if self.add_extra_convs:
                if self.relu_before_extra_convs:
                    src = nn.relu(src)
                outs.append(
                    nn.Conv(self.out_channels, (3, 3), strides=(2, 2), padding="SAME",
                            dtype=self.dtype, name=f"extra_conv{len(outs)}")(src)
                )
            else:
                outs.append(nn.max_pool(src, (1, 1), strides=(2, 2)))
        return tuple(o.astype(jnp.float32) for o in outs)


@MODELS.register_module()
class ChannelMapper(nn.Module):
    """Per-level 1x1/3x3 projection neck (mmdet ChannelMapper semantics,
    used by the reference EDPose config: GN(32) convs + one stride-2 extra
    conv on the last input when ``num_outs`` exceeds the input count).

    ``norm_cfg={'type': 'GN'|GroupNorm, 'num_groups': N}`` enables GroupNorm
    (conv bias off, matching ConvModule bias='auto'); ``act_cfg`` accepts
    None (EDPose) or {'type': 'ReLU'}."""

    in_channels: Sequence[int]
    out_channels: int
    kernel_size: int = 3
    num_outs: Optional[int] = None
    norm_cfg: Any = None
    act_cfg: Any = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        assert len(inputs) == len(self.in_channels)
        k = self.kernel_size
        norm = dict(self.norm_cfg) if self.norm_cfg else None
        use_bias = norm is None
        act = (dict(self.act_cfg) if self.act_cfg else {}).get("type")
        act_fns = {None: None, "ReLU": nn.relu, "GELU": nn.gelu, "SiLU": nn.silu,
                   "LeakyReLU": lambda x: nn.leaky_relu(x, 0.01)}
        if act not in act_fns:
            raise ValueError(f"ChannelMapper: unsupported act_cfg type {act!r}")

        def block(x, ksize, stride, conv_name, gn_name):
            pad = (ksize - 1) // 2
            x = nn.Conv(
                self.out_channels, (ksize, ksize), strides=(stride, stride),
                padding=((pad, pad), (pad, pad)), use_bias=use_bias, dtype=self.dtype, name=conv_name,
            )(x)
            if norm is not None:
                x = nn.GroupNorm(num_groups=int(norm.get("num_groups", 32)), name=gn_name)(x)
            if act_fns[act] is not None:
                x = act_fns[act](x)
            return x.astype(jnp.float32)

        outs = [block(x, k, 1, f"conv{i}", f"gn{i}") for i, x in enumerate(inputs)]
        extra = (self.num_outs or len(outs)) - len(outs)
        for j in range(extra):
            src = inputs[-1] if j == 0 else outs[-1]
            outs.append(block(src, 3, 2, f"extra_conv{j}", f"extra_gn{j}"))
        return tuple(outs)


@MODELS.register_module()
class CSPNeXtPAFPN(nn.Module):
    """Path-aggregation FPN with CSPNeXt blocks (RTMDet / RTMO neck)."""

    in_channels: Sequence[int]
    out_channels: Optional[int] = None  # None keeps per-level channels (reference)
    out_indices: Optional[Sequence[int]] = None
    num_csp_blocks: int = 3
    expand_ratio: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        assert len(inputs) == len(self.in_channels)
        n = len(inputs)
        feats = list(inputs)

        # top-down
        inner = [feats[-1]]
        for i in range(n - 1, 0, -1):
            high = ConvModule(self.in_channels[i - 1], 1, dtype=self.dtype, name=f"reduce{i}")(
                inner[0], train=train
            )
            inner[0] = high
            up = _resize_nearest(high, feats[i - 1].shape[1:3])
            merged = jnp.concatenate([up, feats[i - 1]], axis=-1)
            merged = CSPLayer(
                self.in_channels[i - 1], expand_ratio=self.expand_ratio, num_blocks=self.num_csp_blocks,
                add_identity=False, channel_attention=False, dtype=self.dtype, name=f"top_down{i}",
            )(merged, train=train)
            inner.insert(0, merged)

        # bottom-up
        outs = [inner[0]]
        for i in range(n - 1):
            down = ConvModule(self.in_channels[i], 3, stride=2, dtype=self.dtype, name=f"down{i}")(
                outs[-1], train=train
            )
            merged = jnp.concatenate([down, inner[i + 1]], axis=-1)
            merged = CSPLayer(
                self.in_channels[i + 1], expand_ratio=self.expand_ratio, num_blocks=self.num_csp_blocks,
                add_identity=False, channel_attention=False, dtype=self.dtype, name=f"bottom_up{i}",
            )(merged, train=train)
            outs.append(merged)

        if self.out_channels is not None:
            # reference applies per-level out convs BEFORE out_indices selection
            # (cspnext_pafpn.py:180-184); out_channels=None has no out convs
            outs = [
                ConvModule(self.out_channels, 3, dtype=self.dtype, name=f"out_conv{i}")(o, train=train)
                for i, o in enumerate(outs)
            ]
        if self.out_indices is not None:
            outs = [outs[i] for i in self.out_indices]
        return tuple(o.astype(jnp.float32) for o in outs)
