"""HybridEncoder neck (RTMO) and YOLOXPAFPN.

Behavioral parity with reference ``mmpose/models/necks/hybrid_encoder.py``
(CSPRepLayer :16-69, HybridEncoder :72-251) and ``yolox_pafpn.py``.
TPU-native: NHWC, nearest-resize upsampling, the transformer encoder's 2-D
sine positional encoding is a baked constant for the static feature size.
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from probpose_code_tpu.registry import MODELS
from probpose_code_tpu.models.backbones.cspnext import ConvModule
from probpose_code_tpu.models.backbones.csp_darknet import DarknetCSPLayer
from probpose_code_tpu.models.utils.transformer import (
    DetrTransformerEncoder,
    RepVGGBlock,
    sine_pos_encoding_2d,
)


def _upsample2x(x: jnp.ndarray) -> jnp.ndarray:
    b, h, w, c = x.shape
    return jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c)).reshape(b, 2 * h, 2 * w, c)


class ConvBN(nn.Module):
    """Conv + BN with optional SiLU (reference uses default BN eps=1e-5 in
    this neck, unlike the YOLOX-style eps=1e-3 of the CSPNeXt/CSPDarknet
    ConvModule). Padding is the explicit torch ``k // 2`` on both sides."""

    out_channels: int
    kernel_size: int = 1
    stride: int = 1
    act: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = self.kernel_size // 2
        x = nn.Conv(
            self.out_channels, (self.kernel_size, self.kernel_size), strides=(self.stride, self.stride),
            padding=((pad, pad), (pad, pad)), use_bias=False, dtype=self.dtype, name="conv",
        )(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, name="bn")(x)
        return nn.silu(x) if self.act else x


class CSPRepLayer(nn.Module):
    """CSP layer over RepVGG blocks (reference ``hybrid_encoder.py:16-69``)."""

    out_channels: int
    num_blocks: int = 3
    widen_factor: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = int(self.out_channels * self.widen_factor)
        x1 = ConvBN(hidden, 1, dtype=self.dtype, name="conv1")(x, train=train)
        for i in range(self.num_blocks):
            x1 = RepVGGBlock(hidden, dtype=self.dtype, name=f"rep{i}")(x1, train=train)
        x2 = ConvBN(hidden, 1, dtype=self.dtype, name="conv2")(x, train=train)
        out = x1 + x2
        if hidden != self.out_channels:
            out = ConvBN(self.out_channels, 1, dtype=self.dtype, name="conv3")(out, train=train)
        return out


@MODELS.register_module()
class HybridEncoder(nn.Module):
    """Transformer-augmented FPN+PAN neck (reference ``hybrid_encoder.py:72``).

    Projects each input level to ``hidden_dim``, runs a DETR encoder on the
    levels in ``use_encoder_idx`` (with 2-D sine pos enc), then a top-down
    FPN and bottom-up PAN of CSPRepLayers. ``output_indices`` selects the
    returned levels; an optional 1x1 projector maps them to ``proj_channels``.
    """

    in_channels: Sequence[int] = (512, 1024, 2048)
    hidden_dim: int = 256
    use_encoder_idx: Sequence[int] = (2,)
    num_encoder_layers: int = 1
    num_heads: int = 8
    feedforward_channels: int = 1024
    pe_temperature: float = 10000.0
    widen_factor: float = 1.0
    deepen_factor: float = 1.0
    output_indices: Optional[Sequence[int]] = None
    projector_channels: Optional[int] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs: Tuple[jnp.ndarray, ...], train: bool = False):
        assert len(inputs) == len(self.in_channels)
        nb = round(3 * self.deepen_factor)
        feats: List[jnp.ndarray] = [
            ConvBN(self.hidden_dim, 1, act=False, dtype=self.dtype, name=f"input_proj{i}")(x, train=train)
            for i, x in enumerate(inputs)
        ]

        # transformer encoder on selected levels
        for j, idx in enumerate(self.use_encoder_idx):
            x = feats[idx]
            b, h, w, c = x.shape
            tokens = x.reshape(b, h * w, c)
            pos = jnp.asarray(sine_pos_encoding_2d(h, w, self.hidden_dim // 2, self.pe_temperature))[None]
            tokens = DetrTransformerEncoder(
                num_layers=self.num_encoder_layers, embed_dims=self.hidden_dim, num_heads=self.num_heads,
                feedforward_channels=self.feedforward_channels, dtype=self.dtype, name=f"encoder{j}",
            )(tokens, query_pos=pos, train=train)
            feats[idx] = tokens.reshape(b, h, w, c)

        # top-down FPN
        n = len(feats)
        inner = [feats[-1]]
        for k, idx in enumerate(range(n - 1, 0, -1)):
            high = ConvBN(self.hidden_dim, 1, dtype=self.dtype, name=f"lateral{k}")(inner[0], train=train)
            inner[0] = high
            merged = jnp.concatenate([_upsample2x(high), feats[idx - 1]], axis=-1)
            inner.insert(
                0,
                CSPRepLayer(self.hidden_dim, nb, self.widen_factor, dtype=self.dtype, name=f"fpn{k}")(
                    merged, train=train
                ),
            )

        # bottom-up PAN
        outs = [inner[0]]
        for k in range(n - 1):
            down = ConvBN(self.hidden_dim, 3, stride=2, dtype=self.dtype, name=f"down{k}")(outs[-1], train=train)
            merged = jnp.concatenate([down, inner[k + 1]], axis=-1)
            outs.append(
                CSPRepLayer(self.hidden_dim, nb, self.widen_factor, dtype=self.dtype, name=f"pan{k}")(
                    merged, train=train
                )
            )

        if self.output_indices is not None:
            outs = [outs[i] for i in self.output_indices]
        if self.projector_channels is not None:
            outs = [
                ConvBN(self.projector_channels, 1, act=False, dtype=self.dtype, name=f"proj{i}")(o, train=train)
                for i, o in enumerate(outs)
            ]
        return tuple(outs)


@MODELS.register_module()
class YOLOXPAFPN(nn.Module):
    """YOLOX path-aggregation FPN (reference ``yolox_pafpn.py``)."""

    in_channels: Sequence[int] = (256, 512, 1024)
    out_channels: int = 256
    num_csp_blocks: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs: Tuple[jnp.ndarray, ...], train: bool = False):
        n = len(self.in_channels)
        # top-down
        inner = list(inputs)
        for k, idx in enumerate(range(n - 1, 0, -1)):
            high = ConvModule(self.in_channels[idx - 1], 1, dtype=self.dtype, name=f"reduce{k}")(
                inner[idx], train=train
            )
            inner[idx] = high
            merged = jnp.concatenate([_upsample2x(high), inner[idx - 1]], axis=-1)
            inner[idx - 1] = DarknetCSPLayer(
                self.in_channels[idx - 1], num_blocks=self.num_csp_blocks, add_identity=False,
                dtype=self.dtype, name=f"td_csp{k}",
            )(merged, train=train)
        # bottom-up
        outs = [inner[0]]
        for k in range(n - 1):
            down = ConvModule(self.in_channels[k], 3, stride=2, dtype=self.dtype, name=f"down{k}")(
                outs[-1], train=train
            )
            merged = jnp.concatenate([down, inner[k + 1]], axis=-1)
            outs.append(
                DarknetCSPLayer(
                    self.in_channels[k + 1], num_blocks=self.num_csp_blocks, add_identity=False,
                    dtype=self.dtype, name=f"bu_csp{k}",
                )(merged, train=train)
            )
        return tuple(
            ConvModule(self.out_channels, 1, dtype=self.dtype, name=f"out{i}")(o, train=train)
            for i, o in enumerate(outs)
        )
