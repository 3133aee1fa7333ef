"""SimCC-family heads (flax): SimCCHead and RTMCCHead.

Parity targets:
- ``SimCCHead`` (reference ``heads/coord_cls_heads/simcc_head.py``): deconv
  stack -> final conv -> flatten -> two linear classifiers over the x / y
  SimCC bins.
- ``RTMCCHead`` (reference ``heads/coord_cls_heads/rtmcc_head.py:289``):
  final 7x7 conv -> ScaleNorm+linear token mix -> GAU -> x / y classifiers.

Both emit ``(pred_x, pred_y)`` with shapes (B, K, W*ratio), (B, K, H*ratio).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax.numpy as jnp

from probpose_code_tpu.registry import MODELS

from ..utils.rtmcc_block import RTMCCBlock, ScaleNorm
from .heatmap_head import DeconvStack


@MODELS.register_module()
class SimCCHead(nn.Module):
    in_channels: int
    out_channels: int
    input_size: Tuple[int, int]
    in_featuremap_size: Tuple[int, int]
    simcc_split_ratio: float = 2.0
    deconv_out_channels: Optional[Sequence[int]] = (256, 256, 256)
    deconv_kernel_sizes: Optional[Sequence[int]] = (4, 4, 4)
    final_layer_kernel_size: int = 1
    loss: Any = None
    decoder: Any = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = False):
        x = feats[-1] if isinstance(feats, (tuple, list)) else feats  # NHWC
        if self.deconv_out_channels:
            x = DeconvStack(self.deconv_out_channels, self.deconv_kernel_sizes, self.dtype, name="deconv_layers")(
                x, train=train
            )
        k = self.final_layer_kernel_size
        x = nn.Conv(self.out_channels, (k, k), padding="SAME", name="final_layer")(x)
        B, H, W, K = x.shape
        x = jnp.transpose(x, (0, 3, 1, 2)).reshape(B, K, H * W).astype(jnp.float32)

        Wx = int(self.input_size[0] * self.simcc_split_ratio)
        Wy = int(self.input_size[1] * self.simcc_split_ratio)
        pred_x = nn.Dense(Wx, name="mlp_head_x")(x)
        pred_y = nn.Dense(Wy, name="mlp_head_y")(x)
        return pred_x, pred_y


@MODELS.register_module()
class RTMCCHead(nn.Module):
    in_channels: int
    out_channels: int
    input_size: Tuple[int, int]
    in_featuremap_size: Tuple[int, int]
    simcc_split_ratio: float = 2.0
    final_layer_kernel_size: int = 7
    gau_cfg: Any = None
    loss: Any = None
    decoder: Any = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = False):
        gau_cfg = dict(
            hidden_dims=256, s=128, expansion_factor=2, dropout_rate=0.0, drop_path=0.0,
            act_fn="ReLU", use_rel_bias=False, pos_enc=False,
        )
        if self.gau_cfg:
            gau_cfg.update(dict(self.gau_cfg))

        x = feats[-1] if isinstance(feats, (tuple, list)) else feats  # (B, h, w, C)
        k = self.final_layer_kernel_size
        x = nn.Conv(self.out_channels, (k, k), padding="SAME", dtype=self.dtype, name="final_layer")(x)
        B, H, W, K = x.shape
        x = jnp.transpose(x, (0, 3, 1, 2)).reshape(B, K, H * W).astype(jnp.float32)

        # token mixing: ScaleNorm + linear (no bias)
        x = ScaleNorm(name="mlp_norm")(x)
        x = nn.Dense(gau_cfg["hidden_dims"], use_bias=False, name="mlp_fc")(x)

        x = RTMCCBlock(
            num_token=self.out_channels,
            in_token_dims=gau_cfg["hidden_dims"],
            out_token_dims=gau_cfg["hidden_dims"],
            expansion_factor=gau_cfg["expansion_factor"],
            s=gau_cfg["s"],
            dropout_rate=gau_cfg["dropout_rate"],
            drop_path=gau_cfg["drop_path"],
            act_fn=gau_cfg["act_fn"],
            use_rel_bias=gau_cfg["use_rel_bias"],
            pos_enc=gau_cfg["pos_enc"],
            dtype=self.dtype,
            name="gau",
        )(x, train=train)

        Wx = int(self.input_size[0] * self.simcc_split_ratio)
        Wy = int(self.input_size[1] * self.simcc_split_ratio)
        pred_x = nn.Dense(Wx, use_bias=False, name="cls_x")(x)
        pred_y = nn.Dense(Wy, use_bias=False, name="cls_y")(x)
        return pred_x, pred_y


def _pixel_shuffle(x: jnp.ndarray, r: int = 2) -> jnp.ndarray:
    """NHWC pixel shuffle: (B, H, W, C) -> (B, rH, rW, C/r^2).

    Channel ordering matches ``torch.nn.PixelShuffle`` (output-channel major:
    input channel ``co*r*r + i*r + j`` feeds output pixel offset (i, j)), so
    converted torch weights downstream of the shuffle stay aligned.
    """
    b, h, w, c = x.shape
    x = x.reshape(b, h, w, c // (r * r), r, r)
    return x.transpose(0, 1, 4, 2, 5, 3).reshape(b, h * r, w * r, c // (r * r))


@MODELS.register_module()
class RTMWHead(nn.Module):
    """RTMPose-Wholebody head (reference
    ``heads/coord_cls_heads/rtmw_head.py:24-196``): two-resolution feature
    fusion — the top level is pixel-shuffled up and concatenated with the
    bottom level — then per-keypoint token MLPs, one GAU, and SimCC x/y
    classifiers."""

    in_channels: int
    out_channels: int
    input_size: Tuple[int, int]
    in_featuremap_size: Tuple[int, int]
    simcc_split_ratio: float = 2.0
    final_layer_kernel_size: int = 1
    gau_cfg: Any = None
    loss: Any = None
    decoder: Any = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = False):
        def conv_bn_relu(out_ch, name):
            # reference rtmw_head.py:103-130: ConvModule with default-eps BN
            # and ReLU (NOT the YOLOX-style eps-1e-3/SiLU ConvModule)
            k = self.final_layer_kernel_size
            pad = k // 2

            def apply(x):
                x = nn.Conv(out_ch, (k, k), padding=((pad, pad), (pad, pad)), use_bias=False,
                            dtype=self.dtype, name=f"{name}_conv")(x)
                x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                                 name=f"{name}_bn")(x)
                return nn.relu(x)

            return apply

        enc_b, enc_t = feats[-2], feats[-1]  # (B, 2h, 2w, C/2), (B, h, w, C)
        gau_cfg = dict(self.gau_cfg or {})
        hidden = gau_cfg.get("hidden_dims", 256)
        flat = self.in_featuremap_size[0] * self.in_featuremap_size[1]

        ft = conv_bn_relu(self.out_channels, "final_layer")(enc_t)
        ft = ft.reshape(ft.shape[0], -1, self.out_channels).transpose(0, 2, 1)  # (B, K, h*w)
        ft = ScaleNorm(name="mlp_norm")(ft)
        ft = nn.Dense(hidden // 2, use_bias=False, dtype=self.dtype, name="mlp")(ft)

        dec = _pixel_shuffle(enc_t, 2)
        dec = conv_bn_relu(self.in_channels // 4, "conv_dec")(dec)
        eb = jnp.concatenate([dec, enc_b], axis=-1)
        fb = conv_bn_relu(self.out_channels, "final_layer2")(eb)
        fb = fb.reshape(fb.shape[0], -1, self.out_channels).transpose(0, 2, 1)  # (B, K, 4*h*w)
        fb = ScaleNorm(name="mlp2_norm")(fb)
        fb = nn.Dense(hidden // 2, use_bias=False, dtype=self.dtype, name="mlp2")(fb)

        tokens = jnp.concatenate([ft, fb], axis=-1)  # (B, K, hidden)
        tokens = RTMCCBlock(
            num_token=self.out_channels, in_token_dims=hidden, out_token_dims=hidden,
            s=gau_cfg.get("s", 128), expansion_factor=gau_cfg.get("expansion_factor", 2),
            act_fn=gau_cfg.get("act_fn", "ReLU"), use_rel_bias=gau_cfg.get("use_rel_bias", False),
            pos_enc=gau_cfg.get("pos_enc", False), dtype=self.dtype, name="gau",
        )(tokens, train=train)
        Wx = int(self.input_size[0] * self.simcc_split_ratio)
        Wy = int(self.input_size[1] * self.simcc_split_ratio)
        pred_x = nn.Dense(Wx, use_bias=False, dtype=self.dtype, name="cls_x")(tokens).astype(jnp.float32)
        pred_y = nn.Dense(Wy, use_bias=False, dtype=self.dtype, name="cls_y")(tokens).astype(jnp.float32)
        return pred_x, pred_y
