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
