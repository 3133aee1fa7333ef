"""Multi-stage heatmap heads: CPMHead, MSPNHead, ViPNASHead.

Behavioral parity targets:
- CPMHead: reference ``heads/heatmap_heads/cpm_head.py:20-330`` — one
  deconv+final-conv branch per stage; predict decodes the LAST stage
  (:224), loss supervises every stage.
- MSPNHead: reference ``heads/heatmap_heads/mspn_head.py:158-430`` — one
  PredictHeatmap (1x1+3x3 conv, bilinear resize to out_shape, optional
  Pose Refine Machine) per stage*unit; loss picks the GT pyramid level for
  each unit via ``level_indices`` (:396-399); predict uses the last
  stage's last unit.
- ViPNASHead: reference ``heads/heatmap_heads/vipnas_head.py:15`` — a
  HeatmapHead whose deconvs are grouped.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from probpose_code_tpu.registry import MODELS
from .heatmap_head import DeconvStack


def _bn(train: bool, name: str):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, name=name)


@MODELS.register_module()
class CPMHead(nn.Module):
    """Per-stage deconv + final conv (reference ``cpm_head.py``)."""

    in_channels: Any
    out_channels: int
    num_stages: int
    deconv_out_channels: Optional[Sequence[int]] = None
    deconv_kernel_sizes: Optional[Sequence[int]] = None
    final_layer: Optional[dict] = None
    loss: Any = None
    decoder: Any = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False):
        assert len(feats) == self.num_stages
        outs = []
        for i, x in enumerate(feats):
            if self.deconv_out_channels:
                x = DeconvStack(
                    self.deconv_out_channels, self.deconv_kernel_sizes or (4,) * len(self.deconv_out_channels),
                    self.dtype, name=f"deconv{i}",
                )(x, train=train)
            k = (self.final_layer or {"kernel_size": 1}).get("kernel_size", 1)
            x = nn.Conv(self.out_channels, (k, k), padding="SAME", name=f"final{i}")(x)
            outs.append(jnp.transpose(x.astype(jnp.float32), (0, 3, 1, 2)))
        return outs


class PRM(nn.Module):
    """Pose Refine Machine (reference ``mspn_head.py:20-91``)."""

    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: NHWC
        out1 = nn.Conv(self.out_channels, (3, 3), padding="SAME", use_bias=False, dtype=self.dtype, name="prm1_conv")(x)
        out1 = _bn(train, "prm1_bn")(out1)
        out1 = nn.relu(out1)

        g = out1.mean(axis=(1, 2))  # global pooling
        for i in range(2):
            g = nn.Dense(self.out_channels, dtype=self.dtype, name=f"mid_fc{i}")(g)
            g = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, name=f"mid_bn{i}")(g)
            g = nn.relu(g)
        g = jax.nn.sigmoid(g)[:, None, None, :]

        b = nn.Conv(self.out_channels, (1, 1), use_bias=False, dtype=self.dtype, name="bottom_conv1")(out1)
        b = _bn(train, "bottom_bn1")(b)
        b = nn.relu(b)
        # depthwise-separable 9x9 -> 1 channel
        b = nn.Conv(self.out_channels, (9, 9), padding="SAME", feature_group_count=self.out_channels,
                    use_bias=False, dtype=self.dtype, name="bottom_dw")(b)
        b = _bn(train, "bottom_dw_bn")(b)
        b = nn.relu(b)
        b = nn.Conv(1, (1, 1), use_bias=False, dtype=self.dtype, name="bottom_pw")(b)
        b = _bn(train, "bottom_pw_bn")(b)
        b = nn.relu(b)
        b = jax.nn.sigmoid(b)
        return out1 * (1 + g * b)


@MODELS.register_module()
class MSPNHead(nn.Module):
    """Multi-stage multi-unit head (reference ``mspn_head.py:158-430``).

    Input: list over stages of lists over units (low->high resolution).
    Output: flat list of (B, K, out_h, out_w) heatmaps, stage-major.
    """

    num_stages: int = 4
    num_units: int = 4
    out_shape: Tuple[int, int] = (64, 48)
    unit_channels: int = 256
    out_channels: int = 17
    use_prm: bool = False
    level_indices: Sequence[int] = ()
    loss: Any = None
    decoder: Any = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = False):
        assert len(feats) == self.num_stages
        outs = []
        for i, stage in enumerate(feats):
            assert len(stage) == self.num_units
            for j, f in enumerate(stage):
                x = nn.Conv(self.unit_channels, (1, 1), use_bias=False, dtype=self.dtype,
                            name=f"s{i}_u{j}_conv1")(f)
                x = _bn(train, f"s{i}_u{j}_bn1")(x)
                x = nn.relu(x)
                x = nn.Conv(self.out_channels, (3, 3), padding="SAME", use_bias=False, dtype=self.dtype,
                            name=f"s{i}_u{j}_conv2")(x)
                x = _bn(train, f"s{i}_u{j}_bn2")(x)
                h, w = self.out_shape
                x = jax.image.resize(x, (x.shape[0], h, w, x.shape[3]), "bilinear")
                if self.use_prm:
                    x = PRM(self.out_channels, dtype=self.dtype, name=f"s{i}_u{j}_prm")(x, train=train)
                outs.append(jnp.transpose(x.astype(jnp.float32), (0, 3, 1, 2)))
        return outs


@MODELS.register_module()
class ViPNASHead(nn.Module):
    """HeatmapHead with grouped deconvs (reference ``vipnas_head.py:15``)."""

    in_channels: int
    out_channels: int
    deconv_out_channels: Sequence[int] = (144, 144, 144)
    deconv_num_groups: Sequence[int] = (16, 16, 16)
    loss: Any = None
    decoder: Any = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = False):
        x = feats[-1] if isinstance(feats, (tuple, list)) else feats
        for i, (c, g) in enumerate(zip(self.deconv_out_channels, self.deconv_num_groups)):
            # grouped deconv as per-group transposed convs (flax ConvTranspose
            # has no feature groups); XLA fuses the static split/concat
            parts = jnp.split(x, g, axis=-1)
            parts = [
                nn.ConvTranspose(c // g, (4, 4), strides=(2, 2), padding="SAME", use_bias=False,
                                 dtype=self.dtype, name=f"deconv{i}_g{j}")(p)
                for j, p in enumerate(parts)
            ]
            x = jnp.concatenate(parts, axis=-1)
            x = _bn(train, f"deconv_bn{i}")(x)
            x = nn.relu(x)
        x = nn.Conv(self.out_channels, (1, 1), name="final_layer")(x)
        return jnp.transpose(x.astype(jnp.float32), (0, 3, 1, 2))


def cpm_head_loss(outputs, batch, keypoint_loss) -> Dict[str, jnp.ndarray]:
    """Sum the per-stage losses against the shared GT (reference
    ``cpm_head.py:258-297``)."""
    total = 0.0
    for hm in outputs:
        total = total + keypoint_loss(hm, batch["heatmaps"], batch.get("keypoint_weights"))
    return {"loss_kpt": total}


def mspn_head_loss(outputs, batch, keypoint_loss, level_indices) -> Dict[str, jnp.ndarray]:
    """Per-(stage, unit) loss against the GT pyramid level selected by
    ``level_indices`` (reference ``mspn_head.py:357-405``).

    batch["multilevel_heatmaps"]: list over levels of (B, K, H, W)
    batch["multilevel_keypoint_weights"]: (B, L, K)
    """
    gts = batch["multilevel_heatmaps"]
    weights = batch.get("multilevel_keypoint_weights")
    total = 0.0
    for i, hm in enumerate(outputs):
        lvl = level_indices[i]
        w = weights[:, lvl] if weights is not None else None
        total = total + keypoint_loss(hm, gts[lvl], w)
    return {"loss_kpt": total}
