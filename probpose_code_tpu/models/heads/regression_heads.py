"""Coordinate-regression heads (flax).

Parity targets in reference ``mmpose/models/heads/regression_heads/``:
- ``RegressionHead``: GAP -> fc -> (B, K, 2) normalized coords
- ``RLEHead``: GAP -> fc -> (B, K, 4) coords + sigmas; RealNVP flow density
  of the residuals drives the RLE loss (the flow lives in the head so its
  parameters train jointly)
- ``IntegralRegressionHead`` / ``DSNTHead``: conv stack -> heatmaps ->
  spatial softmax -> soft-argmax expectation, normalized to [0, 1]
- ``VisPredictHead``: wraps any head and adds a GAP->fc->sigmoid visibility
  branch (reference ``hybrid_heads/vis_head.py``).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from probpose_code_tpu.registry import MODELS

from ..utils.realnvp import RealNVP
from .heatmap_head import ConvStack, DeconvStack


@MODELS.register_module()
class RegressionHead(nn.Module):
    in_channels: int
    num_joints: int
    loss: Any = None
    decoder: Any = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = False):
        x = feats[-1] if isinstance(feats, (tuple, list)) else feats  # NHWC
        x = jnp.mean(x, axis=(1, 2))  # GAP
        x = nn.Dense(self.num_joints * 2, name="fc")(x)
        return x.reshape(-1, self.num_joints, 2).astype(jnp.float32)


@MODELS.register_module()
class RLEHead(nn.Module):
    """RLE regression head (reference ``regression_heads/rle_head.py:39``).

    GAP -> fc -> (B, K, 4) raw coords + raw sigmas. The RealNVP flow that
    models the residual-error density (reference keeps it inside ``RLELoss``,
    ``losses/regression_loss.py:42``) lives here as a submodule so its
    parameters sit in the same variable tree and train jointly; the loss
    evaluates it through :meth:`log_phi`.
    """

    in_channels: int
    num_joints: int
    loss: Any = None
    decoder: Any = None
    dtype: Any = jnp.float32

    def setup(self):
        self.fc = nn.Dense(self.num_joints * 4, name="fc")
        self.flow = RealNVP(name="flow")

    def __call__(self, feats, train: bool = False):
        x = feats[-1] if isinstance(feats, (tuple, list)) else feats
        x = jnp.mean(x, axis=(1, 2))
        x = self.fc(x)
        return x.reshape(-1, self.num_joints, 4).astype(jnp.float32)

    def log_phi(self, error: jnp.ndarray) -> jnp.ndarray:
        """Flow log-density of normalized residuals (B, K, 2) -> (B, K)."""
        B, K, _ = error.shape
        logp = self.flow(error.reshape(B * K, 2))
        return logp.reshape(B, K)


@MODELS.register_module()
class IntegralRegressionHead(nn.Module):
    """Soft-argmax over latent heatmaps (IPR)."""

    in_channels: int
    in_featuremap_size: Tuple[int, int]
    num_joints: int
    debias: bool = False
    beta: float = 1.0
    deconv_out_channels: Optional[Sequence[int]] = (256, 256, 256)
    deconv_kernel_sizes: Optional[Sequence[int]] = (4, 4, 4)
    conv_out_channels: Optional[Sequence[int]] = None
    conv_kernel_sizes: Optional[Sequence[int]] = None
    final_layer_kernel_size: int = 1
    loss: Any = None
    decoder: Any = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = False):
        x = feats[-1] if isinstance(feats, (tuple, list)) else feats
        if self.deconv_out_channels:
            x = DeconvStack(self.deconv_out_channels, self.deconv_kernel_sizes, self.dtype, name="deconv_layers")(
                x, train=train
            )
        if self.conv_out_channels:
            x = ConvStack(self.conv_out_channels, self.conv_kernel_sizes, self.dtype, name="conv_layers")(
                x, train=train
            )
        k = self.final_layer_kernel_size
        x = nn.Conv(self.num_joints, (k, k), padding="SAME", name="final_layer")(x)
        B, H, W, K = x.shape
        heatmaps = jnp.transpose(x.astype(jnp.float32), (0, 3, 1, 2))  # (B, K, H, W)

        flat = heatmaps.reshape(B, K, H * W)
        probs = nn.softmax(flat * self.beta, axis=-1).reshape(B, K, H, W)
        xs = jnp.arange(W, dtype=jnp.float32)
        ys = jnp.arange(H, dtype=jnp.float32)
        ex = (probs.sum(axis=2) * xs).sum(axis=-1)  # (B, K)
        ey = (probs.sum(axis=3) * ys).sum(axis=-1)
        coords = jnp.stack([ex / W, ey / H], axis=-1)  # normalized like RegressionLabel
        return coords, heatmaps


@MODELS.register_module()
class DSNTHead(IntegralRegressionHead):
    """DSNT variant of IntegralRegressionHead (same forward; JS/divergence
    supervision selected via the loss config)."""


@MODELS.register_module()
class VisPredictHead(nn.Module):
    """Wrap any pose head with a keypoint-visibility branch
    (reference ``hybrid_heads/vis_head.py:227``)."""

    pose_cfg: Any
    loss: Any = None
    dtype: Any = jnp.float32

    def setup(self):
        cfg = dict(self.pose_cfg)
        head_type = cfg.pop("type")
        cls = MODELS.get(head_type) if isinstance(head_type, str) else head_type
        self.pose_head = cls(**cfg, name="pose_head")
        out_channels = cfg.get("out_channels", cfg.get("num_joints", 17))
        self.vis_fc = nn.Dense(out_channels, name="vis_fc")

    def __call__(self, feats, train: bool = False):
        x = feats[-1] if isinstance(feats, (tuple, list)) else feats
        vis = nn.sigmoid(self.vis_fc(jnp.mean(x, axis=(1, 2))).astype(jnp.float32))
        pose_out = self.pose_head(feats, train=train)
        return pose_out, vis


@MODELS.register_module()
class MotionRegressionHead(nn.Module):
    """MotionBERT regression head (reference
    ``heads/regression_heads/motion_regression_head.py:18-81``): per-token
    pre-logits (Dense + tanh) then a 3D-coordinate FC over DSTFormer
    embeddings (B, T, K, C) -> (B, T, K, 3)."""

    in_channels: int = 256
    out_channels: int = 3
    embedding_size: int = 512
    loss: Any = None
    decoder: Any = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = False):
        x = feats[-1] if isinstance(feats, (tuple, list)) else feats
        x = jnp.tanh(nn.Dense(self.embedding_size, dtype=self.dtype, name="pre_logits")(x))
        return nn.Dense(self.out_channels, dtype=self.dtype, name="fc")(x).astype(jnp.float32)
