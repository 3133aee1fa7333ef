"""PoseLifter: 2D keypoint sequences -> 3D poses.

Parity target: reference ``mmpose/models/pose_estimators/pose_lifter.py``
(356 LoC): backbone (TCN / transformer) over (B, K*D, T) sequences, a
temporal regression head for the 3D pose, optional trajectory head for the
global root. Decode (denormalize + root re-add) runs through the lifting
codec on the host.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from probpose_code_tpu.registry import MODELS


@MODELS.register_module()
class TemporalRegressionHead(nn.Module):
    """1x1 temporal conv -> (B, K, 3) pose (reference
    ``heads/regression_heads/temporal_regression_head.py``)."""

    in_channels: int
    num_joints: int
    loss: Any = None
    decoder: Any = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = False):
        x = feats[-1] if isinstance(feats, (tuple, list)) else feats  # (B, C, T)
        x = jnp.transpose(x, (0, 2, 1))
        x = nn.Conv(self.num_joints * 3, (1,), name="conv")(x)
        # use the (temporally central) last frame
        x = x[:, x.shape[1] // 2]
        return x.reshape(-1, self.num_joints, 3).astype(jnp.float32)


@MODELS.register_module()
class TrajectoryRegressionHead(TemporalRegressionHead):
    """Global-trajectory variant (root position), same topology."""


@MODELS.register_module()
class PoseLifter(nn.Module):
    backbone: nn.Module
    head: nn.Module
    neck: Optional[nn.Module] = None
    traj_backbone: Optional[nn.Module] = None
    traj_head: Optional[nn.Module] = None

    def __call__(self, inputs: jnp.ndarray, train: bool = False):
        """inputs: (B, K*D, T) keypoint sequences."""
        feats = self.backbone(inputs, train=train)
        if self.neck is not None:
            feats = self.neck(feats)
        out = self.head(feats, train=train)
        if self.traj_head is not None:
            traj_feats = self.traj_backbone(inputs, train=train) if self.traj_backbone is not None else feats
            traj = self.traj_head(traj_feats, train=train)
            return out, traj
        return out
