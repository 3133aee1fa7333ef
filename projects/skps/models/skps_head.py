"""SKPS head: heatmap branch + dense per-keypoint offset branch.

Parity target: reference ``projects/skps/models/skps_head.py`` — a single
final conv emits ``3K`` channels, split into K score heatmaps and 2K
x/y offset maps; training applies AdaptiveWing to the heatmaps (keypoint
weights) and to the offsets (gt heatmaps as soft spatial weights,
reference :168-187); decode reads the offset at the heatmap argmax.

TPU mapping: the conv tower is NHWC flax; predict is one jittable program
(argmax via ops.heatmap + offset gather), so the per-face decode loop of
the reference codec (:140-147) becomes a batched take_along_axis.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from probpose_code_tpu.registry import MODELS


@MODELS.register_module()
class SKPSHead(nn.Module):
    in_channels: int
    out_channels: int
    conv_out_channels: Optional[Sequence[int]] = None
    conv_kernel_sizes: Optional[Sequence[int]] = None
    heatmap_loss: Any = None
    offside_loss: Any = None
    decoder: Any = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
        x = feats[-1] if isinstance(feats, (tuple, list)) else feats
        if self.conv_out_channels:
            assert self.conv_kernel_sizes and len(self.conv_kernel_sizes) == len(self.conv_out_channels)
            for i, (c, k) in enumerate(zip(self.conv_out_channels, self.conv_kernel_sizes)):
                pad = (k - 1) // 2
                x = nn.Conv(c, (k, k), padding=((pad, pad), (pad, pad)), use_bias=False,
                            dtype=self.dtype, name=f"conv{i}")(x)
                x = nn.BatchNorm(use_running_average=not train, momentum=0.9, name=f"bn{i}")(x)
                x = nn.relu(x)
        x = nn.Conv(self.out_channels * 3, (1, 1), name="final_layer")(x)
        x = jnp.transpose(x.astype(jnp.float32), (0, 3, 1, 2))
        return x[:, : self.out_channels], x[:, self.out_channels :]


def skps_loss(outputs, batch, heatmap_loss, offside_loss) -> Dict[str, jnp.ndarray]:
    """Reference skps_head.py:168-196: AdaptiveWing(heatmaps, kpt weights)
    + mean of x/y AdaptiveWing(offsets, gt heatmaps as weights)."""
    pred_hm, pred_off = outputs
    gt_hm = batch["heatmaps"]
    gt_off = batch["displacements"]
    kw = batch.get("keypoint_weights")
    K = pred_hm.shape[1]
    loss_hm = heatmap_loss(pred_hm, gt_hm, kw)
    loss_x = offside_loss(pred_off[:, :K], gt_off[:, :K], gt_hm)
    loss_y = offside_loss(pred_off[:, K:], gt_off[:, K:], gt_hm)
    return {"loss_heatmap": loss_hm, "loss_offside": (loss_x + loss_y) / 2.0}


def skps_device_predict(outputs, input_size: Tuple[int, int]) -> Dict[str, jnp.ndarray]:
    """Jittable decode: heatmap argmax + offset at the argmax, scaled to the
    input frame (reference codec ``skps_heatmap.py:112-152``)."""
    from probpose_code_tpu.ops.heatmap import heatmap_maximum_batch

    pred_hm, pred_off = outputs
    B, K, H, W = pred_hm.shape
    locs, vals = heatmap_maximum_batch(pred_hm)  # (B, K, 2), (B, K)
    xi = jnp.clip(locs[..., 0].astype(jnp.int32), 0, W - 1)
    yi = jnp.clip(locs[..., 1].astype(jnp.int32), 0, H - 1)
    flat = pred_off.reshape(B, 2, K, H * W)
    idx = (yi * W + xi)[:, None, :, None]  # (B, 1, K, 1)
    off = jnp.take_along_axis(flat, idx, axis=3)[..., 0]  # (B, 2, K)
    base = jnp.where(locs < 0, 0.0, locs)
    kpts = base + jnp.stack([off[:, 0], off[:, 1]], axis=-1)
    scale = jnp.asarray([input_size[0] / W, input_size[1] / H], jnp.float32)
    return dict(keypoints=kpts * scale, keypoint_scores=vals)
