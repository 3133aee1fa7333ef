"""ED-Pose: end-to-end DETR-style multi-person pose estimation.

Behavioral parity target: reference
``mmpose/models/heads/transformer_heads/edpose_head.py:522+`` — a two-stage
DETR head where encoder tokens propose human queries, a decoder refines
human boxes/scores, and each human query spawns per-keypoint queries that
regress keypoint positions (the "human-to-keypoint" group decoding,
:40-119). Training matches predictions to GT one-to-one (Hungarian).

TPU-native redesign (documented deviations):
* dense multi-head attention instead of deformable attention — deformable
  sampling is a gather-heavy pattern that maps poorly onto the MXU, while
  dense attention over the (static-size) token set is pure matmuls;
* the Hungarian assignment runs through ``jax.pure_callback`` on a
  static-shape cost matrix (GT padded to ``max_gt``), keeping the whole
  loss jittable;
* query denoising (num_dn) is omitted in this revision — it is a training
  throughput aid, not an inference-path feature.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from probpose_code_tpu.registry import MODELS
from probpose_code_tpu.models.backbones.transformers import Mlp
from probpose_code_tpu.models.utils.transformer import sine_pos_encoding_2d


class _DecoderLayer(nn.Module):
    dim: int
    num_heads: int = 8
    ffn_dim: int = 1024
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, q, memory, q_pos=None, m_pos=None):
        qq = q if q_pos is None else q + q_pos
        sa = nn.MultiHeadDotProductAttention(self.num_heads, qkv_features=self.dim, dtype=self.dtype,
                                             name="self_attn")(qq, qq, q)
        q = nn.LayerNorm(name="norm1")(q + sa)
        mm = memory if m_pos is None else memory + m_pos
        ca = nn.MultiHeadDotProductAttention(self.num_heads, qkv_features=self.dim, dtype=self.dtype,
                                             name="cross_attn")(q if q_pos is None else q + q_pos, mm, memory)
        q = nn.LayerNorm(name="norm2")(q + ca)
        return nn.LayerNorm(name="norm3")(q + Mlp(self.ffn_dim, self.dim, dtype=self.dtype, name="ffn")(q))


@MODELS.register_module()
class EDPoseHead(nn.Module):
    """Two-stage human + keypoint group decoder."""

    in_channels: int
    num_keypoints: int = 17
    embed_dims: int = 256
    num_queries: int = 100
    num_human_layers: int = 2
    num_keypoint_layers: int = 2
    num_heads: int = 8
    ffn_dim: int = 1024
    decoder: Any = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = False) -> Dict[str, jnp.ndarray]:
        x = feats[-1] if isinstance(feats, (tuple, list)) else feats  # (B, H, W, C)
        B, H, W, _ = x.shape
        memory = nn.Dense(self.embed_dims, dtype=self.dtype, name="input_proj")(x).reshape(B, H * W, -1)
        m_pos = jnp.asarray(sine_pos_encoding_2d(H, W, self.embed_dims // 2))[None]
        memory = nn.LayerNorm(name="memory_norm")(memory)

        # two-stage proposals: score every token, take top-k as human queries
        enc_logits = nn.Dense(1, dtype=self.dtype, name="enc_cls")(memory)[..., 0]  # (B, HW)
        enc_boxes = jax.nn.sigmoid(nn.Dense(4, dtype=self.dtype, name="enc_box")(memory))  # cxcywh in [0,1]
        k = min(self.num_queries, H * W)
        _, topk = jax.lax.top_k(enc_logits, k)
        gather = lambda a: jax.vmap(lambda t, i: t[i])(a, topk)
        q = jax.lax.stop_gradient(gather(memory))
        ref_boxes = gather(enc_boxes)
        q = q + self.param("human_query_embed", nn.initializers.normal(0.02), (1, 1, self.embed_dims))

        # human decoder
        for i in range(self.num_human_layers):
            q = _DecoderLayer(self.embed_dims, self.num_heads, self.ffn_dim, dtype=self.dtype,
                              name=f"human_layer{i}")(q, memory, m_pos=m_pos)
            ref_boxes = jax.nn.sigmoid(
                nn.Dense(4, dtype=self.dtype, name=f"box_refine{i}")(q)
                + jnp.log(ref_boxes / jnp.clip(1 - ref_boxes, 1e-6, None))
            )
        scores = nn.Dense(1, dtype=self.dtype, name="human_cls")(q)[..., 0]  # logits (B, Q)

        # keypoint group decoder: each human query spawns K keypoint queries
        kq_embed = self.param("kpt_query_embed", nn.initializers.normal(0.02),
                              (1, 1, self.num_keypoints, self.embed_dims))
        kq = q[:, :, None, :] + kq_embed  # (B, Q, K, C)
        kq = kq.reshape(B, k * self.num_keypoints, self.embed_dims)
        for i in range(self.num_keypoint_layers):
            kq = _DecoderLayer(self.embed_dims, self.num_heads, self.ffn_dim, dtype=self.dtype,
                               name=f"kpt_layer{i}")(kq, memory, m_pos=m_pos)
        kq = kq.reshape(B, k, self.num_keypoints, self.embed_dims)
        kpt_offsets = nn.Dense(2, dtype=self.dtype, name="kpt_reg")(kq)  # relative to box center
        kpt_vis = nn.Dense(1, dtype=self.dtype, name="kpt_vis")(kq)[..., 0]

        cx, cy, w, h = [ref_boxes[..., i] for i in range(4)]
        kpts = jnp.stack([
            cx[..., None] + jnp.tanh(kpt_offsets[..., 0]) * w[..., None],
            cy[..., None] + jnp.tanh(kpt_offsets[..., 1]) * h[..., None],
        ], axis=-1)  # normalized [0,1] image coords

        return dict(
            scores=scores.astype(jnp.float32),
            boxes=ref_boxes.astype(jnp.float32),  # cxcywh normalized
            keypoints=kpts.astype(jnp.float32),  # (B, Q, K, 2) normalized
            keypoint_scores=jax.nn.sigmoid(kpt_vis).astype(jnp.float32),
        )


def _hungarian(cost: np.ndarray) -> np.ndarray:
    """Row->col assignment (Q,) with -1 for unassigned; scipy LAP on host."""
    from scipy.optimize import linear_sum_assignment

    rows, cols = linear_sum_assignment(cost)
    out = np.full(cost.shape[0], -1, np.int32)
    out[rows] = cols.astype(np.int32)
    return out


def edpose_loss(
    outputs: Dict[str, jnp.ndarray],
    batch: Dict[str, jnp.ndarray],
    *,
    input_size: Tuple[int, int],
    oks_sigmas: Optional[np.ndarray] = None,
    cls_weight: float = 2.0,
    box_weight: float = 5.0,
    kpt_weight: float = 10.0,
) -> Dict[str, jnp.ndarray]:
    """One-to-one matched loss. GT padded to (B, G); Hungarian via
    pure_callback on the static (Q, G) cost (reference matches with the
    mmdet HungarianAssigner)."""
    W, Hh = input_size
    scale = jnp.asarray([W, Hh], jnp.float32)
    gt_boxes = batch["gt_bboxes"]  # (B, G, 4) xyxy pixels
    gt_c = (gt_boxes[..., :2] + gt_boxes[..., 2:]) / 2 / scale
    gt_wh = (gt_boxes[..., 2:] - gt_boxes[..., :2]) / scale
    gt_cxcywh = jnp.concatenate([gt_c, gt_wh], -1)
    gt_kpts = batch["gt_keypoints"] / scale  # (B, G, K, 2)
    gt_vis = batch["gt_keypoints_visible"]
    gt_valid = batch["gt_valid"].astype(jnp.float32)

    pb, pk = outputs["boxes"], outputs["keypoints"]
    Q, G = pb.shape[1], gt_boxes.shape[1]
    p_scores = jax.nn.sigmoid(outputs["scores"])

    box_cost = jnp.abs(pb[:, :, None] - gt_cxcywh[:, None]).sum(-1)  # (B, Q, G)
    kpt_cost = (jnp.abs(pk[:, :, None] - gt_kpts[:, None]).sum(-1) * gt_vis[:, None]).sum(-1) / jnp.clip(
        gt_vis.sum(-1)[:, None], 1.0, None
    )
    cls_cost = -p_scores[..., None]
    cost = cls_weight * cls_cost + box_weight * box_cost + kpt_weight * kpt_cost
    cost = jnp.where(gt_valid[:, None] > 0, cost, 1e6)

    assign = jax.pure_callback(
        lambda c: np.stack([_hungarian(ci) for ci in np.asarray(c)]),
        jax.ShapeDtypeStruct((cost.shape[0], Q), np.int32),
        jax.lax.stop_gradient(cost),
    )  # (B, Q) gt index or -1
    idx = jnp.clip(assign, 0, G - 1)
    matched_valid = jnp.take_along_axis(gt_valid, idx, 1) * (assign >= 0)

    tb = jnp.take_along_axis(gt_cxcywh, idx[..., None], 1)
    tk = jnp.take_along_axis(gt_kpts, idx[..., None, None], 1)
    tv = jnp.take_along_axis(gt_vis, idx[..., None], 1)

    num_pos = jnp.clip(matched_valid.sum(), 1.0, None)
    losses = {}
    # focal-ish BCE classification: matched queries positive
    logits = outputs["scores"]
    bce = jnp.clip(logits, 0, None) - logits * matched_valid + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    losses["loss_cls"] = bce.sum() / num_pos * cls_weight
    losses["loss_bbox"] = (jnp.abs(pb - tb).sum(-1) * matched_valid).sum() / num_pos * box_weight
    kd = jnp.abs(pk - tk).sum(-1) * tv
    losses["loss_keypoints"] = (kd.mean(-1) * matched_valid).sum() / num_pos * kpt_weight
    return losses


def edpose_device_predict(outputs: Dict[str, jnp.ndarray], input_size: Tuple[int, int]) -> Dict[str, jnp.ndarray]:
    """Scale normalized outputs to input pixels; host applies score_thr."""
    W, Hh = input_size
    scale = jnp.asarray([W, Hh], jnp.float32)
    boxes = outputs["boxes"]
    xy = (boxes[..., :2] - boxes[..., 2:] / 2) * scale
    xy2 = (boxes[..., :2] + boxes[..., 2:] / 2) * scale
    return dict(
        scores=jax.nn.sigmoid(outputs["scores"]),
        bboxes=jnp.concatenate([xy, xy2], -1),
        keypoints=outputs["keypoints"] * scale,
        keypoint_scores=outputs["keypoint_scores"],
    )
