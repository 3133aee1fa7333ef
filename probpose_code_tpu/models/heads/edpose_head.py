"""ED-Pose: end-to-end DETR-style multi-person pose estimation.

Behavioral parity target: reference
``mmpose/models/heads/transformer_heads/edpose_head.py:522+`` — a two-stage
DETR head where encoder tokens propose human queries, a decoder refines
human boxes/scores, and each human query spawns per-keypoint queries that
regress keypoint positions (the "human-to-keypoint" group decoding,
:40-119), trained with Hungarian one-to-one matching plus denoising (DN)
query groups.

TPU-native design:
* cross-attention is multi-scale deformable attention
  (``models/utils/deform_attn.py``): the reference's CUDA sampling kernel
  becomes four batched XLA gathers per level with static shapes;
* iterative reference refinement: human boxes and keypoint positions are
  re-estimated after every decoder layer via inverse-sigmoid updates;
* denoising queries: noised GT boxes enter as an extra query group with a
  self-attention mask that hides them from the matching queries; their
  outputs are supervised directly (known correspondence, no matching);
* the one-to-one assignment is an exact in-jit Hungarian
  (``ops/lap.py:hungarian_assign``, Jonker-Volgenant with lax loops) on a
  static-shape cost matrix (GT padded to ``max_gt``): TPU runtimes cannot
  service host callbacks inside a jitted step, so the reference's
  scipy-backed mmdet HungarianAssigner becomes an on-device solver
  (scipy-oracle-tested exact).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from probpose_code_tpu.registry import MODELS
from probpose_code_tpu.models.backbones.transformers import Mlp
from probpose_code_tpu.models.utils.deform_attn import MSDeformAttention
from probpose_code_tpu.ops.lap import hungarian_assign


def _inv_sigmoid(x, eps=1e-5):
    x = jnp.clip(x, eps, 1 - eps)
    return jnp.log(x / (1 - x))


class _DeformDecoderLayer(nn.Module):
    dim: int
    num_heads: int = 8
    ffn_dim: int = 1024
    num_points: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, q, ref_points, values, q_pos=None, self_attn_mask=None):
        qq = q if q_pos is None else q + q_pos
        sa = nn.MultiHeadDotProductAttention(
            self.num_heads, qkv_features=self.dim, dtype=self.dtype, name="self_attn"
        )(qq, qq, q, mask=self_attn_mask)
        q = nn.LayerNorm(name="norm1")(q + sa)
        ca = MSDeformAttention(self.dim, self.num_heads, self.num_points, dtype=self.dtype, name="cross_attn")(
            q if q_pos is None else q + q_pos, ref_points, values
        )
        q = nn.LayerNorm(name="norm2")(q + ca)
        return nn.LayerNorm(name="norm3")(q + Mlp(self.ffn_dim, self.dim, dtype=self.dtype, name="ffn")(q))


@MODELS.register_module()
class EDPoseTPUHead(nn.Module):
    """Two-stage human + keypoint group decoder with deformable attention.

    TPU-native trainable redesign of the reference EDPose (which is
    inference-only, ``edpose_head.py:1215-1219``). The reference-layout
    ``EDPoseHead`` that loads reference checkpoints lives in
    ``edpose_legacy.py``; this head keeps the trainable DN + Hungarian
    pipeline."""

    in_channels: int
    num_keypoints: int = 17
    embed_dims: int = 256
    num_queries: int = 100
    num_human_layers: int = 2
    num_keypoint_layers: int = 2
    num_heads: int = 8
    ffn_dim: int = 1024
    num_points: int = 4
    decoder: Any = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        feats,
        train: bool = False,
        dn_boxes: Optional[jnp.ndarray] = None,
        dn_valid: Optional[jnp.ndarray] = None,
    ) -> Dict[str, jnp.ndarray]:
        levels = list(feats) if isinstance(feats, (tuple, list)) else [feats]
        B = levels[0].shape[0]

        proj = nn.Dense(self.embed_dims, dtype=self.dtype, name="input_proj")
        values = [proj(v) for v in levels]  # (B, H_l, W_l, C) each
        flat = jnp.concatenate([v.reshape(B, -1, self.embed_dims) for v in values], axis=1)
        memory = nn.LayerNorm(name="memory_norm")(flat)

        # two-stage proposals: score every token, take top-k as human queries
        enc_logits = nn.Dense(1, dtype=self.dtype, name="enc_cls")(memory)[..., 0]  # (B, sumHW)
        enc_boxes = jax.nn.sigmoid(nn.Dense(4, dtype=self.dtype, name="enc_box")(memory))  # cxcywh [0,1]
        k = min(self.num_queries, memory.shape[1])
        _, topk = jax.lax.top_k(enc_logits, k)
        gather = lambda a: jax.vmap(lambda t, i: t[i])(a, topk)
        q = jax.lax.stop_gradient(gather(memory))
        ref_boxes = gather(enc_boxes)
        q = q + self.param("human_query_embed", nn.initializers.normal(0.02), (1, 1, self.embed_dims))

        # denoising group: noised GT boxes as extra queries, hidden from the
        # matching queries by the self-attention mask. DN params materialize
        # unconditionally so init() (which runs without DN) creates them and
        # the DN-enabled train step finds them in the same variable tree.
        dn_embed = self.param("dn_label_embed", nn.initializers.normal(0.02), (1, 1, self.embed_dims))
        dn_proj = nn.Dense(self.embed_dims, dtype=self.dtype, name="dn_box_proj")
        D = 0
        if dn_boxes is not None:
            D = dn_boxes.shape[1]
            dn_pos = dn_proj(dn_boxes)
            dn_q = jnp.broadcast_to(dn_embed, (B, D, self.embed_dims)) + dn_pos
            q = jnp.concatenate([dn_q, q], axis=1)
            ref_boxes = jnp.concatenate([dn_boxes, ref_boxes], axis=1)
            n = D + k
            # mask[i, j]: may query i attend to key j (True = attend)
            mask = np.ones((n, n), bool)
            mask[D:, :D] = False  # matching queries never see DN queries
            self_attn_mask = jnp.asarray(mask)[None, None]
        else:
            _ = dn_proj(jnp.zeros((1, 1, 4), self.dtype))  # materialize params; XLA DCEs the result
            self_attn_mask = None

        # human decoder with iterative box refinement; intermediate layers
        # emit aux outputs for deep supervision (reference EDPose supervises
        # every decoder layer, edpose_head.py loss_by_feat over all layers —
        # here the cls head is shared across layers and aux terms reuse the
        # final layer's Hungarian match)
        box_refine = nn.Dense(4, dtype=self.dtype, name="box_refine")
        human_cls = nn.Dense(1, dtype=self.dtype, name="human_cls")
        aux_boxes, aux_scores = [], []
        for i in range(self.num_human_layers):
            q = _DeformDecoderLayer(
                self.embed_dims, self.num_heads, self.ffn_dim, self.num_points, dtype=self.dtype,
                name=f"human_layer{i}",
            )(q, jax.lax.stop_gradient(ref_boxes), values, self_attn_mask=self_attn_mask)
            ref_boxes = jax.nn.sigmoid(box_refine(q) + _inv_sigmoid(ref_boxes))
            if train and i < self.num_human_layers - 1:
                aux_boxes.append(ref_boxes)
                aux_scores.append(human_cls(q)[..., 0])
        scores = human_cls(q)[..., 0]  # logits (B, D+Q)

        # keypoint group decoder: each human query spawns K keypoint queries
        # with per-layer reference refinement
        K = self.num_keypoints
        nq = q.shape[1]
        kq_embed = self.param("kpt_query_embed", nn.initializers.normal(0.02), (1, 1, K, self.embed_dims))
        kq = (q[:, :, None, :] + kq_embed).reshape(B, nq * K, self.embed_dims)
        # spread the initial keypoint references across the human box with a
        # learned per-keypoint offset (all-at-center starts make deformable
        # sampling degenerate: every keypoint query reads the same location
        # and the refinement collapses toward the box center)
        kpt_off = self.param("kpt_ref_offset", nn.initializers.normal(0.5), (1, 1, K, 2))
        ctr = ref_boxes[:, :, None, :2]
        half_wh = ref_boxes[:, :, None, 2:4] * 0.5
        ref_kpts = jnp.clip(ctr + jnp.tanh(kpt_off) * half_wh, 1e-4, 1 - 1e-4).reshape(B, nq * K, 2)
        kpt_refine = nn.Dense(2, dtype=self.dtype, name="kpt_refine")
        kpt_mask = None
        if D > 0:
            mk = np.ones((nq * K, nq * K), bool)
            mk[D * K:, : D * K] = False
            kpt_mask = jnp.asarray(mk)[None, None]
        aux_kpts = []
        for i in range(self.num_keypoint_layers):
            kq = _DeformDecoderLayer(
                self.embed_dims, self.num_heads, self.ffn_dim, self.num_points, dtype=self.dtype,
                name=f"kpt_layer{i}",
            )(kq, jax.lax.stop_gradient(ref_kpts), values, self_attn_mask=kpt_mask)
            ref_kpts = jax.nn.sigmoid(kpt_refine(kq) + _inv_sigmoid(ref_kpts))
            if train and i < self.num_keypoint_layers - 1:
                aux_kpts.append(ref_kpts.reshape(B, nq, K, 2))
        kpts = ref_kpts.reshape(B, nq, K, 2)
        kpt_vis = nn.Dense(1, dtype=self.dtype, name="kpt_vis")(kq)[..., 0].reshape(B, nq, K)

        out = dict(
            scores=scores[:, D:].astype(jnp.float32),
            boxes=ref_boxes[:, D:].astype(jnp.float32),  # cxcywh normalized
            keypoints=kpts[:, D:].astype(jnp.float32),  # (B, Q, K, 2) normalized
            keypoint_scores=jax.nn.sigmoid(kpt_vis[:, D:]).astype(jnp.float32),
            kpt_vis_logits=kpt_vis[:, D:].astype(jnp.float32),  # for the vis BCE
        )
        if D > 0:
            out.update(
                dn_scores=scores[:, :D].astype(jnp.float32),
                dn_boxes=ref_boxes[:, :D].astype(jnp.float32),
                dn_keypoints=kpts[:, :D].astype(jnp.float32),
            )
        if aux_boxes:
            # deep supervision (matching queries only; DN aux skipped)
            out["aux_boxes"] = jnp.stack(aux_boxes, 1)[:, :, D:].astype(jnp.float32)
            out["aux_scores"] = jnp.stack(aux_scores, 1)[:, :, D:].astype(jnp.float32)
        if aux_kpts:
            out["aux_keypoints"] = jnp.stack(aux_kpts, 1)[:, :, D:].astype(jnp.float32)
        return out


def make_dn_queries(
    gt_boxes: jnp.ndarray,
    gt_valid: jnp.ndarray,
    input_size: Tuple[int, int],
    rng: jax.Array,
    box_noise_scale: float = 0.4,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Noised normalized cxcywh boxes for one DN group (reference EDPose's
    label/box denoising with box_noise_scale, ``edpose_head.py`` DN setup).
    GT slots with ``gt_valid == 0`` get inert center boxes.
    """
    W, H = input_size
    scale = jnp.asarray([W, H], jnp.float32)
    c = (gt_boxes[..., :2] + gt_boxes[..., 2:]) / 2 / scale
    wh = jnp.clip((gt_boxes[..., 2:] - gt_boxes[..., :2]) / scale, 1e-4, None)
    r1, r2 = jax.random.split(rng)
    c_noise = (jax.random.uniform(r1, c.shape) * 2 - 1) * wh * 0.5 * box_noise_scale
    wh_noise = 1.0 + (jax.random.uniform(r2, wh.shape) * 2 - 1) * box_noise_scale
    dn = jnp.concatenate([c + c_noise, wh * wh_noise], axis=-1)
    dn = jnp.clip(dn, 1e-4, 1.0)
    inert = jnp.broadcast_to(jnp.asarray([0.5, 0.5, 0.1, 0.1]), dn.shape)
    return jnp.where(gt_valid[..., None] > 0, dn, inert), gt_valid


def edpose_loss(
    outputs: Dict[str, jnp.ndarray],
    batch: Dict[str, jnp.ndarray],
    *,
    input_size: Tuple[int, int],
    oks_sigmas: Optional[np.ndarray] = None,
    cls_weight: float = 2.0,
    box_weight: float = 5.0,
    kpt_weight: float = 10.0,
    dn_weight: float = 1.0,
) -> Dict[str, jnp.ndarray]:
    """One-to-one matched loss (+ DN terms when the head ran with DN).

    GT padded to (B, G); Hungarian via pure_callback on the static (Q, G)
    cost (reference matches with the mmdet HungarianAssigner). DN outputs
    have known correspondence (query d <-> GT d) and skip matching.
    """
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

    # exact one-to-one assignment fully on-device: TPU runtimes cannot
    # service a host callback (scipy Hungarian) inside the jitted train step
    assign = hungarian_assign(jax.lax.stop_gradient(cost), gt_valid)  # (B, Q) gt index or -1
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
    if "kpt_vis_logits" in outputs:
        # keypoint visibility BCE on matched queries — without it the
        # kpt_vis branch receives zero gradient and keypoint_scores stay
        # at their 0.5 init forever
        vl = outputs["kpt_vis_logits"]
        vt = (tv > 0).astype(jnp.float32)
        vbce = jnp.clip(vl, 0, None) - vl * vt + jnp.log1p(jnp.exp(-jnp.abs(vl)))
        losses["loss_kpt_vis"] = (vbce.mean(-1) * matched_valid).sum() / num_pos

    if "aux_boxes" in outputs:
        # deep supervision: every intermediate decoder layer gets the full
        # matched loss under the final layer's assignment (reference EDPose
        # supervises all decoder layers; the shared-match simplification
        # avoids per-layer Hungarian solves with no measured convergence cost)
        ab, asc = outputs["aux_boxes"], outputs["aux_scores"]  # (B, A, Q, 4/-)
        mv = matched_valid[:, None]
        abce = jnp.clip(asc, 0, None) - asc * mv + jnp.log1p(jnp.exp(-jnp.abs(asc)))
        losses["loss_aux_cls"] = abce.sum() / num_pos * cls_weight
        losses["loss_aux_bbox"] = (
            (jnp.abs(ab - tb[:, None]).sum(-1) * mv).sum() / num_pos * box_weight
        )
    if "aux_keypoints" in outputs:
        ak = outputs["aux_keypoints"]  # (B, A, Q, K, 2)
        akd = jnp.abs(ak - tk[:, None]).sum(-1) * tv[:, None]
        losses["loss_aux_keypoints"] = (
            (akd.mean(-1) * matched_valid[:, None]).sum() / num_pos * kpt_weight
        )
    if "dn_boxes" in outputs:
        # DN queries correspond 1:1 with (padded) GT slots
        dnb = outputs["dn_boxes"]
        dnk = outputs["dn_keypoints"]
        dns = outputs["dn_scores"]
        dn_valid = gt_valid[:, : dnb.shape[1]]
        num_dn = jnp.clip(dn_valid.sum(), 1.0, None)
        losses["loss_dn_cls"] = (
            (jnp.clip(dns, 0, None) - dns * dn_valid + jnp.log1p(jnp.exp(-jnp.abs(dns)))).sum()
            / num_dn * cls_weight * dn_weight
        )
        losses["loss_dn_bbox"] = (
            (jnp.abs(dnb - gt_cxcywh[:, : dnb.shape[1]]).sum(-1) * dn_valid).sum() / num_dn * box_weight * dn_weight
        )
        dkd = jnp.abs(dnk - gt_kpts[:, : dnk.shape[1]]).sum(-1) * gt_vis[:, : dnk.shape[1]]
        losses["loss_dn_keypoints"] = (dkd.mean(-1) * dn_valid).sum() / num_dn * kpt_weight * dn_weight
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
