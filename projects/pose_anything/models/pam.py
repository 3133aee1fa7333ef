"""Pose Anything (PAM): category-agnostic few-shot keypoint detection.

TPU-native reimplementation of the reference project
``/root/reference/projects/pose_anything`` (``models/detectors/pam.py:17``,
``models/keypoint_heads/head.py:93``, ``models/utils/encoder_decoder.py``):

- a shared backbone (any registered backbone from the main zoo) encodes the
  query image and the support image;
- support keypoint tokens are read from the support feature map at the
  support keypoint locations (bilinear sampling — K points, host-cheap);
- a DETR-style decoder iteratively refines normalized query keypoint
  coordinates (sigmoid-space deltas per layer, like the reference's
  ``kpt_branch`` MLPs), attending to the flattened query feature map with a
  graph self-attention over the support skeleton adjacency;
- a similarity map (support tokens x query features) provides the auxiliary
  heatmap supervision of the reference (``with_heatmap_loss``).

Everything is a pure flax module — one jitted program for loss and predict;
no torch-style module surgery. Weight compatibility with the released PAM
checkpoints is NOT provided (the reference builds on torch Swin +
mmcv transformer layers); architecture and training/inference contracts are.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from probpose_code_tpu.registry import MODELS


def _sample_features(feat: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """Bilinear-sample (B, H, W, C) features at normalized points (B, K, 2).

    Points are in [0, 1] (x, y). Returns (B, K, C)."""
    B, H, W, C = feat.shape
    x = jnp.clip(points[..., 0], 0.0, 1.0) * (W - 1)
    y = jnp.clip(points[..., 1], 0.0, 1.0) * (H - 1)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)
    x1 = jnp.clip(x0 + 1, 0, W - 1)
    y1 = jnp.clip(y0 + 1, 0, H - 1)

    def gather(yy, xx):
        flat = feat.reshape(B, H * W, C)
        idx = yy * W + xx
        return jnp.take_along_axis(flat, idx[..., None], axis=1)

    v00 = gather(y0, x0)
    v01 = gather(y0, x1)
    v10 = gather(y1, x0)
    v11 = gather(y1, x1)
    top = v00 * (1 - fx) + v01 * fx
    bot = v10 * (1 - fx) + v11 * fx
    return top * (1 - fy) + bot * fy


def _inverse_sigmoid(x, eps=1e-3):
    x = jnp.clip(x, eps, 1 - eps)
    return jnp.log(x / (1 - x))


class GraphDecoderLayer(nn.Module):
    """Self-attention over keypoint tokens with skeleton-adjacency bias +
    cross-attention into the query feature map + FFN (pre-norm)."""

    dim: int
    num_heads: int = 8
    ffn_dim: int = 768
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tokens, memory, adj_bias, mask=None):
        # graph self-attention: additive adjacency bias on the logits
        h = nn.LayerNorm(name="norm1")(tokens)
        B, K, C = h.shape
        d = C // self.num_heads
        qkv = nn.Dense(3 * C, dtype=self.dtype, name="self_qkv")(h)
        q, k, v = jnp.split(qkv.reshape(B, K, 3, self.num_heads, d), 3, axis=2)
        q, k, v = q[:, :, 0], k[:, :, 0], v[:, :, 0]
        logits = jnp.einsum("bqhd,bkhd->bhqk", q * d**-0.5, k)
        logits = logits + adj_bias[:, None]  # (B, 1, K, K)
        attn = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(self.dtype)
        sa = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(B, K, C)
        tokens = tokens + nn.Dense(C, dtype=self.dtype, name="self_proj")(sa)

        # cross-attention into the flattened query feature map
        h = nn.LayerNorm(name="norm2")(tokens)
        qx = nn.Dense(C, dtype=self.dtype, name="cross_q")(h).reshape(B, K, self.num_heads, d)
        kx = nn.Dense(C, dtype=self.dtype, name="cross_k")(memory).reshape(B, -1, self.num_heads, d)
        vx = nn.Dense(C, dtype=self.dtype, name="cross_v")(memory).reshape(B, -1, self.num_heads, d)
        logits = jnp.einsum("bqhd,bnhd->bhqn", qx * d**-0.5, kx)
        attn = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(self.dtype)
        ca = jnp.einsum("bhqn,bnhd->bqhd", attn, vx).reshape(B, K, C)
        tokens = tokens + nn.Dense(C, dtype=self.dtype, name="cross_proj")(ca)

        h = nn.LayerNorm(name="norm3")(tokens)
        h = nn.Dense(self.ffn_dim, dtype=self.dtype, name="ffn1")(h)
        h = nn.gelu(h)
        tokens = tokens + nn.Dense(C, dtype=self.dtype, name="ffn2")(h)
        return tokens


@MODELS.register_module()
class GraphTransformerHead(nn.Module):
    """PAM keypoint head: support tokens -> iterative coordinate decoding.

    Outputs per decoder layer the refined normalized coordinates (for the
    layerwise L1 loss of the reference, ``head.py:get_loss``) plus the
    similarity heatmap (auxiliary heatmap loss).
    """

    in_channels: int
    embed_dims: int = 256
    num_layers: int = 3
    num_heads: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, query_feat, support_feat, support_kpts_norm, support_mask, adjacency):
        """
        Args:
            query_feat / support_feat: (B, H, W, C) backbone feature maps.
            support_kpts_norm: (B, K, 2) support keypoints in [0, 1].
            support_mask: (B, K) valid-keypoint mask.
            adjacency: (B, K, K) skeleton adjacency (1 = linked).
        Returns dict(coords=(L, B, K, 2) sigmoid coords per layer,
                     init_coords=(B, K, 2), similarity=(B, K, H, W)).
        """
        B, H, W, C = query_feat.shape
        memory = nn.Dense(self.embed_dims, dtype=self.dtype, name="input_proj")(
            query_feat.reshape(B, H * W, C)
        )
        # fixed 2D sine positional encoding on the memory
        memory = memory + _sine_pos_embed(H, W, self.embed_dims)[None]

        support_tokens = _sample_features(support_feat, support_kpts_norm)
        tokens = nn.Dense(self.embed_dims, dtype=self.dtype, name="query_proj")(support_tokens)
        tokens = tokens * support_mask[..., None]

        # similarity map: normalized support tokens x query features
        # (rsqrt(sum^2 + eps): norm's gradient is NaN at the exactly-zero
        # vectors produced by masked-out support keypoints)
        def _l2n(x):
            return x * jax.lax.rsqrt(jnp.sum(x * x, axis=-1, keepdims=True) + 1e-8)

        mem_n = _l2n(memory)
        tok_n = _l2n(tokens)
        similarity = jnp.einsum("bkc,bnc->bkn", tok_n, mem_n).reshape(B, -1, H, W)

        # initial proposals: soft-argmax of the similarity map (reference
        # initializes proposals from the similarity peaks)
        sim_flat = similarity.reshape(B, -1, H * W)
        weights = jax.nn.softmax(sim_flat * 10.0, axis=-1)
        xs = (jnp.arange(W, dtype=jnp.float32) + 0.5) / W
        ys = (jnp.arange(H, dtype=jnp.float32) + 0.5) / H
        grid = jnp.stack(jnp.meshgrid(xs, ys), axis=-1).reshape(H * W, 2)
        init_coords = jnp.einsum("bkn,nd->bkd", weights, grid)

        coords = init_coords
        outs = []
        for i in range(self.num_layers):
            pos = nn.Dense(self.embed_dims, dtype=self.dtype, name=f"coord_embed{i}")(coords)
            tokens = GraphDecoderLayer(
                self.embed_dims, self.num_heads, self.embed_dims * 3, dtype=self.dtype, name=f"layer{i}"
            )(tokens + pos, memory, _adj_to_bias(adjacency))
            delta = _mlp(tokens, self.embed_dims, 2, name_prefix=f"kpt_branch{i}")
            coords = jax.nn.sigmoid(_inverse_sigmoid(coords) + delta)
            outs.append(coords)
        return dict(coords=jnp.stack(outs), init_coords=init_coords, similarity=similarity)


def _mlp(x, hidden, out, name_prefix):
    h = nn.Dense(hidden, name=f"{name_prefix}_fc0")(x)
    h = nn.relu(h)
    h = nn.Dense(hidden, name=f"{name_prefix}_fc1")(h)
    h = nn.relu(h)
    return nn.Dense(out, name=f"{name_prefix}_fc2")(h)


def _adj_to_bias(adj: jnp.ndarray) -> jnp.ndarray:
    """Skeleton adjacency -> additive attention bias (log-space gate)."""
    a = adj + jnp.eye(adj.shape[-1])[None]
    return jnp.where(a > 0, 0.0, -4.0)


def _sine_pos_embed(H: int, W: int, dim: int) -> jnp.ndarray:
    """Fixed 2D sine/cosine positional encoding, (H*W, dim)."""
    d = dim // 4
    omega = 1.0 / (10000 ** (np.arange(d) / max(d, 1)))
    ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    out = np.concatenate(
        [
            np.sin(xs.reshape(-1, 1) * omega),
            np.cos(xs.reshape(-1, 1) * omega),
            np.sin(ys.reshape(-1, 1) * omega),
            np.cos(ys.reshape(-1, 1) * omega),
        ],
        axis=1,
    )
    if out.shape[1] < dim:
        out = np.pad(out, ((0, 0), (0, dim - out.shape[1])))
    return jnp.asarray(out[:, :dim], jnp.float32)


@MODELS.register_module()
class PoseAnythingModel(nn.Module):
    """Few-shot detector: shared backbone over query+support, PAM head."""

    backbone: nn.Module
    head: nn.Module

    def __call__(self, query_img, support_img, support_kpts_norm, support_mask, adjacency, train: bool = False):
        fq = self.backbone(query_img, train=train)
        fs = self.backbone(support_img, train=train)
        fq = fq[-1] if isinstance(fq, (tuple, list)) else fq
        fs = fs[-1] if isinstance(fs, (tuple, list)) else fs
        return self.head(fq, fs, support_kpts_norm, support_mask, adjacency)


def pose_anything_loss(outputs, batch, heatmap_loss_weight: float = 2.0):
    """Layerwise L1 on normalized coords + similarity-heatmap MSE.

    Mirrors the structure of reference ``head.py:get_loss:237-272``
    (per-layer ``l1_loss`` on sigmoid coords + ``heatmap_loss``)."""
    gt = batch["query_kpts_norm"]  # (B, K, 2) in [0, 1]
    w = batch["query_mask"]  # (B, K)
    coords = outputs["coords"]  # (L, B, K, 2)
    denom = jnp.maximum(w.sum(), 1.0)
    losses = {}
    total_l1 = 0.0
    for i in range(coords.shape[0]):
        l1 = (jnp.abs(coords[i] - gt).sum(-1) * w).sum() / denom
        losses[f"loss_layer{i}"] = l1
        total_l1 = total_l1 + l1
    init_l1 = (jnp.abs(outputs["init_coords"] - gt).sum(-1) * w).sum() / denom
    losses["loss_init"] = init_l1

    if "query_heatmaps" in batch:
        sim = outputs["similarity"]
        hm = batch["query_heatmaps"]
        losses["loss_heatmap"] = (
            ((sim - hm) ** 2).mean(axis=(2, 3)) * w
        ).sum() / denom * heatmap_loss_weight
    return losses
