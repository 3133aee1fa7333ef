"""Reference-layout ED-Pose head: loads reference checkpoints 1:1.

Behavioral parity target: reference
``mmpose/models/heads/transformer_heads/edpose_head.py`` (EDPoseHead =
DeformableDetrTransformerEncoder + EDPoseDecoder + EDPoseOutHead,
:522-1220) together with its building blocks
``transformers/deformable_detr_layers.py``, ``transformers/detr_layers.py``
and ``transformers/utils.py`` (FFN, PositionEmbeddingSineHW). The reference
head is inference-only (``edpose_head.py:1215-1219`` raises on ``loss``);
this module mirrors that — training lives in the TPU-native redesign
``EDPoseTPUHead`` (``edpose_head.py`` in this package).

Every torch submodule has a same-shaped flax counterpart so that
``engine.checkpoint.convert_torch_state_dict`` maps released ED-Pose
checkpoints onto this tree with forward parity (see
``tests/test_engine/test_edpose_conversion.py``):

* mmcv ``MultiScaleDeformableAttention`` -> :class:`MMDeformAttention`
  (four batched XLA gathers per level; the internal residual and the
  query_pos-added-to-query-only semantics are reproduced exactly);
* mmcv ``MultiheadAttention`` (torch MHA) -> :class:`TorchMHA` (fused
  in-proj Dense + manual softmax attention, identical arithmetic);
* mmcv ``FFN`` (residual inside) -> inlined two-Dense + residual;
* ``PositionEmbeddingSineHW`` / ``get_proposal_pos_embed`` -> closed-form
  jnp (full-valid masks: this port batches same-sized images without
  padding, so the reference's valid_ratios are identically 1).

Static-shape notes (TPU): the query-set expansion at
``num_box_decoder_layers`` (900 human queries -> num_group*(K+1)
box+keypoint queries, reference ``edpose_head.py:183-213``) changes the
query count mid-decoder, but both counts are compile-time constants, so the
whole forward jits as one program; the per-group self-attention masks are
precomputed numpy constants.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from probpose_code_tpu.registry import MODELS
from probpose_code_tpu.models.utils.deform_attn import bilinear_sample, _grid_bias_init


def _inv_sigmoid(x, eps=1e-3):
    # reference mmpose.models.utils.inverse_sigmoid (eps=1e-3 default)
    x = jnp.clip(x, 0.0, 1.0)
    x1 = jnp.clip(x, eps, None)
    x2 = jnp.clip(1 - x, eps, None)
    return jnp.log(x1 / x2)


class FFN3(nn.Module):
    """The DETR-style MLP from reference ``transformers/utils.py:11-47``:
    ``num_layers`` Linears with ReLU between (no residual)."""

    hidden_dim: int
    output_dim: int
    num_layers: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            out_dim = self.output_dim if i == self.num_layers - 1 else self.hidden_dim
            x = nn.Dense(out_dim, dtype=self.dtype, name=f"fc{i}")(x)
            if i < self.num_layers - 1:
                x = nn.relu(x)
        return x


class TorchMHA(nn.Module):
    """torch ``nn.MultiheadAttention`` arithmetic with a fused in-proj.

    Conversion: ``in_proj.kernel`` <- ``in_proj_weight.T``; mask convention
    follows torch (True = masked out)."""

    embed_dims: int
    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, q, k, v, attn_mask: Optional[jnp.ndarray] = None):
        C, h = self.embed_dims, self.num_heads
        hd = C // h
        B, Q, _ = q.shape
        Kn = k.shape[1]
        # fused in-proj applied piecewise (q/k/v may differ); slicing the
        # output columns selects the matching kernel/bias slices
        proj = nn.Dense(3 * C, dtype=self.dtype, name="in_proj")
        qp = proj(q)[..., :C]
        kp = proj(k)[..., C : 2 * C]
        vp = proj(v)[..., 2 * C :]
        qp = qp.reshape(B, Q, h, hd).transpose(0, 2, 1, 3) / math.sqrt(hd)
        kp = kp.reshape(B, Kn, h, hd).transpose(0, 2, 1, 3)
        vp = vp.reshape(B, Kn, h, hd).transpose(0, 2, 1, 3)
        logits = jnp.einsum("bhqd,bhkd->bhqk", qp, kp)
        if attn_mask is not None:
            # bool, True = not allowed (torch convention); shapes (Q, K) or
            # (B*h, Q, K) or (B, h, Q, K)
            m = attn_mask
            if m.ndim == 2:
                m = m[None, None]
            elif m.ndim == 3:
                m = m.reshape(B, h, Q, Kn)
            logits = jnp.where(m, -jnp.inf, logits)
        attn = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, vp).transpose(0, 2, 1, 3).reshape(B, Q, C)
        return nn.Dense(C, dtype=self.dtype, name="out_proj")(out)


class MMDeformAttention(nn.Module):
    """mmcv ``MultiScaleDeformableAttention`` semantics (batch_first).

    ``__call__(query, value_levels, reference_points, identity)``:
    query already includes query_pos (mmcv adds pos before the offset
    heads); ``identity`` is the pre-pos residual input. reference_points is
    (B, Q, L, 2) or (B, Q, L, 4) normalized. Returns identity + attended.
    Reference kernel: mmcv.ops.multi_scale_deform_attn (grid_sample
    align_corners=False, zeros padding) — here four batched gathers per
    level (``models/utils/deform_attn.py:25``).
    """

    embed_dims: int = 256
    num_heads: int = 8
    num_levels: int = 4
    num_points: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,
        value_levels: Sequence[jnp.ndarray],
        reference_points: jnp.ndarray,
        identity: jnp.ndarray,
    ) -> jnp.ndarray:
        B, Q, C = query.shape
        h, P, L = self.num_heads, self.num_points, self.num_levels
        assert len(value_levels) == L
        hd = C // h

        offsets = nn.Dense(
            h * L * P * 2, name="sampling_offsets",
            kernel_init=nn.initializers.zeros, bias_init=_grid_bias_init(h, L, P),
        )(query).reshape(B, Q, h, L, P, 2)
        attn = nn.Dense(h * L * P, name="attention_weights", kernel_init=nn.initializers.zeros)(query)
        attn = jax.nn.softmax(attn.reshape(B, Q, h, L * P), axis=-1).reshape(B, Q, h, L, P)

        value_proj = nn.Dense(C, dtype=self.dtype, name="value_proj")
        out = jnp.zeros((B, Q, h, hd), jnp.float32)
        for lvl, v in enumerate(value_levels):
            H_l, W_l = v.shape[1:3]
            vproj = value_proj(v).reshape(B, H_l, W_l, h, hd)
            wh = jnp.asarray([W_l, H_l], jnp.float32)
            off = offsets[:, :, :, lvl]  # (B, Q, h, P, 2)
            ref = reference_points[:, :, lvl]  # (B, Q, 2|4)
            if ref.shape[-1] == 4:
                loc = ref[:, :, None, None, :2] + off / P * ref[:, :, None, None, 2:4] * 0.5
            else:
                loc = ref[:, :, None, None, :] + off / wh
            loc_px = loc * wh - 0.5  # grid_sample align_corners=False
            vb = jnp.transpose(vproj, (0, 3, 1, 2, 4)).reshape(B * h, H_l, W_l, hd)
            lb = jnp.transpose(loc_px, (0, 2, 1, 3, 4)).reshape(B * h, Q * P, 2)
            sampled = bilinear_sample(vb, lb).reshape(B, h, Q, P, hd)
            sampled = jnp.transpose(sampled, (0, 2, 1, 3, 4))
            out = out + (sampled * attn[:, :, :, lvl, :, None]).sum(axis=3).astype(jnp.float32)

        out = nn.Dense(C, dtype=self.dtype, name="output_proj")(out.reshape(B, Q, C))
        return identity + out


def sine_pos_embed_hw(H: int, W: int, num_pos_feats: int, temp_h: float, temp_w: float) -> np.ndarray:
    """``PositionEmbeddingSineHW`` on a full-valid mask, channel-last (H, W,
    2*num_pos_feats). Reference ``transformers/utils.py:50-91`` with
    normalize=True (cumsum of ones -> row/col index + 1, scaled by 2pi)."""
    eps = 1e-6
    scale = 2 * math.pi
    y = (np.arange(1, H + 1, dtype=np.float32)[:, None] / (H + eps) * scale)  # (H, 1)
    x = (np.arange(1, W + 1, dtype=np.float32)[None, :] / (W + eps) * scale)  # (1, W)
    k = np.arange(num_pos_feats, dtype=np.float32)
    dim_tx = temp_w ** (2 * (k // 2) / num_pos_feats)
    dim_ty = temp_h ** (2 * (k // 2) / num_pos_feats)
    pos_x = np.broadcast_to(x[:, :, None], (H, W, num_pos_feats)) / dim_tx
    pos_y = np.broadcast_to(y[:, :, None], (H, W, num_pos_feats)) / dim_ty
    out_x = np.empty_like(pos_x)
    out_y = np.empty_like(pos_y)
    out_x[..., 0::2] = np.sin(pos_x[..., 0::2])
    out_x[..., 1::2] = np.cos(pos_x[..., 1::2])
    out_y[..., 0::2] = np.sin(pos_y[..., 0::2])
    out_y[..., 1::2] = np.cos(pos_y[..., 1::2])
    return np.concatenate([out_y, out_x], axis=-1)  # (H, W, 2*npf)


def proposal_pos_embed(pos: jnp.ndarray, num_pos_feats: int = 128, temperature: float = 10000.0) -> jnp.ndarray:
    """Sine embedding of (cx, cy, w, h) boxes -> (..., 4*num_pos_feats),
    ordered (y, x, w, h) like reference ``edpose_head.py:259-303``."""
    scale = 2 * math.pi
    k = np.arange(num_pos_feats, dtype=np.float32)
    dim_t = jnp.asarray(temperature ** (2 * (k // 2) / num_pos_feats))

    def embed(v):
        ang = v[..., None] * scale / dim_t
        even = jnp.sin(ang[..., 0::2])
        odd = jnp.cos(ang[..., 1::2])
        return jnp.stack([even, odd], axis=-1).reshape(*ang.shape[:-1], num_pos_feats)

    parts = [embed(pos[..., 1]), embed(pos[..., 0])]  # y, x
    if pos.shape[-1] == 4:
        parts += [embed(pos[..., 2]), embed(pos[..., 3])]  # w, h
    return jnp.concatenate(parts, axis=-1)


def _inference_group_mask(num_group: int, K: int) -> np.ndarray:
    """Self-attention mask for the expanded box+keypoint query set at
    inference (reference ``edpose_head.py:1040-1066``): every query attends
    within its (K+1)-sized group; box queries additionally attend to all
    other box queries. True = masked out (torch convention)."""
    n = num_group * (K + 1)
    mask = np.ones((n, n), dtype=bool)
    for g in range(num_group):
        s, e = g * (K + 1), (g + 1) * (K + 1)
        mask[s:e, s:e] = False
    box_cols = np.arange(0, n, K + 1)
    box_rows = np.arange(0, n, K + 1)
    mask[np.ix_(box_rows, box_cols)] = False
    return mask


@MODELS.register_module()
class EDPoseHead(nn.Module):
    """Reference-architecture ED-Pose head (inference path).

    Config schema mirrors the reference
    ``configs/body_2d_keypoint/edpose/coco/edpose_res50_8xb2-50e_coco-800x1333.py``:
    nested ``encoder`` / ``decoder`` / ``out_head`` / ``positional_encoding``
    dicts. ``data_decoder`` / ``denosing_cfg`` are runtime concerns handled
    by the PoseModel wrapper and accepted here for schema parity.

    Restriction shared with our batching model: all images in a batch share
    one input size (no padding masks), so the reference's valid_ratios are
    identically 1. Training raises, like the reference (use EDPoseTPUHead).
    """

    num_queries: int = 900
    num_feature_levels: int = 4
    num_keypoints: int = 17
    as_two_stage: bool = True
    encoder: Any = None
    decoder: Any = None
    out_head: Any = None
    positional_encoding: Any = None
    data_decoder: Any = None
    denosing_cfg: Any = None
    dec_pred_class_embed_share: bool = False
    dec_pred_bbox_embed_share: bool = False
    refine_queries_num: int = 100
    two_stage_keep_all_tokens: bool = False
    in_channels: Any = None  # accepted for config-surface compat; unused
    dtype: Any = jnp.float32

    def _cfg(self) -> Dict[str, Any]:
        enc = dict(self.encoder or {})
        dec = dict(self.decoder or {})
        out = dict(self.out_head or {})
        pe = dict(self.positional_encoding or {})
        enc_layer = dict(enc.get("layer_cfg") or {})
        dec_layer = dict(dec.get("layer_cfg") or {})
        enc_sa = dict(enc_layer.get("self_attn_cfg") or {})
        embed_dims = int(enc_sa.get("embed_dims", dec.get("embed_dims", 256)))
        num_dec = int(dec.get("num_layers", 6))
        cfg = dict(
            embed_dims=embed_dims,
            num_enc=int(enc.get("num_layers", 6)),
            num_dec=num_dec,
            enc_heads=int(enc_sa.get("num_heads", 8)),
            enc_points=int(enc_sa.get("num_points", 4)),
            enc_levels=int(enc_sa.get("num_levels", self.num_feature_levels)),
            enc_ffn=int((enc_layer.get("ffn_cfg") or {}).get("feedforward_channels", 1024)),
            dec_sa_heads=int((dec_layer.get("self_attn_cfg") or {}).get("num_heads", 8)),
            dec_ca_heads=int((dec_layer.get("cross_attn_cfg") or {}).get("num_heads", 8)),
            dec_ca_points=int((dec_layer.get("cross_attn_cfg") or {}).get("num_points", 4)),
            dec_ffn=int((dec_layer.get("ffn_cfg") or {}).get("feedforward_channels", 1024)),
            num_group=int(dec.get("num_group", 100)),
            num_box_dec=int(dec.get("num_box_decoder_layers", 2)),
            num_classes=int(out.get("num_classes", 2)),
            num_pred=int(out.get("num_pred_layer", num_dec)),
            pe_feats=int(pe.get("num_pos_feats", 128)),
            pe_temp_h=float(pe.get("temperatureH", 10000)),
            pe_temp_w=float(pe.get("temperatureW", 10000)),
        )
        return cfg

    # -- submodule builders (shared param names between enc/dec phases) ----

    def _enc_layer(self, i, c):
        name = f"encoder_layer{i}"
        sa = MMDeformAttention(
            c["embed_dims"], c["enc_heads"], c["enc_levels"], c["enc_points"],
            dtype=self.dtype, name=f"{name}_self_attn",
        )
        n0 = nn.LayerNorm(name=f"{name}_norm0")
        fc1 = nn.Dense(c["enc_ffn"], dtype=self.dtype, name=f"{name}_ffn_fc1")
        fc2 = nn.Dense(c["embed_dims"], dtype=self.dtype, name=f"{name}_ffn_fc2")
        n1 = nn.LayerNorm(name=f"{name}_norm1")
        return sa, n0, fc1, fc2, n1

    def _dec_layer(self, i, c):
        name = f"decoder_layer{i}"
        sa = TorchMHA(c["embed_dims"], c["dec_sa_heads"], dtype=self.dtype, name=f"{name}_self_attn")
        ca = MMDeformAttention(
            c["embed_dims"], c["dec_ca_heads"], c["enc_levels"], c["dec_ca_points"],
            dtype=self.dtype, name=f"{name}_cross_attn",
        )
        norms = [nn.LayerNorm(name=f"{name}_norm{j}") for j in range(3)]
        fc1 = nn.Dense(c["dec_ffn"], dtype=self.dtype, name=f"{name}_ffn_fc1")
        fc2 = nn.Dense(c["embed_dims"], dtype=self.dtype, name=f"{name}_ffn_fc2")
        return sa, ca, norms, fc1, fc2

    @nn.compact
    def __call__(self, feats, train: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        if train:
            raise NotImplementedError(
                "EDPoseHead training is not supported (parity with reference "
                "edpose_head.py:1215); use EDPoseTPUHead for training."
            )
        c = self._cfg()
        C = c["embed_dims"]
        K = self.num_keypoints
        levels = list(feats) if isinstance(feats, (tuple, list)) else [feats]
        assert len(levels) == self.num_feature_levels, (
            f"expected {self.num_feature_levels} feature levels, got {len(levels)}"
        )
        B = levels[0].shape[0]
        shapes = [(v.shape[1], v.shape[2]) for v in levels]

        # ---- pre_transformer: flatten + sine pos + level embeds ----------
        level_embed = self.param("level_embed", nn.initializers.normal(1.0), (self.num_feature_levels, C))
        flat = jnp.concatenate([v.reshape(B, -1, C) for v in levels], axis=1)
        pos_parts = []
        for lvl, (H_l, W_l) in enumerate(shapes):
            pe = sine_pos_embed_hw(H_l, W_l, c["pe_feats"], c["pe_temp_h"], c["pe_temp_w"])
            pos_parts.append(jnp.asarray(pe.reshape(-1, C)) + level_embed[lvl])
        pos_flat = jnp.concatenate(pos_parts, axis=0)[None]  # (1, sumHW, C)

        # encoder reference points: own normalized center at every level
        ref_parts = []
        for H_l, W_l in shapes:
            ys = (np.arange(H_l, dtype=np.float32) + 0.5) / H_l
            xs = (np.arange(W_l, dtype=np.float32) + 0.5) / W_l
            gx, gy = np.meshgrid(xs, ys)
            ref_parts.append(np.stack([gx.reshape(-1), gy.reshape(-1)], -1))
        enc_ref = jnp.asarray(np.concatenate(ref_parts, axis=0))  # (sumHW, 2)
        enc_ref = jnp.broadcast_to(
            enc_ref[None, :, None, :], (B, enc_ref.shape[0], self.num_feature_levels, 2)
        )

        # ---- encoder ------------------------------------------------------
        def split_levels(x):
            outs, s = [], 0
            for H_l, W_l in shapes:
                outs.append(x[:, s : s + H_l * W_l].reshape(B, H_l, W_l, C))
                s += H_l * W_l
            return outs

        memory = flat
        for i in range(c["num_enc"]):
            sa, n0, fc1, fc2, n1 = self._enc_layer(i, c)
            q = memory + pos_flat
            memory = sa(q, split_levels(memory), enc_ref, memory)
            memory = n0(memory)
            memory = n1(memory + fc2(nn.relu(fc1(memory))))

        # ---- two-stage proposals (gen_encoder_output_proposals) ----------
        assert self.as_two_stage, "only the two-stage variant is released/supported"
        prop_parts, valid_parts = [], []
        for lvl, (H_l, W_l) in enumerate(shapes):
            ys = (np.arange(H_l, dtype=np.float32) + 0.5) / H_l
            xs = (np.arange(W_l, dtype=np.float32) + 0.5) / W_l
            gx, gy = np.meshgrid(xs, ys)
            wh = np.full_like(gx, 0.05 * (2.0 ** lvl))
            p = np.stack([gx, gy, wh, wh], -1).reshape(-1, 4)
            prop_parts.append(p)
            valid_parts.append(((p > 0.01) & (p < 0.99)).all(-1))
        proposals = np.concatenate(prop_parts, 0)
        prop_valid = np.concatenate(valid_parts, 0)
        # inverse_sigmoid of proposals with the reference's masked +inf
        un_prop = np.log(np.clip(proposals, 1e-3, None) / np.clip(1 - proposals, 1e-3, None))
        un_prop = np.where(prop_valid[:, None], un_prop, np.inf).astype(np.float32)
        out_mem = jnp.where(jnp.asarray(prop_valid)[None, :, None], memory, 0.0)
        out_mem = nn.Dense(C, dtype=self.dtype, name="memory_trans_fc")(out_mem)
        out_mem = nn.LayerNorm(name="memory_trans_norm")(out_mem)

        enc_cls = nn.Dense(c["num_classes"], dtype=self.dtype, name="enc_out_class_embed")(out_mem)
        enc_delta = FFN3(C, 4, dtype=self.dtype, name="enc_out_bbox_embed")(out_mem)
        enc_unact = enc_delta + jnp.asarray(un_prop)[None]

        kq = min(self.num_queries, out_mem.shape[1])
        _, topk = jax.lax.top_k(enc_cls.max(-1), kq)
        gather = lambda a: jnp.take_along_axis(a, topk[..., None], axis=1)  # noqa: E731
        ref_boxes = jax.nn.sigmoid(jax.lax.stop_gradient(gather(enc_unact)))
        query = jax.lax.stop_gradient(gather(out_mem))

        # ---- decoder ------------------------------------------------------
        ref_point_head_fc0 = nn.Dense(C, dtype=self.dtype, name="ref_point_head_fc0")
        ref_point_head_fc1 = nn.Dense(C, dtype=self.dtype, name="ref_point_head_fc1")
        dec_norm = nn.LayerNorm(name="decoder_norm")
        hw = self.param("hw", nn.initializers.normal(1.0), (K, 2))
        keypoint_embed = self.param("keypoint_embed", nn.initializers.normal(1.0), (K, C))

        num_pred = c["num_pred"]
        bbox_embeds = [FFN3(C, 4, dtype=self.dtype, name=f"bbox_embed{i}") for i in range(num_pred)]
        class_embeds = [
            nn.Dense(c["num_classes"], dtype=self.dtype, name=f"class_embed{i}") for i in range(num_pred)
        ]
        n_pose = num_pred - c["num_box_dec"] + (1 if K == 17 else 0)
        pose_embeds = [FFN3(C, 2, dtype=self.dtype, name=f"pose_embed{i}") for i in range(n_pose)]
        pose_hw_embed = FFN3(C, 2, dtype=self.dtype, name="pose_hw_embed")

        G = c["num_group"]
        nbd = c["num_box_dec"]
        kpt_rows = np.asarray([x for x in range(G * (K + 1)) if x % (K + 1) != 0])
        box_rows = np.arange(0, G * (K + 1), K + 1)
        expand_mask = jnp.asarray(_inference_group_mask(G, K))

        output = query
        refs = [ref_boxes]
        attn_mask = None
        inter = []
        mem_levels = split_levels(memory)
        new_ref = ref_boxes
        for layer_id in range(c["num_dec"]):
            ref = refs[-1]
            nq = output.shape[1]
            ref_input = jnp.broadcast_to(
                ref[:, :, None, :], (B, nq, self.num_feature_levels, 4)
            )  # valid_ratios == 1
            sine = proposal_pos_embed(ref, num_pos_feats=C // 2)
            qpos = ref_point_head_fc1(nn.relu(ref_point_head_fc0(sine)))

            sa, ca, norms, fc1, fc2 = self._dec_layer(layer_id, c)
            qk = output + qpos
            output = output + sa(qk, qk, output, attn_mask=attn_mask)
            output = norms[0](output)
            output = ca(output + qpos, mem_levels, ref_input, output)
            output = norms[1](output)
            output = norms[2](output + fc2(nn.relu(fc1(output))))
            inter.append(dec_norm(output))

            if layer_id < nbd:
                new_ref = jax.nn.sigmoid(bbox_embeds[layer_id](output) + _inv_sigmoid(ref))

            if layer_id == nbd - 1:
                # query expansion: top-num_group humans spawn keypoint queries
                cls = class_embeds[layer_id](output)
                _, topg = jax.lax.top_k(cls.max(-1), G)
                gat = lambda a: jnp.take_along_axis(a, topg[..., None], axis=1)  # noqa: E731
                ref_box = gat(new_ref)
                out_box = gat(output)
                out_kpt = out_box[:, :, None, :] + keypoint_embed[None, None]
                pe_idx = len(pose_embeds) - 1 if K == 17 else 0
                delta_xy = pose_embeds[pe_idx](out_kpt)[..., :2]
                kpt_xy = jax.nn.sigmoid(_inv_sigmoid(ref_box[..., :2])[:, :, None] + delta_xy)
                kpt_wh = jax.nn.sigmoid(hw)[None, None] * ref_box[..., 2:][:, :, None]
                kpt_ref = jnp.concatenate([kpt_xy, kpt_wh], -1)  # (B, G, K, 4)
                new_ref = jnp.concatenate([ref_box[:, :, None], kpt_ref], axis=2).reshape(B, G * (K + 1), 4)
                output = jnp.concatenate([out_box[:, :, None], out_kpt], axis=2).reshape(B, G * (K + 1), C)
                attn_mask = expand_mask

            if layer_id >= nbd:
                box_out = output[:, box_rows]
                new_box = jax.nn.sigmoid(bbox_embeds[layer_id](box_out) + _inv_sigmoid(ref[:, box_rows]))
                kpt_out = output[:, kpt_rows]
                dxy = pose_embeds[layer_id - nbd](kpt_out)
                dhw = pose_hw_embed(kpt_out)
                unsig = _inv_sigmoid(ref[:, kpt_rows])
                new_kpt = jax.nn.sigmoid(
                    jnp.concatenate([unsig[..., :2] + dxy[..., :2], unsig[..., 2:] + dhw], -1)
                ).reshape(B, G, K, 4)
                new_ref = jnp.concatenate([new_box[:, :, None], new_kpt], axis=2).reshape(B, G * (K + 1), 4)

            refs.append(jax.lax.stop_gradient(new_ref))

        # ---- out head (reference EDPoseOutHead.forward, :412-506): per-layer
        # class/box/pose outputs from (hidden_states, reference entering the
        # layer) — the 'look forward twice' scheme; inference returns the
        # last layer's outputs, XLA dead-code-eliminates the rest (the loop
        # still instantiates every class/bbox embed so the converted
        # checkpoint's full parameter set exists in the tree)
        cls_list, box_list, kpt_list = [], [], []
        for lid in range(c["num_dec"]):
            hs, ref_in = inter[lid], refs[lid]
            if lid < nbd:
                cls_list.append(class_embeds[lid](hs).astype(jnp.float32))
                box_list.append(
                    jax.nn.sigmoid(bbox_embeds[lid](hs) + _inv_sigmoid(ref_in)).astype(jnp.float32)
                )
                kpt_list.append(jnp.zeros((B, hs.shape[1], K * 3), jnp.float32))
            else:
                box_hs = hs[:, box_rows]
                cls_list.append(class_embeds[lid](box_hs).astype(jnp.float32))
                box_list.append(
                    jax.nn.sigmoid(
                        bbox_embeds[lid](box_hs) + _inv_sigmoid(ref_in[:, box_rows])
                    ).astype(jnp.float32)
                )
                kpt_hs = hs[:, kpt_rows]
                dxy = pose_embeds[lid - nbd](kpt_hs)
                kpt_xy = jax.nn.sigmoid(dxy + _inv_sigmoid(ref_in[:, kpt_rows][..., :2]))
                vis = jnp.full(kpt_xy.shape[:-1] + (1,), jax.nn.sigmoid(1.0))
                kpts = jnp.concatenate([kpt_xy, vis], axis=-1).reshape(B, G, K, 3)
                # xyzxyz -> xyxy..zz (reference keypoint_xyzxyz_to_xyxyzz)
                kpt_list.append(
                    jnp.concatenate(
                        [kpts[..., :2].reshape(B, G, K * 2), kpts[..., 2].reshape(B, G, K)], axis=-1
                    ).astype(jnp.float32)
                )
        return cls_list[-1], box_list[-1], kpt_list[-1]
