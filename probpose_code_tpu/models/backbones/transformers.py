"""Transformer backbones: SwinTransformer, PVT, DSTFormer.

Behavioral parity targets (reference ``mmpose/models/backbones/``):
- swin.py:28-732 — windowed MSA with relative position bias, cyclic
  shifts, patch merging between stages
- pvt.py:30-559 — pyramid ViT with spatial-reduction attention
- dstformer.py:1-298 — MotionBERT dual-stream spatial/temporal
  transformer over (B, T, K, C) keypoint sequences

TPU notes: window partitioning is pure reshape/transpose (layout-free for
XLA); the cyclic shift uses jnp.roll; attention runs in f32 accumulation.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from probpose_code_tpu.registry import MODELS


class Mlp(nn.Module):
    hidden: int
    out: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        return nn.Dense(self.out, dtype=self.dtype, name="fc2")(x)


class WindowAttention(nn.Module):
    """W-MSA with relative position bias (reference ``swin.py:28-126``)."""

    dim: int
    num_heads: int
    window_size: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None):
        # x: (nW*B, N, C), N = ws*ws
        ws = self.window_size
        B_, N, C = x.shape
        hd = C // self.num_heads
        qkv = nn.Dense(3 * C, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(B_, N, 3, self.num_heads, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q * hd**-0.5) @ k.transpose(0, 1, 3, 2)  # (B_, H, N, N)

        rpb_table = self.param(
            "relative_position_bias_table", nn.initializers.truncated_normal(0.02),
            ((2 * ws - 1) * (2 * ws - 1), self.num_heads),
        )
        coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij")).reshape(2, -1)
        rel = coords[:, :, None] - coords[:, None, :]
        rel = (rel + ws - 1)
        idx = rel[0] * (2 * ws - 1) + rel[1]  # (N, N)
        bias = rpb_table[jnp.asarray(idx.reshape(-1))].reshape(N, N, self.num_heads)
        attn = attn + bias.transpose(2, 0, 1)[None]
        if mask is not None:
            nW = mask.shape[0]
            attn = attn.reshape(B_ // nW, nW, self.num_heads, N, N) + mask[None, :, None]
            attn = attn.reshape(-1, self.num_heads, N, N)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(x.dtype)
        out = (attn @ v).transpose(0, 2, 1, 3).reshape(B_, N, C)
        return nn.Dense(C, dtype=self.dtype, name="proj")(out)


def window_partition(x, ws):
    B, H, W, C = x.shape
    x = x.reshape(B, H // ws, ws, W // ws, ws, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, C)


def window_reverse(wins, ws, H, W):
    B = wins.shape[0] // ((H // ws) * (W // ws))
    x = wins.reshape(B, H // ws, W // ws, ws, ws, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H, W, -1)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int = 7
    shift: int = 0
    mlp_ratio: float = 4.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x: (B, H, W, C)
        B, H, W, C = x.shape
        ws = min(self.window_size, H, W)
        shift = self.shift if ws < min(H, W) or self.shift < ws else 0
        shortcut = x
        y = nn.LayerNorm(name="norm1")(x)
        pad_b = (ws - H % ws) % ws
        pad_r = (ws - W % ws) % ws
        y = jnp.pad(y, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        Hp, Wp = H + pad_b, W + pad_r
        attn_mask = None
        if shift > 0:
            y = jnp.roll(y, (-shift, -shift), axis=(1, 2))
            # attention mask distinguishing the 9 shifted regions
            img_mask = np.zeros((1, Hp, Wp, 1), np.float32)
            cnt = 0
            for h_sl in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
                for w_sl in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
                    img_mask[:, h_sl, w_sl] = cnt
                    cnt += 1
            mw = window_partition(jnp.asarray(img_mask), ws)[..., 0]  # (nW, N)
            attn_mask = jnp.where(mw[:, None, :] == mw[:, :, None], 0.0, -100.0)
        wins = window_partition(y, ws)
        wins = WindowAttention(C, self.num_heads, ws, dtype=self.dtype, name="attn")(wins, attn_mask)
        y = window_reverse(wins, ws, Hp, Wp)
        if shift > 0:
            y = jnp.roll(y, (shift, shift), axis=(1, 2))
        y = y[:, :H, :W]
        x = shortcut + y
        y = nn.LayerNorm(name="norm2")(x)
        return x + Mlp(int(C * self.mlp_ratio), C, dtype=self.dtype, name="mlp")(y)


@MODELS.register_module()
class SwinTransformer(nn.Module):
    """Swin (reference ``swin.py:331-732``). Returns NHWC maps at
    ``out_indices`` (stride 4/8/16/32)."""

    embed_dims: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: int = 7
    mlp_ratio: float = 4.0
    out_indices: Sequence[int] = (3,)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.embed_dims, (4, 4), strides=(4, 4), dtype=self.dtype, name="patch_embed")(x)
        x = nn.LayerNorm(name="patch_norm")(x)
        outs = []
        dim = self.embed_dims
        for i, depth in enumerate(self.depths):
            for b in range(depth):
                x = SwinBlock(dim, self.num_heads[i], self.window_size,
                              shift=0 if b % 2 == 0 else self.window_size // 2,
                              mlp_ratio=self.mlp_ratio, dtype=self.dtype, name=f"stage{i}_block{b}")(x)
            if i in self.out_indices:
                outs.append(nn.LayerNorm(name=f"out_norm{i}")(x).astype(jnp.float32))
            if i < len(self.depths) - 1:
                # patch merging: 2x2 neighborhood -> 2*dim (pad odd dims)
                B, H, W, C = x.shape
                x = jnp.pad(x, ((0, 0), (0, H % 2), (0, W % 2), (0, 0)))
                x = jnp.concatenate(
                    [x[:, 0::2, 0::2], x[:, 1::2, 0::2], x[:, 0::2, 1::2], x[:, 1::2, 1::2]], axis=-1
                )
                x = nn.LayerNorm(name=f"merge_norm{i}")(x)
                x = nn.Dense(2 * dim, use_bias=False, dtype=self.dtype, name=f"merge_reduction{i}")(x)
                dim *= 2
        return tuple(outs)


class SRAttention(nn.Module):
    """Spatial-reduction attention (reference ``pvt.py:100-210``)."""

    dim: int
    num_heads: int
    sr_ratio: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, hw: Tuple[int, int]):
        B, N, C = x.shape
        H, W = hw
        hd = C // self.num_heads
        q = nn.Dense(C, dtype=self.dtype, name="q")(x).reshape(B, N, self.num_heads, hd)
        kv_in = x
        if self.sr_ratio > 1:
            fm = x.reshape(B, H, W, C)
            fm = nn.Conv(C, (self.sr_ratio, self.sr_ratio), strides=(self.sr_ratio, self.sr_ratio),
                         dtype=self.dtype, name="sr")(fm)
            kv_in = nn.LayerNorm(name="sr_norm")(fm.reshape(B, -1, C))
        kv = nn.Dense(2 * C, dtype=self.dtype, name="kv")(kv_in).reshape(B, -1, 2, self.num_heads, hd)
        k, v = kv[:, :, 0], kv[:, :, 1]
        attn = jnp.einsum("bnhd,bmhd->bhnm", q, k) * hd**-0.5
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(x.dtype)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(B, N, C)
        return nn.Dense(C, dtype=self.dtype, name="proj")(out)


class MixFFN(nn.Module):
    """PVT FFN with an optional 3x3 depthwise conv between the two
    projections, encoding positional information (reference
    ``pvt.py:22-91``). Operates on (B, N, C) tokens with their ``hw``."""

    hidden: int
    out: int
    use_conv: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, hw: Tuple[int, int]):
        B, N, C = x.shape
        x = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        if self.use_conv:
            H, W = hw
            fm = x.reshape(B, H, W, self.hidden)
            fm = nn.Conv(self.hidden, (3, 3), feature_group_count=self.hidden,
                         dtype=self.dtype, name="dwconv")(fm)
            x = fm.reshape(B, N, self.hidden)
        x = nn.gelu(x, approximate=False)
        return nn.Dense(self.out, dtype=self.dtype, name="fc2")(x)


@MODELS.register_module()
class PyramidVisionTransformer(nn.Module):
    """PVT (reference ``pvt.py:214-559``).

    ``embed_dims`` follows the reference schema: a scalar base dim whose
    per-stage width is ``embed_dims * num_heads[i]`` — a full per-stage
    tuple is also accepted.
    """

    embed_dims: Any = (64, 128, 320, 512)
    num_layers: Sequence[int] = (3, 4, 6, 3)
    num_heads: Sequence[int] = (1, 2, 5, 8)
    sr_ratios: Sequence[int] = (8, 4, 2, 1)
    mlp_ratios: Sequence[int] = (8, 8, 4, 4)
    patch_sizes: Sequence[int] = (4, 2, 2, 2)
    strides: Sequence[int] = (4, 2, 2, 2)
    paddings: Sequence[int] = (0, 0, 0, 0)
    out_indices: Sequence[int] = (0, 1, 2, 3)
    use_abs_pos_embed: bool = True
    norm_after_stage: bool = False
    use_conv_ffn: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        outs = []
        for i in range(len(self.num_layers)):
            if isinstance(self.embed_dims, int):
                dim = self.embed_dims * self.num_heads[i]
            else:
                dim = self.embed_dims[i]
            p, s, pad = self.patch_sizes[i], self.strides[i], self.paddings[i]
            x = nn.Conv(dim, (p, p), strides=(s, s),
                        padding=((pad, pad), (pad, pad)) if pad else "VALID",
                        dtype=self.dtype, name=f"patch_embed{i}")(x)
            B, H, W, C = x.shape
            t = nn.LayerNorm(name=f"embed_norm{i}")(x.reshape(B, H * W, C))
            if self.use_abs_pos_embed:
                pos = self.param(f"pos_embed{i}", nn.initializers.truncated_normal(0.02), (1, H * W, C))
                t = t + pos
            for b in range(self.num_layers[i]):
                y = nn.LayerNorm(name=f"s{i}_b{b}_norm1")(t)
                t = t + SRAttention(C, self.num_heads[i], self.sr_ratios[i], dtype=self.dtype,
                                    name=f"s{i}_b{b}_attn")(y, (H, W))
                y = nn.LayerNorm(name=f"s{i}_b{b}_norm2")(t)
                t = t + MixFFN(C * self.mlp_ratios[i], C, use_conv=self.use_conv_ffn,
                               dtype=self.dtype, name=f"s{i}_b{b}_mlp")(y, (H, W))
            if self.norm_after_stage:
                t = nn.LayerNorm(name=f"stage_norm{i}")(t)
            x = t.reshape(B, H, W, C)
            if i in self.out_indices:
                outs.append(x.astype(jnp.float32))
        return tuple(outs)


@MODELS.register_module()
class PyramidVisionTransformerV2(PyramidVisionTransformer):
    """PVTv2 (reference ``pvt.py:547-559``): overlapping patch embeds
    (7/3/3/3 kernels with 3/1/1/1 padding), no absolute position embedding,
    depthwise-conv FFN, and a LayerNorm after every stage."""

    embed_dims: Any = 64
    patch_sizes: Sequence[int] = (7, 3, 3, 3)
    paddings: Sequence[int] = (3, 1, 1, 1)
    use_abs_pos_embed: bool = False
    norm_after_stage: bool = True
    use_conv_ffn: bool = True


class _AttnND(nn.Module):
    """MHSA over one axis of (B, T, K, C): 'spatial' (K) or 'temporal' (T)."""

    dim: int
    num_heads: int
    mode: str
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, T, K, C = x.shape
        if self.mode == "spatial":
            t = x.reshape(B * T, K, C)
        else:
            t = x.transpose(0, 2, 1, 3).reshape(B * K, T, C)
        hd = C // self.num_heads
        qkv = nn.Dense(3 * C, dtype=self.dtype, name="qkv")(t).reshape(t.shape[0], t.shape[1], 3, self.num_heads, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        attn = jnp.einsum("bnhd,bmhd->bhnm", q, k) * hd**-0.5
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(t.dtype)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(t.shape[0], t.shape[1], C)
        out = nn.Dense(C, dtype=self.dtype, name="proj")(out)
        if self.mode == "spatial":
            return out.reshape(B, T, K, C)
        return out.reshape(B, K, T, C).transpose(0, 2, 1, 3)


class DSTBlock(nn.Module):
    """Dual-stream block (reference ``dstformer.py``): stream ST and stream
    TS, fused by learned per-position weights."""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        def stream(y, order, tag):
            for mode in order:
                z = nn.LayerNorm(name=f"{tag}_{mode}_norm")(y)
                y = y + _AttnND(self.dim, self.num_heads, mode, dtype=self.dtype, name=f"{tag}_{mode}_attn")(z)
            z = nn.LayerNorm(name=f"{tag}_mlp_norm")(y)
            return y + Mlp(int(self.dim * self.mlp_ratio), self.dim, dtype=self.dtype, name=f"{tag}_mlp")(z)

        a = stream(x, ("spatial", "temporal"), "st")
        b = stream(x, ("temporal", "spatial"), "ts")
        alpha = nn.Dense(2, dtype=self.dtype, name="fusion")(jnp.concatenate([a, b], axis=-1))
        alpha = jax.nn.softmax(alpha.astype(jnp.float32), axis=-1).astype(x.dtype)
        return a * alpha[..., 0:1] + b * alpha[..., 1:2]


@MODELS.register_module()
class DSTFormer(nn.Module):
    """MotionBERT backbone (reference ``dstformer.py``): maps 2D keypoint
    sequences (B, T, K, 2|3) to motion features (B, T, K, feat_size)."""

    in_channels: int = 3
    feat_size: int = 256
    depth: int = 5
    num_heads: int = 8
    mlp_ratio: float = 4.0
    seq_len: int = 243
    num_joints: int = 17
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, T, K, _ = x.shape
        x = nn.Dense(self.feat_size, dtype=self.dtype, name="joints_embed")(x)
        spos = self.param("spat_pos_embed", nn.initializers.truncated_normal(0.02), (1, 1, self.num_joints, self.feat_size))
        tpos = self.param("temp_pos_embed", nn.initializers.truncated_normal(0.02), (1, self.seq_len, 1, self.feat_size))
        x = x + spos[:, :, :K] + tpos[:, :T]
        for i in range(self.depth):
            x = DSTBlock(self.feat_size, self.num_heads, self.mlp_ratio, dtype=self.dtype, name=f"block{i}")(x)
        return nn.LayerNorm(name="norm")(x).astype(jnp.float32)
