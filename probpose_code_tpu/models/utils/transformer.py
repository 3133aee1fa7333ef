"""Transformer building blocks for RTMO (HybridEncoder + DCC).

Behavioral parity with reference ``mmpose/models/utils/transformer.py``:
SinePositionalEncoding (:407-540), GAUEncoder (:583-726),
DetrTransformerEncoder/Layer (:728+), and ``reparam_layers.py`` RepVGGBlock
(training form). TPU-native: functional sine encodings (no buffers —
constants fold into the XLA program), NHWC convs, flax modules.
"""

from __future__ import annotations

import math
from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from probpose_code_tpu.models.utils.rtmcc_block import ScaleNorm


def sine_dim_t(out_channels: int, temperature: float = 1e5) -> np.ndarray:
    """Frequency base: ``temperature ** (i / (C/2))`` (reference :447-449)."""
    pos_dim = out_channels // 2
    return temperature ** (np.arange(pos_dim, dtype=np.float32) / pos_dim)


def sine_pos_encoding(position: jnp.ndarray, out_channels: int, temperature: float = 1e5) -> jnp.ndarray:
    """1-D sine encoding of arbitrary positions: (..., L) -> (..., L, C).

    ``cat(cos(p / dim_t), sin(p / dim_t))`` — reference :481-489.
    """
    dim_t = jnp.asarray(sine_dim_t(out_channels, temperature))
    freq = position[..., None] / dim_t
    return jnp.concatenate([jnp.cos(freq), jnp.sin(freq)], axis=-1)


def sine_pos_encoding_2d(h: int, w: int, out_channels: int, temperature: float = 1e5) -> np.ndarray:
    """Grid sine encoding -> (h*w, 2*C) laid out ``[enc_h | enc_w]``.

    The reference stacks (enc_h, enc_w) on a trailing dim (:491-513) and the
    HybridEncoder flattens it with ``transpose(-1, -2).reshape(1, h*w, -1)``
    (hybrid_encoder.py:202) — i.e. per-position CONCATENATION of the h- and
    w-encodings, which converted torch checkpoints depend on.
    """
    dim_t = sine_dim_t(out_channels, temperature)
    gh, gw = np.meshgrid(np.arange(h, dtype=np.float32), np.arange(w, dtype=np.float32), indexing="ij")
    def enc(g):
        freq = g.reshape(-1)[:, None] / dim_t
        return np.concatenate([np.cos(freq), np.sin(freq)], axis=-1)
    e_h, e_w = enc(gh), enc(gw)  # (hw, C)
    return np.concatenate([e_h, e_w], axis=-1)


class ChannelWiseScale(nn.Module):
    """Learnable per-channel residual scale (reference rtmcc_block.py)."""

    dim: int

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.dim,))
        return x * scale


class GAUEncoder(nn.Module):
    """Self-attention Gated Attention Unit (reference ``transformer.py:583``).

    ``uv = act(W x)`` split into (u, v, base); q/k are affine views of the
    shared base (optionally + additive pos enc); kernel = relu(qk/sqrt(s))^2;
    out = W_o(u * kernel @ v) with channel-scaled residual.
    """

    in_token_dims: int
    out_token_dims: int
    expansion_factor: int = 2
    s: int = 128
    eps: float = 1e-5
    act_fn: str = "SiLU"
    pos_enc: str = "none"  # 'none' | 'add'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, pos_enc: Optional[jnp.ndarray] = None):
        e = int(self.in_token_dims * self.expansion_factor)
        shortcut = x
        y = ScaleNorm(eps=self.eps, name="ln")(x)
        uv = nn.Dense(2 * e + self.s, use_bias=False, dtype=self.dtype, name="uv",
                      kernel_init=nn.initializers.xavier_uniform())(y)
        uv = nn.silu(uv) if self.act_fn == "SiLU" else nn.relu(uv)
        u, v, base = jnp.split(uv, [e, 2 * e], axis=-1)
        gamma = self.param("gamma", nn.initializers.uniform(scale=1.0), (2, self.s))
        beta = self.param("beta", nn.initializers.uniform(scale=1.0), (2, self.s))
        q = base * gamma[0] + beta[0]
        k = base * gamma[1] + beta[1]
        if self.pos_enc == "add" and pos_enc is not None:
            pe = pos_enc.reshape(*((1,) * (q.ndim - 2)), q.shape[-2], q.shape[-1])
            q = q + pe
            k = k + pe
        qk = jnp.einsum("...ns,...ms->...nm", q, k)
        kernel = jnp.square(nn.relu(qk / math.sqrt(self.s)))
        out = u * jnp.einsum("...nm,...me->...ne", kernel, v)
        out = nn.Dense(self.out_token_dims, use_bias=False, dtype=self.dtype, name="o")(out)
        if self.in_token_dims == self.out_token_dims:
            return ChannelWiseScale(self.in_token_dims, name="res_scale")(shortcut) + out
        return out


class DetrTransformerEncoderLayer(nn.Module):
    """Post-norm transformer encoder layer (DETR-style): q = k = x + pos."""

    embed_dims: int = 256
    num_heads: int = 8
    feedforward_channels: int = 1024
    act: str = "GELU"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, query_pos: Optional[jnp.ndarray] = None, train: bool = False):
        q = x if query_pos is None else x + query_pos
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, qkv_features=self.embed_dims, out_features=self.embed_dims,
            dtype=self.dtype, name="self_attn",
        )(inputs_q=q, inputs_k=q, inputs_v=x)
        x = nn.LayerNorm(epsilon=1e-5, name="norm1")(x + attn)
        h = nn.Dense(self.feedforward_channels, dtype=self.dtype, name="ffn1")(x)
        h = nn.gelu(h, approximate=False) if self.act == "GELU" else nn.relu(h)
        h = nn.Dense(self.embed_dims, dtype=self.dtype, name="ffn2")(h)
        return nn.LayerNorm(epsilon=1e-5, name="norm2")(x + h)


class DetrTransformerEncoder(nn.Module):
    """Stack of encoder layers (reference ``transformer.py:728``)."""

    num_layers: int = 1
    embed_dims: int = 256
    num_heads: int = 8
    feedforward_channels: int = 1024
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, query_pos: Optional[jnp.ndarray] = None, train: bool = False):
        for i in range(self.num_layers):
            x = DetrTransformerEncoderLayer(
                embed_dims=self.embed_dims, num_heads=self.num_heads,
                feedforward_channels=self.feedforward_channels, dtype=self.dtype, name=f"layer{i}",
            )(x, query_pos=query_pos, train=train)
        return x


class RepVGGBlock(nn.Module):
    """RepVGG block, training form (reference ``reparam_layers.py``).

    3x3 conv+BN and 1x1 conv+BN branches summed before the activation. The
    reference defaults to ``without_branch_norm=True`` (the RTMO
    CSPRepLayer path has NO identity-BN branch); set
    ``with_branch_norm=True`` for the variant that adds a normalized
    identity shortcut. The deploy-time reparam fuse is a host-side weight
    transform, unnecessary under XLA which already fuses the parallel
    convolutions.
    """

    out_channels: int
    with_branch_norm: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        def bn(name):
            return nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, name=name)

        dense = nn.Conv(self.out_channels, (3, 3), padding="SAME", use_bias=False, dtype=self.dtype, name="conv3")(x)
        dense = bn("bn3")(dense)
        one = nn.Conv(self.out_channels, (1, 1), use_bias=False, dtype=self.dtype, name="conv1")(x)
        one = bn("bn1")(one)
        out = dense + one
        if self.with_branch_norm and x.shape[-1] == self.out_channels:
            out = out + bn("bn_id")(x)
        return nn.silu(out)
