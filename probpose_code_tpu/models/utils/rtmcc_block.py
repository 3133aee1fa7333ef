"""Gated Attention Unit (GAU) for RTMPose (flax).

Parity target: reference ``mmpose/models/utils/rtmcc_block.py`` (RTMCCBlock):
ScaleNorm -> fused uv projection -> per-branch (gamma, beta) query/key from a
shared base -> ReLU^2 attention kernel ``relu(qk / sqrt(s))^2`` -> gated
value mix ``u * (kernel @ v)`` -> output projection, with optional rotary
position encoding and relative position bias, residual with learnable scale.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from probpose_code_tpu.registry import MODELS


def rope(x: jnp.ndarray, axis: int = 1) -> jnp.ndarray:
    """Rotary position embedding over the given token axis (last dim split)."""
    n = x.shape[axis]
    half = x.shape[-1] // 2
    position = jnp.arange(n, dtype=jnp.float32)
    freq_seq = -jnp.arange(half, dtype=jnp.float32) / float(half)
    inv_freq = 10000.0**-freq_seq
    sinusoid = position[:, None] * inv_freq[None]  # (n, half)
    shape = [1] * x.ndim
    shape[axis] = n
    shape[-1] = half
    sin = jnp.sin(sinusoid).reshape(shape)
    cos = jnp.cos(sinusoid).reshape(shape)
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)


class ScaleNorm(nn.Module):
    """x * g / max(||x|| * d^-0.5, eps)  (reference models/utils/transformer.py)."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        dim = x.shape[-1]
        g = self.param("g", nn.initializers.ones, (1,))
        norm = jnp.linalg.norm(x, axis=-1, keepdims=True) * dim**-0.5
        return x / jnp.clip(norm, self.eps) * g


@MODELS.register_module()
class RTMCCBlock(nn.Module):
    num_token: int
    in_token_dims: int
    out_token_dims: int
    expansion_factor: int = 2
    s: int = 128
    eps: float = 1e-5
    dropout_rate: float = 0.0
    drop_path: float = 0.0
    attn_type: str = "self-attn"
    act_fn: str = "SiLU"
    use_bias: bool = False
    use_rel_bias: bool = True
    pos_enc: bool = False
    dtype: Any = jnp.float32

    def _act(self, x):
        return nn.silu(x) if self.act_fn == "SiLU" else nn.relu(x)

    def _rel_pos_bias(self, w, seq_len: int) -> jnp.ndarray:
        # toeplitz bias from the (2n-1) parameter vector (self-attn path):
        # bias[i, j] = w[j - i + n - 1] — the reference's pad/repeat/reshape
        # trick unrolls to this orientation (rtmcc_block.py:rel_pos_bias;
        # verified against the path-loaded reference source in
        # tests/test_engine/test_ref_oracle_parity.py)
        idx = jnp.arange(seq_len)
        rel = idx[None, :] - idx[:, None] + seq_len - 1  # in [0, 2n-2]
        return w[rel]

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        assert self.attn_type == "self-attn", "cross-attn GAU not needed for shipped configs"
        x = inputs
        shortcut = x
        e = int(self.in_token_dims * self.expansion_factor)

        h = ScaleNorm(eps=self.eps, name="ln")(x)
        uv = nn.Dense(2 * e + self.s, use_bias=self.use_bias, dtype=self.dtype, name="uv")(h)
        uv = self._act(uv)
        u, v, base = jnp.split(uv, [e, 2 * e], axis=-1)

        gamma = self.param("gamma", nn.initializers.uniform(1.0), (2, self.s))
        beta = self.param("beta", nn.initializers.zeros, (2, self.s))
        base = base[..., None, :] * gamma[None, None] + beta[None, None]  # (B, K, 2, s)
        if self.pos_enc:
            base = rope(base, axis=1)
        q, k = base[..., 0, :], base[..., 1, :]

        qk = jnp.einsum("bns,bms->bnm", q, k)
        if self.use_rel_bias:
            w = self.param("w", nn.initializers.uniform(1.0), (2 * self.num_token - 1,))
            qk = qk + self._rel_pos_bias(w, q.shape[1])[None]

        kernel = jnp.square(nn.relu(qk / jnp.sqrt(jnp.float32(self.s))))
        if self.dropout_rate > 0.0 and train:
            kernel = nn.Dropout(self.dropout_rate, deterministic=not train)(kernel)

        out = u * jnp.einsum("bnm,bme->bne", kernel, v)
        out = nn.Dense(self.out_token_dims, use_bias=self.use_bias, dtype=self.dtype, name="o")(out)

        if self.in_token_dims == self.out_token_dims:
            res_scale = self.param("res_scale", nn.initializers.ones, (self.in_token_dims,))
            return shortcut * res_scale + out
        return out
