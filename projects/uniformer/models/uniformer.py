"""UniFormer backbone: convolution (stages 1-2) + self-attention (3-4).

Parity target: reference ``projects/uniformer/models/uniformer.py`` —
four stages behind 4x/2x/2x/2x patch embeds; CBlocks (depthwise positional
conv + 1x1-conv "attention" around a depthwise 5x5, BatchNorm) for the
first two stages, SABlocks (depthwise positional conv + LN + MHA + MLP)
for the last two; per-stage LayerNorm taps feed the multi-scale output.
``use_window`` partitions stage-3 attention into non-overlapping windows
(the reference's ``windows_size``/``window_size`` attribute typo is fixed
here); ``use_hybrid`` makes every 4th stage-3 block global.

TPU notes: NHWC throughout; windows become a reshape/transpose (static
shapes); stochastic depth is a per-sample broadcast dropout on each
residual branch; ``jax.checkpoint`` replaces torch.utils.checkpoint when
``use_checkpoint`` (rematerialize attention stages under grad).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from probpose_code_tpu.registry import MODELS


class DropPath(nn.Module):
    rate: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.rate == 0.0 or not train:
            return x
        keep = 1.0 - self.rate
        mask = jax.random.bernoulli(self.make_rng("dropout"), keep, (x.shape[0],) + (1,) * (x.ndim - 1))
        return x * mask / keep


class _CMlp(nn.Module):
    hidden: int
    out: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.gelu(nn.Conv(self.hidden, (1, 1), dtype=self.dtype, name="fc1")(x), approximate=False)
        return nn.Conv(self.out, (1, 1), dtype=self.dtype, name="fc2")(x)


class _Mlp(nn.Module):
    hidden: int
    out: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.gelu(nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x), approximate=False)
        return nn.Dense(self.out, dtype=self.dtype, name="fc2")(x)


class CBlock(nn.Module):
    dim: int
    mlp_ratio: float = 4.0
    drop_path_rate: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        dp = DropPath(self.drop_path_rate, name="drop_path")
        x = x + nn.Conv(self.dim, (3, 3), feature_group_count=self.dim, dtype=self.dtype, name="pos_embed")(x)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9, name="norm1")(x)
        h = nn.Conv(self.dim, (1, 1), dtype=self.dtype, name="conv1")(h)
        h = nn.Conv(self.dim, (5, 5), feature_group_count=self.dim, dtype=self.dtype, name="attn")(h)
        h = nn.Conv(self.dim, (1, 1), dtype=self.dtype, name="conv2")(h)
        x = x + dp(h, train=train)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9, name="norm2")(x)
        h = _CMlp(int(self.dim * self.mlp_ratio), self.dim, dtype=self.dtype, name="mlp")(h)
        return x + dp(h, train=train)


class _Attention(nn.Module):
    dim: int
    num_heads: int
    qkv_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, N, C = x.shape
        h = self.num_heads
        hd = C // h
        qkv = nn.Dense(3 * C, use_bias=self.qkv_bias, dtype=self.dtype, name="qkv")(x)
        q, k, v = jnp.split(qkv.reshape(B, N, 3, h, hd).transpose(2, 0, 3, 1, 4), 3)
        q, k, v = q[0], k[0], v[0]
        attn = jax.nn.softmax(jnp.einsum("bhnd,bhmd->bhnm", q, k) * (hd ** -0.5), axis=-1)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v).transpose(0, 2, 1, 3).reshape(B, N, C)
        return nn.Dense(C, dtype=self.dtype, name="proj")(out)


class SABlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_path_rate: float = 0.0
    window_size: int = 0  # 0 = global attention
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        dp = DropPath(self.drop_path_rate, name="drop_path")
        x = x + nn.Conv(self.dim, (3, 3), feature_group_count=self.dim, dtype=self.dtype, name="pos_embed")(x)
        B, H, W, C = x.shape
        attn = _Attention(self.dim, self.num_heads, self.qkv_bias, dtype=self.dtype, name="attn")
        if self.window_size:
            ws = self.window_size
            pad_b = (ws - H % ws) % ws
            pad_r = (ws - W % ws) % ws
            h = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
            h = jnp.pad(h, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
            Hp, Wp = H + pad_b, W + pad_r
            win = h.reshape(B, Hp // ws, ws, Wp // ws, ws, C).transpose(0, 1, 3, 2, 4, 5)
            win = win.reshape(-1, ws * ws, C)
            win = attn(win)
            win = win.reshape(B, Hp // ws, Wp // ws, ws, ws, C).transpose(0, 1, 3, 2, 4, 5)
            h = win.reshape(B, Hp, Wp, C)[:, :H, :W]
            x = x + dp(h, train=train)
        else:
            tokens = x.reshape(B, H * W, C)
            h = attn(nn.LayerNorm(epsilon=1e-6, name="norm1")(tokens))
            x = x + dp(h.reshape(B, H, W, C), train=train)
        h = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        h = _Mlp(int(self.dim * self.mlp_ratio), self.dim, dtype=self.dtype, name="mlp")(h)
        return x + dp(h, train=train)


class PatchEmbed(nn.Module):
    dim: int
    patch: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        p = self.patch
        x = nn.Conv(self.dim, (p, p), strides=(p, p), dtype=self.dtype, name="proj")(x)
        return nn.LayerNorm(name="norm")(x)


@MODELS.register_module()
class UniFormer(nn.Module):
    depths: Sequence[int] = (3, 4, 8, 3)
    in_channels: int = 3
    embed_dims: Sequence[int] = (64, 128, 320, 512)
    head_dim: int = 64
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_path_rate: float = 0.0
    use_checkpoint: bool = False
    checkpoint_num: Sequence[int] = (0, 0, 0, 0)
    use_window: bool = False
    use_hybrid: bool = False
    window_size: int = 14
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        dpr = np.linspace(0, self.drop_path_rate, sum(self.depths))
        num_heads = [d // self.head_dim for d in self.embed_dims]
        outs = []
        idx = 0
        for stage in range(4):
            patch = 4 if stage == 0 else 2
            x = PatchEmbed(self.embed_dims[stage], patch, dtype=self.dtype, name=f"patch_embed{stage + 1}")(x)
            for i in range(self.depths[stage]):
                # rematerialize checkpointed blocks under grad (the TPU
                # counterpart of the reference's torch.utils.checkpoint)
                remat = self.use_checkpoint and i < self.checkpoint_num[stage]
                if stage < 2:
                    cls = nn.remat(CBlock, static_argnums=(2,)) if remat else CBlock
                    x = cls(
                        self.embed_dims[stage], self.mlp_ratio, float(dpr[idx]),
                        dtype=self.dtype, name=f"blocks{stage + 1}_{i}",
                    )(x, train)
                else:
                    win = 0
                    if stage == 2 and self.use_window:
                        win = self.window_size
                    elif stage == 2 and self.use_hybrid and (i + 1) % 4 != 0:
                        win = self.window_size
                    cls = nn.remat(SABlock, static_argnums=(2,)) if remat else SABlock
                    x = cls(
                        self.embed_dims[stage], num_heads[stage], self.mlp_ratio, self.qkv_bias,
                        float(dpr[idx]), window_size=win, dtype=self.dtype, name=f"blocks{stage + 1}_{i}",
                    )(x, train)
                idx += 1
            outs.append(nn.LayerNorm(epsilon=1e-6, name=f"norm{stage + 1}")(x).astype(jnp.float32))
        return tuple(outs)
