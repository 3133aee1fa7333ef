"""Vision Transformer backbone (flax, NHWC, TPU-first).

The reference takes its ViT from mmpretrain (``mmpretrain.VisionTransformer``,
see ProbPose config ``td-pm_ProbPose-small_8xb64-210e_coco-256x192.py:57``):
embed 384 / 12 layers / 12 heads / ffn 1536, patch 16 with conv padding 2,
no cls token, learnable pos-embed, pre-norm blocks, LN eps 1e-6, final norm,
``out_type='featmap'``. This is a from-scratch flax implementation of that
architecture:

- NHWC end-to-end; the token grid stays (B, h, w, C) so the head's deconv
  stack consumes it without layout shuffles.
- ``dtype`` selects the compute precision (bfloat16 on TPU keeps the MXU
  busy; params stay float32).
- Stochastic depth (drop-path) linearly scaled across layers, active only
  when ``train=True``.
- 192 tokens (16x12 @ 256x192) — full attention in one jitted program; no
  sequence parallelism needed (SURVEY §5).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from probpose_code_tpu.registry import MODELS

# mmpretrain arch-zoo equivalents used by shipped configs
VIT_ARCH_ZOO = {
    "small": dict(embed_dims=384, num_layers=12, num_heads=12, feedforward_channels=1536),
    "base": dict(embed_dims=768, num_layers=12, num_heads=12, feedforward_channels=3072),
    "large": dict(embed_dims=1024, num_layers=24, num_heads=16, feedforward_channels=4096),
    "huge": dict(embed_dims=1280, num_layers=32, num_heads=16, feedforward_channels=5120),
}


class DropPath(nn.Module):
    """Per-sample stochastic depth."""

    rate: float

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool) -> jnp.ndarray:
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        mask_shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, mask_shape)
        return jnp.where(mask, x / keep, 0.0)


class _LNParams(nn.Module):
    """Declares LayerNorm's parameters (same tree path as ``nn.LayerNorm``)
    without computing the normalization — used by the folded-LN fast path."""

    dim: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.dim,))
        bias = self.param("bias", nn.initializers.zeros, (self.dim,))
        return scale, bias


class _DenseParams(nn.Module):
    """Declares Dense's kernel/bias (same tree path as ``nn.Dense``)."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, in_features: int):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (in_features, self.features)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,)) if self.use_bias else None
        return kernel, bias


class _AttnParams(nn.Module):
    """Declares the attention qkv/proj parameters (same tree paths as the
    ``Attention`` module's ``nn.Dense`` children) without running them —
    used by the fused-layer serving path."""

    dim: int
    qkv_bias: bool = True

    @nn.compact
    def __call__(self):
        kq, bq = _DenseParams(3 * self.dim, self.qkv_bias, name="qkv")(self.dim)
        kp, bp = _DenseParams(self.dim, True, name="proj")(self.dim)
        return kq, bq, kp, bp


def _ln_stats(x: jnp.ndarray, eps: float = 1e-6):
    """Per-token LayerNorm statistics in >=f32: (mean, rsqrt(var + eps))."""
    xf = x.astype(jnp.promote_types(x.dtype, jnp.float32))
    mean = xf.mean(axis=-1)
    var = jnp.square(xf).mean(axis=-1) - jnp.square(mean)
    return mean, jax.lax.rsqrt(var + eps)


def _folded_ln_dense(x, mean, sinv, ln_scale, ln_bias, kernel, bias, dtype):
    """``Dense(LayerNorm(x))`` with the normalization folded into the matmul.

    LN(x)·W + b  =  σ⁻¹·(x·(γ⊙W)) − (σ⁻¹µ)·(γᵀW) + (βᵀW + b)

    The elementwise normalize pass over x (a separate VPU-bound HBM
    round-trip that profiles at ~2.5× the cost of the matmul it feeds)
    disappears; the per-token correction is two multiply-adds that XLA
    fuses into the matmul epilogue, where they ride along with the MXU.
    Algebraically identical to LN-then-Dense up to float reassociation.
    """
    acc = mean.dtype  # >=f32 accumulation for the per-token correction
    folded_kernel = (ln_scale[:, None] * kernel).astype(dtype)
    col_sums = (ln_scale[:, None] * kernel).sum(axis=0)  # γᵀW, (features,)
    const = jnp.dot(ln_bias, kernel) + (0.0 if bias is None else bias)  # βᵀW + b
    g = jnp.dot(x.astype(dtype), folded_kernel)
    corr = (-mean * sinv)[..., None] * col_sums.astype(acc)
    return (g.astype(acc) * sinv[..., None] + corr + const).astype(dtype)


class Attention(nn.Module):
    """Multi-head self-attention with fused qkv projection.

    On TPU the attention block runs as a VMEM-fused Pallas kernel
    (``ops/pallas/attention.py``) so the (B, h, N, N) matrix never touches
    HBM; elsewhere (and as the numeric reference) plain XLA einsums.
    ``quant='int8'`` runs the qkv / output projections as int8 MXU matmuls
    (models/utils/quant.py) for the serving path. When ``ln`` params are
    passed, the preceding LayerNorm is folded into the qkv matmul
    (see ``_folded_ln_dense``).
    """

    embed_dims: int
    num_heads: int
    qkv_bias: bool = True
    dtype: Any = jnp.float32
    quant: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, ln=None) -> jnp.ndarray:
        from probpose_code_tpu.ops.pallas.attention import attention

        Dense = _dense_cls(self.quant)
        B, N, C = x.shape
        head_dim = C // self.num_heads
        if ln is None:
            qkv = Dense(3 * C, use_bias=self.qkv_bias, dtype=self.dtype, name="qkv")(x)
        else:
            ln_scale, ln_bias, mean, sinv = ln
            kernel, bias = _DenseParams(3 * C, self.qkv_bias, name="qkv")(C)
            qkv = _folded_ln_dense(x, mean, sinv, ln_scale, ln_bias, kernel, bias, self.dtype)
        qkv = qkv.reshape(B, N, 3, self.num_heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (B, N, h, d)

        out = attention(q, k, v, head_dim**-0.5).reshape(B, N, C)
        return Dense(C, dtype=self.dtype, name="proj")(out)


def _dense_cls(quant: Optional[str]):
    if quant == "int8":
        from probpose_code_tpu.models.utils.quant import QuantDense

        return QuantDense
    assert quant is None, f"unknown quant mode {quant}"
    return nn.Dense


def _tpu_is_default() -> bool:
    """True when the default JAX backend is a real TPU (where the fused
    whole-layer Pallas kernels compile natively; elsewhere they would run
    in interpret mode, which is only useful for parity tests)."""
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


class TransformerBlock(nn.Module):
    embed_dims: int
    num_heads: int
    feedforward_channels: int
    drop_path_rate: float = 0.0
    qkv_bias: bool = True
    dtype: Any = jnp.float32
    # tanh-approximate GELU: ~10% faster on the VPU; keep exact (False) when
    # bit-level parity with reference checkpoints matters
    approximate_gelu: bool = False
    quant: Optional[str] = None
    # fold each pre-norm LN into the matmul it feeds (serving fast path;
    # same params, algebraically identical up to float reassociation)
    fold_ln: bool = False
    # run the WHOLE layer (LN1 -> qkv -> attention -> proj -> residual ->
    # LN2 -> MLP -> residual) as ONE Pallas kernel (ops/pallas/vit_layer.py);
    # same param tree either way. Tri-state: None (default) = auto — use the
    # SERVING kernel when the default backend is a real TPU, but keep
    # TRAINING on the XLA graph (measured faster there — see the A/B note in
    # __call__); True = force both kernels incl. the differentiable one
    # (interpret mode off-TPU, for parity tests); False = always XLA.
    fused_layers: Optional[bool] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        # the residual stream runs in self.dtype (bf16 on TPU) end-to-end;
        # softmax accumulates in f32 inside Attention
        Dense = _dense_cls(self.quant)
        x = x.astype(self.dtype)
        fused_layers = (
            self.fused_layers if self.fused_layers is not None else _tpu_is_default()
        )
        if (
            self.fused_layers is True and train and self.quant is None
            and self.approximate_gelu
        ):
            # training kernel path — EXPLICIT OPT-IN ONLY (fused_layers=True).
            # The whole-layer kernel with a custom VJP (two remat-style
            # backward kernels, ops/pallas/vit_layer_train.py) deletes the LN
            # reduce fusions and head-split layout copies from BOTH passes,
            # but the measured A/B on v5e (bf16, B=64, ProbPose-S) is a small
            # LOSS: 1,759 crops/s / 0.310 MFU with the kernel vs 1,787 /
            # 0.337 on the XLA graph — the backward recompute kernels re-pay
            # the forward's matmuls while XLA's remat-free backward reads the
            # saved activations from HBM, and at ViT-S scale that HBM traffic
            # is cheaper than the extra MXU work. Auto (None) therefore
            # routes TRAINING to the XLA graph; only predict uses the fused
            # kernel by default. Stochastic depth enters as per-image branch
            # multipliers drawn here from the dropout rng.
            from probpose_code_tpu.ops.pallas.vit_layer_train import vit_layer_train

            C, F = self.embed_dims, self.feedforward_channels
            s1, b1 = _LNParams(C, name="ln1")()
            kq, bq, kp, bp = _AttnParams(C, self.qkv_bias, name="attn")()
            s2, b2 = _LNParams(C, name="ln2")()
            k1, bb1 = _DenseParams(F, name="mlp_fc1")(C)
            k2, bb2 = _DenseParams(C, name="mlp_fc2")(F)
            m1 = m2 = None
            if self.drop_path_rate > 0.0:
                keep = 1.0 - self.drop_path_rate
                B = x.shape[0]
                r1, r2 = jax.random.split(self.make_rng("dropout"))
                m1 = jax.random.bernoulli(r1, keep, (B,)).astype(jnp.float32) / keep
                m2 = jax.random.bernoulli(r2, keep, (B,)).astype(jnp.float32) / keep
            out = vit_layer_train(
                x, s1, b1, kq, bq if bq is not None else jnp.zeros((3 * C,), jnp.float32),
                kp, bp, s2, b2, k1, bb1, k2, bb2, m1, m2,
                num_heads=self.num_heads, dtype=self.dtype,
            )
            if out is not None:
                return out
            # ungroupable shape: same math through XLA with the params (and
            # stochastic-depth masks) already materialized above — the named
            # submodule path below would redeclare ln1/attn/... and collide
            from probpose_code_tpu.ops.pallas.attention import attention

            B, N, _ = x.shape
            D = C // self.num_heads
            mean, sinv = _ln_stats(x)
            qkv = _folded_ln_dense(x, mean, sinv, s1, b1, kq, bq, self.dtype)
            qkv = qkv.reshape(B, N, 3, self.num_heads, D)
            o = attention(qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2], D ** -0.5)
            br1 = (jnp.dot(o.reshape(B, N, C), kp.astype(self.dtype)) + bp).astype(self.dtype)
            if m1 is not None:
                br1 = br1 * m1[:, None, None].astype(self.dtype)
            x = x + br1
            mean, sinv = _ln_stats(x)
            h = _folded_ln_dense(x, mean, sinv, s2, b2, k1, bb1, self.dtype)
            h = nn.gelu(h, approximate=True)
            br2 = (jnp.dot(h.astype(self.dtype), k2.astype(self.dtype)) + bb2).astype(self.dtype)
            if m2 is not None:
                br2 = br2 * m2[:, None, None].astype(self.dtype)
            return x + br2

        use_fused_layers = fused_layers and not train and self.quant is None
        if use_fused_layers:
            # serving fast path: the WHOLE layer (LN1 -> qkv -> per-head
            # attention -> proj -> residual -> LN2 -> MLP -> residual) is one
            # Pallas kernel — qkv, the attention matrix and the MLP hidden
            # never touch HBM, and XLA's slow lane-dim LayerNorm reduce
            # fusions / head-split layout copies never materialize
            from probpose_code_tpu.ops.pallas.vit_layer import vit_layer_fused

            C, F = self.embed_dims, self.feedforward_channels
            s1, b1 = _LNParams(C, name="ln1")()
            kq, bq, kp, bp = _AttnParams(C, self.qkv_bias, name="attn")()
            s2, b2 = _LNParams(C, name="ln2")()
            k1, bb1 = _DenseParams(F, name="mlp_fc1")(C)
            k2, bb2 = _DenseParams(C, name="mlp_fc2")(F)
            bq_ = bq if bq is not None else jnp.zeros((3 * C,), jnp.float32)
            out = vit_layer_fused(
                x, s1, b1, kq, bq_, kp, bp, s2, b2, k1, bb1, k2, bb2,
                num_heads=self.num_heads,
                approximate_gelu=self.approximate_gelu, dtype=self.dtype,
            )
            if out is not None:
                return out
            # shape has no valid image grouping: same math via XLA
            from probpose_code_tpu.ops.pallas.attention import attention

            B, N, _ = x.shape
            D = C // self.num_heads
            mean, sinv = _ln_stats(x)
            qkv = _folded_ln_dense(x, mean, sinv, s1, b1, kq, bq, self.dtype)
            qkv = qkv.reshape(B, N, 3, self.num_heads, D)
            o = attention(qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2], D ** -0.5)
            x = x + (jnp.dot(o.reshape(B, N, C), kp.astype(self.dtype)) + bp).astype(self.dtype)
            mean, sinv = _ln_stats(x)
            h = _folded_ln_dense(x, mean, sinv, s2, b2, k1, bb1, self.dtype)
            h = nn.gelu(h, approximate=self.approximate_gelu)
            h = jnp.dot(h.astype(self.dtype), k2.astype(self.dtype)) + bb2
            return x + h.astype(self.dtype)

        if self.fold_ln and self.quant is None:
            s1, b1 = _LNParams(self.embed_dims, name="ln1")()
            mean, sinv = _ln_stats(x)
            h = Attention(self.embed_dims, self.num_heads, self.qkv_bias, self.dtype, self.quant, name="attn")(
                x, ln=(s1, b1, mean, sinv)
            )
            x = x + DropPath(self.drop_path_rate, name="drop_path1")(h, deterministic=not train)
        else:
            h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="ln1")(x)
            h = Attention(self.embed_dims, self.num_heads, self.qkv_bias, self.dtype, self.quant, name="attn")(h)
            x = x + DropPath(self.drop_path_rate, name="drop_path1")(h, deterministic=not train)

        if self.fold_ln and self.quant is None:
            s2, b2 = _LNParams(self.embed_dims, name="ln2")()
            mean, sinv = _ln_stats(x)
            k1, bb1 = _DenseParams(self.feedforward_channels, name="mlp_fc1")(self.embed_dims)
            h = _folded_ln_dense(x, mean, sinv, s2, b2, k1, bb1, self.dtype)
        else:
            h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="ln2")(x)
            h = Dense(self.feedforward_channels, dtype=self.dtype, name="mlp_fc1")(h)
        h = nn.gelu(h, approximate=self.approximate_gelu)
        h = Dense(self.embed_dims, dtype=self.dtype, name="mlp_fc2")(h)
        x = x + DropPath(self.drop_path_rate, name="drop_path2")(h, deterministic=not train)
        return x


@MODELS.register_module()
class VisionTransformer(nn.Module):
    """ViT backbone emitting an NHWC feature map.

    Args mirror the reference config surface; ``arch`` may be a preset name
    or a dict with embed_dims/num_layers/num_heads/feedforward_channels.
    ``img_size`` is (H, W) like mmpretrain.
    """

    arch: Any = "small"
    img_size: Tuple[int, int] = (256, 192)
    patch_size: int = 16
    patch_padding: int = 2
    in_channels: int = 3
    qkv_bias: bool = True
    drop_path_rate: float = 0.0
    with_cls_token: bool = False
    out_type: str = "featmap"
    final_norm: bool = True
    out_indices: Sequence[int] = (-1,)
    dtype: Any = jnp.float32
    approximate_gelu: bool = False
    quant: Optional[str] = None
    fold_ln: bool = False
    # None = auto: whole-layer Pallas kernels on TPU, XLA graph elsewhere
    # (see TransformerBlock.fused_layers)
    fused_layers: Optional[bool] = None

    def setup(self):
        arch = VIT_ARCH_ZOO[self.arch] if isinstance(self.arch, str) else dict(self.arch)
        self.embed_dims = arch["embed_dims"]
        self.num_layers = arch["num_layers"]
        self.num_heads = arch["num_heads"]
        self.feedforward_channels = arch["feedforward_channels"]

        H, W = self.img_size
        p, pad = self.patch_size, self.patch_padding
        self.grid_h = (H + 2 * pad - p) // p + 1
        self.grid_w = (W + 2 * pad - p) // p + 1
        num_patches = self.grid_h * self.grid_w

        self.patch_embed = nn.Conv(
            self.embed_dims,
            kernel_size=(p, p),
            strides=(p, p),
            padding=((pad, pad), (pad, pad)),
            dtype=self.dtype,
            name="patch_embed",
        )
        n_tokens = num_patches + (1 if self.with_cls_token else 0)
        self.pos_embed = self.param(
            "pos_embed", nn.initializers.truncated_normal(0.02), (1, n_tokens, self.embed_dims)
        )
        if self.with_cls_token:
            self.cls_token = self.param("cls_token", nn.initializers.zeros, (1, 1, self.embed_dims))

        dpr = [self.drop_path_rate * i / max(self.num_layers - 1, 1) for i in range(self.num_layers)]
        self.blocks = [
            TransformerBlock(
                self.embed_dims,
                self.num_heads,
                self.feedforward_channels,
                drop_path_rate=dpr[i],
                qkv_bias=self.qkv_bias,
                dtype=self.dtype,
                approximate_gelu=self.approximate_gelu,
                quant=self.quant,
                fold_ln=self.fold_ln,
                fused_layers=self.fused_layers,
                name=f"block{i}",
            )
            for i in range(self.num_layers)
        ]
        if self.final_norm:
            self.ln_final = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="ln_final")

    def __call__(self, x: jnp.ndarray, train: bool = False):
        """x: (B, H, W, 3) NHWC -> tuple of (B, h, w, C) feature maps."""
        B = x.shape[0]
        x = self.patch_embed(x.astype(self.dtype))  # (B, gh, gw, C)
        gh, gw = x.shape[1], x.shape[2]
        x = x.reshape(B, gh * gw, self.embed_dims)

        if self.with_cls_token:
            cls = jnp.broadcast_to(self.cls_token.astype(self.dtype), (B, 1, self.embed_dims))
            x = jnp.concatenate([cls, x], axis=1)
        x = x + self.pos_embed.astype(self.dtype)

        outs = []
        out_indices = {i % self.num_layers for i in self.out_indices}
        for i, block in enumerate(self.blocks):
            x = block(x, train=train)
            if i in out_indices:
                y = x
                if i == self.num_layers - 1 and self.final_norm:
                    y = self.ln_final(y)
                if self.with_cls_token:
                    y = y[:, 1:]
                if self.out_type == "featmap":
                    y = y.reshape(B, gh, gw, self.embed_dims)
                elif self.out_type == "cls_token":
                    y = x[:, 0]
                outs.append(y.astype(jnp.float32))
        return tuple(outs)
