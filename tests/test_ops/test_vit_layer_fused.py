"""Fused whole-layer ViT kernel (ops/pallas/vit_layer.py) vs the XLA path.

The serving fast path runs each transformer layer as one Pallas kernel
(``VisionTransformer(fused_layers=True)``); these tests pin it to the plain
flax/XLA implementation on CPU (interpret mode). Counterpart of the
reference's mmpretrain TransformerEncoderLayer semantics consumed by the
ProbPose config (``configs/.../td-pm_ProbPose-small_8xb64-210e_coco-256x192.py:57``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from probpose_code_tpu.models.backbones.vit import VisionTransformer
from probpose_code_tpu.ops.pallas.vit_layer import vit_layer_fused

ARCH2 = dict(embed_dims=128, num_layers=2, num_heads=4, feedforward_channels=256)


def _ref_layer(x, p, num_heads, approximate_gelu=True, eps=1e-6):
    """Plain jnp pre-norm transformer layer (f32 LN stats, bf16 matmuls)."""
    def ln(z, s, b):
        zf = z.astype(jnp.float32)
        m = zf.mean(-1, keepdims=True)
        v = (zf * zf).mean(-1, keepdims=True) - m * m
        return (zf - m) * jax.lax.rsqrt(v + eps) * s + b

    B, N, C = x.shape
    D = C // num_heads
    dt = jnp.bfloat16
    xn = ln(x, p["ln1_s"], p["ln1_b"]).astype(dt)
    qkv = (xn @ p["w_qkv"].astype(dt) + p["b_qkv"]).reshape(B, N, 3, num_heads, D)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    s = jnp.einsum("bqhd,bkhd->bhqk", q * (D ** -0.5), k).astype(jnp.float32)
    a = jax.nn.softmax(s, axis=-1).astype(dt)
    o = jnp.einsum("bhqk,bkhd->bqhd", a, v).reshape(B, N, C)
    x = x + (o @ p["w_proj"].astype(dt) + p["b_proj"]).astype(x.dtype)
    xn2 = ln(x, p["ln2_s"], p["ln2_b"]).astype(dt)
    h = xn2 @ p["w_fc1"].astype(dt) + p["b_fc1"]
    h = jax.nn.gelu(h, approximate=approximate_gelu).astype(dt)
    return x + (h @ p["w_fc2"].astype(dt) + p["b_fc2"]).astype(x.dtype)


def _rand_params(key, C, F):
    ks = jax.random.split(key, 8)
    return {
        "ln1_s": 1.0 + 0.1 * jax.random.normal(ks[0], (C,), jnp.float32),
        "ln1_b": 0.1 * jax.random.normal(ks[1], (C,), jnp.float32),
        "w_qkv": 0.08 * jax.random.normal(ks[2], (C, 3 * C), jnp.float32),
        "b_qkv": 0.05 * jax.random.normal(ks[3], (3 * C,), jnp.float32),
        "w_proj": 0.08 * jax.random.normal(ks[4], (C, C), jnp.float32),
        "b_proj": jnp.zeros((C,), jnp.float32),
        "ln2_s": jnp.ones((C,), jnp.float32),
        "ln2_b": jnp.zeros((C,), jnp.float32),
        "w_fc1": 0.08 * jax.random.normal(ks[5], (C, F), jnp.float32),
        "b_fc1": 0.05 * jax.random.normal(ks[6], (F,), jnp.float32),
        "w_fc2": 0.08 * jax.random.normal(ks[7], (F, C), jnp.float32),
        "b_fc2": jnp.zeros((C,), jnp.float32),
    }


def test_kernel_matches_xla_reference():
    B, N, C, H, F = 2, 64, 128, 4, 256
    p = _rand_params(jax.random.PRNGKey(0), C, F)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, N, C), jnp.bfloat16)
    got = vit_layer_fused(
        x, p["ln1_s"], p["ln1_b"], p["w_qkv"], p["b_qkv"], p["w_proj"], p["b_proj"],
        p["ln2_s"], p["ln2_b"], p["w_fc1"], p["b_fc1"], p["w_fc2"], p["b_fc2"],
        num_heads=H,
    )
    assert got is not None and got.shape == (B, N, C) and got.dtype == x.dtype
    want = _ref_layer(x, p, H)
    g, w = np.asarray(got, np.float32), np.asarray(want, np.float32)
    denom = np.abs(w).max() + 1e-6
    assert np.abs(g - w).max() / denom < 3e-2  # bf16 reassociation tolerance


def test_kernel_unsupported_shape_returns_none():
    C, H, F = 128, 4, 256
    p = _rand_params(jax.random.PRNGKey(0), C, F)
    x = jnp.zeros((2, 63, C), jnp.bfloat16)  # N not a multiple of 8
    got = vit_layer_fused(
        x, p["ln1_s"], p["ln1_b"], p["w_qkv"], p["b_qkv"], p["w_proj"], p["b_proj"],
        p["ln2_s"], p["ln2_b"], p["w_fc1"], p["b_fc1"], p["w_fc2"], p["b_fc2"],
        num_heads=H,
    )
    assert got is None


@pytest.mark.parametrize("img", [(64, 48)])
def test_backbone_fused_matches_standard(img):
    kw = dict(
        arch=ARCH2, img_size=img, patch_size=16, patch_padding=2,
        dtype="bfloat16", approximate_gelu=True,
    )
    std = VisionTransformer(**kw)
    fused = VisionTransformer(fused_layers=True, **kw)
    x = jax.random.uniform(jax.random.PRNGKey(2), (2,) + img + (3,), jnp.float32)
    variables = std.init(jax.random.PRNGKey(0), x, train=False)
    v2 = fused.init(jax.random.PRNGKey(0), x, train=False)
    assert jax.tree_util.tree_structure(variables) == jax.tree_util.tree_structure(v2)

    a = np.asarray(std.apply(variables, x, train=False)[0], np.float32)
    b = np.asarray(fused.apply(variables, x, train=False)[0], np.float32)
    denom = np.abs(a).max() + 1e-6
    assert np.abs(a - b).max() / denom < 3e-2

    # train=True must take the standard (differentiable) path
    t = fused.apply(variables, x, train=True, rngs={"dropout": jax.random.PRNGKey(3)})[0]
    assert np.isfinite(np.asarray(t, np.float32)).all()
