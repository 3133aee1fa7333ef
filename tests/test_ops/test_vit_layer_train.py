"""Differentiable fused ViT layer (ops/pallas/vit_layer_train.py):
forward + full gradient parity against a plain-XLA reference layer, in f32
through the CPU interpreter. Covers the stochastic-depth branch masks the
flagship training recipe needs (drop_path_rate=0.1)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from probpose_code_tpu.ops.pallas.vit_layer_train import vit_layer_train  # noqa: E402

B, N, C, H, F = 4, 16, 64, 4, 128


def _params(rng):
    def r(*s):
        return jnp.asarray(rng.randn(*s).astype(np.float32) * 0.05)

    return dict(
        l1s=1.0 + r(C), l1b=r(C),
        wqkv=r(C, 3 * C), bqkv=r(3 * C),
        wp=r(C, C), bp=r(C),
        l2s=1.0 + r(C), l2b=r(C),
        w1=r(C, F), b1=r(F),
        w2=r(F, C), b2=r(C),
    )


def _ref_layer(x, p, m1, m2):
    """Plain-XLA pre-norm ViT layer with per-image branch masks (f32)."""
    def ln(v, s, b):
        mu = v.mean(-1, keepdims=True)
        var = v.var(-1, keepdims=True)
        return (v - mu) * jax.lax.rsqrt(var + 1e-6) * s + b

    D = C // H
    xn = ln(x, p["l1s"], p["l1b"])
    qkv = xn @ p["wqkv"] + p["bqkv"]
    qkv = qkv.reshape(B, N, 3, H, D)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    s = jnp.einsum("bnhd,bmhd->bhnm", q, k) * D ** -0.5
    a = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhnm,bmhd->bnhd", a, v).reshape(B, N, C)
    x1 = x + m1[:, None, None] * (o @ p["wp"] + p["bp"])
    h = ln(x1, p["l2s"], p["l2b"]) @ p["w1"] + p["b1"]
    h = jax.nn.gelu(h, approximate=True)
    return x1 + m2[:, None, None] * (h @ p["w2"] + p["b2"])


def _fused(x, p, m1, m2):
    out = vit_layer_train(
        x, p["l1s"], p["l1b"], p["wqkv"], p["bqkv"], p["wp"], p["bp"],
        p["l2s"], p["l2b"], p["w1"], p["b1"], p["w2"], p["b2"],
        m1, m2, num_heads=H, dtype=jnp.float32,
    )
    assert out is not None
    return out


@pytest.fixture(scope="module")
def data():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, N, C).astype(np.float32))
    g = jnp.asarray(rng.randn(B, N, C).astype(np.float32))
    p = _params(rng)
    return x, g, p


@pytest.mark.parametrize("masked", [False, True])
def test_forward_parity(data, masked):
    x, _, p = data
    if masked:
        m1 = jnp.asarray([0.0, 1 / 0.9, 1 / 0.9, 0.0], jnp.float32)
        m2 = jnp.asarray([1 / 0.9, 0.0, 1 / 0.9, 1 / 0.9], jnp.float32)
    else:
        m1 = m2 = jnp.ones((B,), jnp.float32)
    got = _fused(x, p, m1, m2)
    want = _ref_layer(x, p, m1, m2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("masked", [False, True])
def test_gradient_parity(data, masked):
    x, g, p = data
    if masked:
        m1 = jnp.asarray([0.0, 1 / 0.9, 1.0, 1 / 0.9], jnp.float32)
        m2 = jnp.asarray([1 / 0.9, 1.0, 0.0, 1 / 0.9], jnp.float32)
    else:
        m1 = m2 = jnp.ones((B,), jnp.float32)

    def loss_fused(x, p):
        return jnp.sum(_fused(x, p, m1, m2) * g)

    def loss_ref(x, p):
        return jnp.sum(_ref_layer(x, p, m1, m2) * g)

    (dx_f, dp_f) = jax.grad(loss_fused, argnums=(0, 1))(x, p)
    (dx_r, dp_r) = jax.grad(loss_ref, argnums=(0, 1))(x, p)
    np.testing.assert_allclose(np.asarray(dx_f), np.asarray(dx_r), rtol=5e-4, atol=5e-4)
    for k in dp_r:
        np.testing.assert_allclose(
            np.asarray(dp_f[k]), np.asarray(dp_r[k]), rtol=5e-4, atol=5e-4,
            err_msg=f"grad mismatch for {k}",
        )


def test_rejects_ungroupable_shapes():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(3, 12, C).astype(np.float32))  # N % 8 != 0
    p = _params(rng)
    out = vit_layer_train(
        x, p["l1s"], p["l1b"], p["wqkv"], p["bqkv"], p["wp"], p["bp"],
        p["l2s"], p["l2b"], p["w1"], p["b1"], p["w2"], p["b2"],
        num_heads=H, dtype=jnp.float32,
    )
    assert out is None


def test_backbone_train_grads_fused_vs_plain():
    """VisionTransformer(fused_layers=True) in TRAIN mode routes through the
    custom-VJP kernel; its gradients must match the plain path (drop_path=0
    so both paths are deterministic and identical in expectation)."""
    from probpose_code_tpu.models.backbones.vit import VisionTransformer

    arch = dict(embed_dims=128, num_layers=2, num_heads=4, feedforward_channels=256)
    kw = dict(arch=arch, img_size=(64, 48), patch_size=16, patch_padding=2,
              dtype="bfloat16", approximate_gelu=True, drop_path_rate=0.0)
    std = VisionTransformer(**kw)
    fused = VisionTransformer(fused_layers=True, **kw)
    x = jax.random.uniform(jax.random.PRNGKey(2), (4, 64, 48, 3), jnp.float32)
    variables = std.init(jax.random.PRNGKey(0), x, train=False)
    assert jax.tree_util.tree_structure(variables) == jax.tree_util.tree_structure(
        fused.init(jax.random.PRNGKey(0), x, train=False))

    def loss(m):
        def f(v):
            out = m.apply(v, x, train=True, rngs={"dropout": jax.random.PRNGKey(3)})[0]
            return jnp.sum(out.astype(jnp.float32) ** 2)
        return f

    g_std = jax.grad(loss(std))(variables)["params"]
    g_fused = jax.grad(loss(fused))(variables)["params"]
    flat_s = jax.tree_util.tree_leaves_with_path(g_std)
    flat_f = dict(jax.tree_util.tree_leaves_with_path(g_fused))
    # bf16 compute both sides; layer-kernel reassociation tolerance
    for path, vs in flat_s:
        vf = flat_f[path]
        denom = np.abs(np.asarray(vs, np.float32)).max() + 1e-4
        err = np.abs(np.asarray(vf, np.float32) - np.asarray(vs, np.float32)).max() / denom
        assert err < 5e-2, f"{jax.tree_util.keystr(path)}: rel err {err:.4f}"


def test_backbone_train_drop_path_finite():
    """With drop_path>0 the fused train path draws per-image branch masks;
    gradients must stay finite and mask-consistent."""
    from probpose_code_tpu.models.backbones.vit import VisionTransformer

    arch = dict(embed_dims=128, num_layers=2, num_heads=4, feedforward_channels=256)
    fused = VisionTransformer(
        fused_layers=True, arch=arch, img_size=(64, 48), patch_size=16,
        patch_padding=2, dtype="bfloat16", approximate_gelu=True, drop_path_rate=0.5)
    x = jax.random.uniform(jax.random.PRNGKey(2), (4, 64, 48, 3), jnp.float32)
    variables = fused.init(jax.random.PRNGKey(0), x, train=False)

    def f(v):
        out = fused.apply(v, x, train=True, rngs={"dropout": jax.random.PRNGKey(7)})[0]
        return jnp.sum(out.astype(jnp.float32) ** 2)

    val, grads = jax.value_and_grad(f)(variables)
    assert np.isfinite(float(val))
    for leaf in jax.tree_util.tree_leaves(grads):
        assert np.isfinite(np.asarray(leaf, np.float32)).all()
