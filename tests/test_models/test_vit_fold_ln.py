"""Folded-LN fast path of the ViT backbone.

``fold_ln=True`` rewrites each pre-norm ``LayerNorm -> Dense`` pair as a
single matmul with the normalization folded in (models/backbones/vit.py:
``_folded_ln_dense``): LN(x)·W = σ⁻¹·(x·(γ⊙W)) − σ⁻¹µ·(γᵀW) + (βᵀW+b).
The parameter tree is identical to the standard path (checkpoints load
unchanged), and the math is algebraically identical up to float
reassociation — proven here in float64 where reassociation noise is ~1e-13.

Serving-perf note (v5e, measured): the fold is throughput-NEUTRAL — XLA
already prologue-fuses the normalize into the consumer matmul, so only the
stats reduce remains either way. Kept as an option because the equivalence
is useful for future layouts where the epilogue can ride the MXU.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from probpose_code_tpu.models.backbones.vit import TransformerBlock, VisionTransformer  # noqa: E402


def test_param_tree_identical():
    x = jnp.zeros((1, 64, 48, 3), jnp.float32)
    m0 = VisionTransformer(arch=dict(embed_dims=64, num_layers=2, num_heads=4, feedforward_channels=128), img_size=(64, 48))
    m1 = VisionTransformer(arch=dict(embed_dims=64, num_layers=2, num_heads=4, feedforward_channels=128), img_size=(64, 48), fold_ln=True)
    v0 = m0.init(jax.random.PRNGKey(0), x)
    v1 = m1.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(v0) == jax.tree_util.tree_structure(v1)
    assert jax.tree.map(lambda a: a.shape, v0) == jax.tree.map(lambda a: a.shape, v1)
    # identical seeds -> identical params, either path
    flat0 = jax.tree_util.tree_leaves(v0)
    flat1 = jax.tree_util.tree_leaves(v1)
    for a, b in zip(flat0, flat1):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_block_equivalence_f64():
    with jax.enable_x64(True):
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 48, 64), jnp.float64)
        m0 = TransformerBlock(64, 4, 128, dtype=jnp.float64)
        m1 = TransformerBlock(64, 4, 128, dtype=jnp.float64, fold_ln=True)
        v = jax.tree.map(lambda a: a.astype(jnp.float64), m0.init(jax.random.PRNGKey(0), x))
        with jax.default_matmul_precision("highest"):
            y0 = np.asarray(m0.apply(v, x))
            y1 = np.asarray(m1.apply(v, x))
    np.testing.assert_allclose(y0, y1, atol=1e-10)


def test_backbone_fold_forward_close():
    # full backbone, f32 with highest matmul precision: the two paths agree
    # to float-reassociation noise
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 48, 3), jnp.float32)
    arch = dict(embed_dims=64, num_layers=2, num_heads=4, feedforward_channels=128)
    m0 = VisionTransformer(arch=arch, img_size=(64, 48))
    m1 = VisionTransformer(arch=arch, img_size=(64, 48), fold_ln=True)
    v = m0.init(jax.random.PRNGKey(0), x)
    with jax.default_matmul_precision("highest"):
        y0 = np.asarray(m0.apply(v, x)[0])
        y1 = np.asarray(m1.apply(v, x)[0])
    np.testing.assert_allclose(y0, y1, atol=5e-5)
