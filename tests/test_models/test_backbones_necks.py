import probpose_code_tpu.models  # noqa: F401  (register components)
"""Backbone + neck shape tests (tiny inputs, CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from probpose_code_tpu.registry import MODELS


def run(module, x, **kwargs):
    variables = module.init(jax.random.PRNGKey(0), x, **kwargs)
    return module.apply(variables, x, **kwargs)


class TestBackbones:
    def test_resnet18(self):
        m = MODELS.build(dict(type="ResNet", depth=18, out_indices=(3,)))
        out = run(m, jnp.zeros((1, 64, 48, 3)))
        assert out[0].shape == (1, 2, 2, 512)

    def test_resnet50_multiout(self):
        m = MODELS.build(dict(type="ResNet", depth=50, out_indices=(0, 1, 2, 3)))
        outs = run(m, jnp.zeros((1, 64, 64, 3)))
        assert [o.shape[-1] for o in outs] == [256, 512, 1024, 2048]
        assert outs[0].shape[1] == 16 and outs[3].shape[1] == 2

    def test_resnext(self):
        m = MODELS.build(dict(type="ResNeXt", depth=50, out_indices=(3,)))
        out = run(m, jnp.zeros((1, 64, 48, 3)))
        assert out[0].shape[-1] == 2048

    def test_mobilenet_v2(self):
        m = MODELS.build(dict(type="MobileNetV2", widen_factor=1.0, out_indices=(7,)))
        out = run(m, jnp.zeros((1, 64, 48, 3)))
        assert out[0].shape == (1, 2, 2, 320)


class TestNecks:
    def _feats(self):
        return tuple(jnp.zeros((1, s, s, c)) for s, c in [(16, 32), (8, 64), (4, 128)])

    def test_fpn(self):
        m = MODELS.build(dict(type="FPN", in_channels=[32, 64, 128], out_channels=24))
        outs = run(m, self._feats())
        assert len(outs) == 3
        assert all(o.shape[-1] == 24 for o in outs)

    def test_feature_map_processor_concat(self):
        m = MODELS.build(dict(type="FeatureMapProcessor", concat=True))
        out = run(m, self._feats())
        assert out[0].shape == (1, 16, 16, 32 + 64 + 128)

    def test_feature_map_processor_select(self):
        m = MODELS.build(dict(type="FeatureMapProcessor", select_index=1))
        out = run(m, self._feats())
        assert out[0].shape == (1, 8, 8, 64)

    def test_gap(self):
        m = MODELS.build(dict(type="GlobalAveragePooling"))
        outs = run(m, self._feats())
        assert outs[0].shape == (1, 32)

    def test_channel_mapper(self):
        m = MODELS.build(dict(type="ChannelMapper", in_channels=[32, 64, 128], out_channels=48))
        outs = run(m, self._feats())
        assert all(o.shape[-1] == 48 for o in outs)

    def test_cspnext_pafpn(self):
        m = MODELS.build(
            dict(type="CSPNeXtPAFPN", in_channels=[32, 64, 128], out_channels=24, num_csp_blocks=1)
        )
        outs = run(m, self._feats())
        assert len(outs) == 3
        assert all(o.shape[-1] == 24 for o in outs)
        assert outs[0].shape[1] == 16 and outs[2].shape[1] == 4


def test_resnet_frozen_stages():
    """frozen_stages semantics (reference resnet.py:_freeze_stages): >=0
    freezes the stem, k>=1 freezes stages 1..k — zero grads for frozen
    params, live grads beyond, and frozen-stage BN stays in eval mode."""
    import jax
    import jax.numpy as jnp
    from probpose_code_tpu.registry import MODELS

    m = MODELS.build(dict(type="ResNet", depth=18, out_indices=(3,), frozen_stages=2))
    x = jnp.asarray(np.random.RandomState(0).rand(2, 64, 64, 3), jnp.float32)
    variables = m.init(jax.random.PRNGKey(0), x, train=False)

    def loss(params):
        out, updates = m.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, train=True, mutable=["batch_stats"])
        return jnp.sum(out[0] ** 2), updates

    (_, updates), grads = jax.value_and_grad(loss, has_aux=True)(variables["params"])
    gnorm = lambda tree: float(jax.tree_util.tree_reduce(
        lambda a, b: a + jnp.abs(b).sum(), tree, jnp.float32(0)))
    assert gnorm(grads["conv1"]) == 0.0  # stem frozen
    assert gnorm(grads["layer1_block0"]) == 0.0
    assert gnorm(grads["layer2_block0"]) == 0.0
    assert gnorm(grads["layer3_block0"]) > 0.0
    assert gnorm(grads["layer4_block0"]) > 0.0
    # frozen-stage BN ran in eval mode: running stats unchanged
    bs_old = variables["batch_stats"]
    bs_new = updates["batch_stats"]
    same = lambda k: np.allclose(np.asarray(bs_old[k]["bn1"]["mean"]),
                                 np.asarray(bs_new[k]["bn1"]["mean"]))
    assert same("layer1_block0") and same("layer2_block0")
    assert not same("layer3_block0")
