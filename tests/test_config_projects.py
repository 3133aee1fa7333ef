"""projects/ extension workflow: custom_imports registers project modules."""

import os.path as osp

import numpy as np

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))


def test_example_project_config_registers_and_builds():
    import jax
    import jax.numpy as jnp

    from probpose_code_tpu.config import Config
    from probpose_code_tpu.registry import MODELS

    cfg = Config.fromfile(
        osp.join(REPO, "projects/example_project/configs/"
                       "example-head-loss_hrnet-w32_8xb64-210e_coco-256x192.py"))
    assert cfg.model["head"]["type"] == "ExampleHead"
    assert "ExampleHead" in MODELS
    assert "ExampleLoss" in MODELS

    head = MODELS.build(dict(type="ExampleHead", in_channels=8, out_channels=3,
                             deconv_out_channels=None, deconv_kernel_sizes=None))
    x = jnp.asarray(np.random.RandomState(0).rand(2, 16, 12, 8).astype(np.float32))
    vs = head.init(jax.random.PRNGKey(0), [x], train=False)
    out = head.apply(vs, [x], train=False)
    assert out.shape == (2, 3, 16, 12)  # (B, K, H, W)

    loss = MODELS.build(dict(type="ExampleLoss", use_target_weight=True))
    o = jnp.ones((2, 3, 4, 4)) * 0.5
    t = jnp.zeros((2, 3, 4, 4))
    w = jnp.ones((2, 3))
    assert np.isclose(float(loss(o, t, w)), 0.25)
