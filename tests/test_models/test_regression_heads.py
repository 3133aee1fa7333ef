"""Regression-head family: forward/loss/predict with a tiny ResNet-free CNN."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from probpose_code_tpu.datasets.metainfo import parse_pose_metainfo
from probpose_code_tpu.models import PoseModel

BASE = dict(
    type="TopdownPoseEstimator",
    data_preprocessor=dict(mean=[0, 0, 0], std=[255, 255, 255], bgr_to_rgb=False),
    backbone=dict(
        type="CSPNeXt", arch="P5", deepen_factor=0.2, widen_factor=0.125, out_indices=(4,),
    ),
    test_cfg=dict(flip_test=True),
)


def make_model(head_cfg):
    cfg = dict(BASE)
    cfg["head"] = head_cfg
    m = PoseModel(cfg, metainfo=parse_pose_metainfo({"dataset_name": "coco"}))
    m.init(input_shape=(1, 256, 192, 3))
    return m


def make_batch(b=2, seed=0):
    rng = np.random.RandomState(seed)
    return dict(
        inputs=jnp.asarray(rng.randint(0, 255, (b, 256, 192, 3)).astype(np.float32)),
        keypoint_labels=jnp.asarray(rng.rand(b, 17, 2).astype(np.float32)),
        keypoint_weights=jnp.ones((b, 17), jnp.float32),
    )


def test_regression_head():
    m = make_model(
        dict(type="RegressionHead", in_channels=128, num_joints=17,
             loss=dict(type="SmoothL1Loss", use_target_weight=True),
             decoder=dict(type="RegressionLabel", input_size=(192, 256)))
    )
    out = m.forward(m.variables, make_batch()["inputs"])
    assert out.shape == (2, 17, 2)
    total, (losses, _) = m.loss_fn(m.variables, make_batch(), rngs={"dropout": jax.random.PRNGKey(0)})
    assert np.isfinite(float(total))
    preds = m.make_predict(jit=False)(m.variables, make_batch()["inputs"])
    assert preds["keypoints"].shape == (2, 17, 2)


def test_rle_head():
    m = make_model(
        dict(type="RLEHead", in_channels=128, num_joints=17,
             loss=dict(type="RLELoss", use_target_weight=True, residual=True),
             decoder=dict(type="RegressionLabel", input_size=(192, 256)))
    )
    out = m.forward(m.variables, make_batch()["inputs"])
    assert out.shape == (2, 17, 4)
    total, (losses, _) = m.loss_fn(m.variables, make_batch(), rngs={"dropout": jax.random.PRNGKey(0)})
    assert np.isfinite(float(total))
    preds = m.make_predict(jit=False)(m.variables, make_batch()["inputs"])
    assert preds["keypoints"].shape == (2, 17, 2)
    assert preds["keypoint_scores"].shape == (2, 17)

    # the RealNVP flow trains jointly: its params exist and receive grads
    flow_params = m.variables["params"]["head"]["flow"]
    assert "s0" in flow_params and "t5" in flow_params
    grads = jax.grad(lambda v: m.loss_fn(v, make_batch(), rngs={"dropout": jax.random.PRNGKey(0)})[0])(
        m.variables
    )["params"]["head"]["flow"]
    gnorm = sum(float(jnp.abs(g).sum()) for g in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(gnorm) and gnorm > 0, "flow received no gradient — residual term is a no-op"


def _torch_flow_log_prob(flow_params, x):
    """Torch oracle of the RealNVP log-density (reference realnvp.py math)."""
    import torch

    masks = torch.tensor([[0.0, 1.0], [1.0, 0.0]] * 3)

    def net(h, p, final_tanh):
        for i in range(3):
            W = torch.as_tensor(np.asarray(p[f"Dense_{i}"]["kernel"])).T
            b = torch.as_tensor(np.asarray(p[f"Dense_{i}"]["bias"]))
            h = torch.nn.functional.linear(h, W, b)
            if i < 2:
                h = torch.nn.functional.leaky_relu(h, 0.01)
        return torch.tanh(h) if final_tanh else h

    log_det, z = torch.zeros(x.shape[0], dtype=x.dtype), x
    for i in reversed(range(6)):
        m = masks[i]
        z_ = m * z
        s = net(z_, flow_params[f"s{i}"], True) * (1 - m)
        t = net(z_, flow_params[f"t{i}"], False) * (1 - m)
        z = (1 - m) * (z - t) * torch.exp(-s) + z_
        log_det = log_det - s.sum(dim=1)
    prior = -0.5 * (z**2).sum(dim=1) - float(np.log(2 * np.pi))
    return prior + log_det


@pytest.mark.parametrize("residual", [True, False])
def test_rle_loss_matches_torch_oracle(residual):
    """Loss value AND gradients (pred, raw sigma) match an independent torch
    implementation of the reference RLELoss + RealNVP math, with the flow
    evaluated at trained (non-identity) parameters."""
    import torch

    from probpose_code_tpu.models.losses.regression_loss import RLELoss
    from probpose_code_tpu.models.utils.realnvp import RealNVP

    rng = np.random.RandomState(3)
    B, K = 4, 17
    pred = rng.randn(B, K, 2).astype(np.float32) * 0.1 + 0.5
    sigma_raw = rng.randn(B, K, 2).astype(np.float32)
    target = rng.rand(B, K, 2).astype(np.float32)
    weights = (rng.rand(B, K) > 0.2).astype(np.float32)

    flow = RealNVP()
    fv = flow.init(jax.random.PRNGKey(1), jnp.zeros((1, 2)))
    # perturb so the flow is NOT the near-identity init
    fv = jax.tree_util.tree_map(lambda p: p + 0.05 * np.random.RandomState(0).randn(*p.shape).astype(np.float32), fv)

    def log_phi_fn(err):
        return flow.apply(fv, err.reshape(-1, 2)).reshape(B, K)

    loss = RLELoss(use_target_weight=True, residual=residual)

    def jax_loss(pred_j, sigma_j):
        return loss(pred_j, sigma_j, jnp.asarray(target), jnp.asarray(weights), log_phi_fn=log_phi_fn)

    val = float(jax_loss(jnp.asarray(pred), jnp.asarray(sigma_raw)))
    gp, gs = jax.grad(jax_loss, argnums=(0, 1))(jnp.asarray(pred), jnp.asarray(sigma_raw))

    # torch oracle
    tp = torch.tensor(pred, requires_grad=True)
    ts = torch.tensor(sigma_raw, requires_grad=True)
    tw = torch.tensor(weights)
    tt = torch.tensor(target)
    sigma = torch.sigmoid(ts)
    error = (tp - tt) / (sigma + 1e-9)
    log_phi = _torch_flow_log_prob(fv["params"], error.reshape(-1, 2)).reshape(B, K, 1)
    nf = torch.log(sigma) - log_phi
    tl = nf + torch.log(sigma * 2) + torch.abs(error) if residual else nf
    tl = tl * tw.unsqueeze(-1)
    tl = (tl / B).sum()
    tl.backward()

    np.testing.assert_allclose(val, float(tl), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gp), tp.grad.numpy(), rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gs), ts.grad.numpy(), rtol=1e-3, atol=1e-5)


def test_integral_head():
    m = make_model(
        dict(type="IntegralRegressionHead", in_channels=128, in_featuremap_size=(6, 8), num_joints=17,
             deconv_out_channels=(32, 32), deconv_kernel_sizes=(4, 4),
             loss=dict(type="SmoothL1Loss", use_target_weight=True),
             decoder=dict(type="IntegralRegressionLabel", input_size=(192, 256), heatmap_size=(48, 64), sigma=2.0))
    )
    coords, heatmaps = m.forward(m.variables, make_batch()["inputs"])
    assert coords.shape == (2, 17, 2)
    assert heatmaps.shape[1] == 17
    total, _ = m.loss_fn(m.variables, make_batch(), rngs={"dropout": jax.random.PRNGKey(0)})
    assert np.isfinite(float(total))
    preds = m.make_predict(jit=False)(m.variables, make_batch()["inputs"])
    assert preds["keypoints"].shape == (2, 17, 2)


def test_realnvp_log_prob():
    from probpose_code_tpu.models.utils.realnvp import RealNVP

    flow = RealNVP()
    x = jnp.asarray(np.random.RandomState(0).randn(32, 2).astype(np.float32))
    variables = flow.init(jax.random.PRNGKey(0), x)
    logp = flow.apply(variables, x)
    assert logp.shape == (32,)
    assert np.isfinite(np.asarray(logp)).all()
    # near-gaussian at init (xavier gain 0.01 -> near-identity flow)
    ref = -0.5 * (np.asarray(x) ** 2).sum(1) - np.log(2 * np.pi)
    np.testing.assert_allclose(np.asarray(logp), ref, atol=0.5)
