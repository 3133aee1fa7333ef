"""Device-side input pipeline (canvas warp + on-device target encode).

Verifies the deferred pipeline — ``TopdownAffine(device_warp=True)`` +
``GenerateTarget(device=True)`` + ``PoseModel.device_preprocess_batch`` —
reproduces the host pipeline (cv2.warpAffine + NumPy generate_probmaps)
numerically, and that the train step runs on the deferred batch.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from probpose_code_tpu.datasets import Compose  # noqa: E402
from probpose_code_tpu.ops.encode import (  # noqa: E402
    generate_probmaps_device,
    generate_udp_gaussian_device,
    probmap_encode_scales,
)
from probpose_code_tpu.ops.warp import warp_affine_batch  # noqa: E402

CODEC = dict(type="ProbMap", input_size=(192, 256), heatmap_size=(48, 64), sigma=-1)


def _sample(seed=0, h=300, w=400):
    rng = np.random.RandomState(seed)
    img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
    return dict(
        img=img,
        img_shape=(h, w),
        ori_shape=(h, w),
        bbox=np.array([[40.0, 30.0, 330.0, 280.0]], np.float32),
        bbox_score=np.ones(1, np.float32),
        keypoints=(rng.rand(1, 17, 2) * [w * 0.9, h * 0.9]).astype(np.float32),
        keypoints_visible=(rng.rand(1, 17) > 0.2).astype(np.float32),
        keypoints_visibility=(rng.rand(1, 17) > 0.5).astype(np.float32),
        flip_indices=list(range(17)),
        id=0,
        img_id=0,
    )


def _pipelines(device):
    affine = dict(type="TopdownAffine", input_size=(192, 256), use_udp=True, input_padding=1.25)
    target = dict(type="GenerateTarget", encoder=dict(CODEC))
    if device:
        affine.update(device_warp=True, canvas_size=(448, 448))
        target.update(device=True)
    return Compose([
        dict(type="GetBBoxCenterScale"),
        affine,
        target,
        dict(type="PackPoseInputs"),
    ])


def test_device_pipeline_matches_host():
    host = _pipelines(device=False)(_sample())
    dev = _pipelines(device=True)(_sample())

    # image warp parity: canvas warp on device vs cv2.warpAffine on host
    crop = warp_affine_batch(
        jnp.asarray(dev["canvas"][None], jnp.float32), jnp.asarray(dev["warp_mat"][None]), (192, 256)
    )[0]
    host_crop = np.asarray(host["inputs"], np.float32)
    # cv2 rounds the uint8 output; allow 1 intensity unit + tiny fp drift
    assert np.abs(np.asarray(crop) - host_crop).max() <= 1.0 + 1e-3

    # target parity: device probmap encode vs host generate_probmaps
    scales = probmap_encode_scales(17, (48, 64), -1.0)
    hm_dev = generate_probmaps_device(
        jnp.asarray(dev["device_kpts_hm"].reshape(1, 17, 2)),
        jnp.asarray(dev["device_kpts_visible"].reshape(1, 17)),
        (48, 64),
        scales,
    )[0]
    hm_host = np.asarray(host["data_samples"].gt_fields.heatmaps)
    np.testing.assert_allclose(np.asarray(hm_dev), hm_host, atol=2e-5)

    # auxiliary annotations identical
    h_lab = host["data_samples"].gt_instance_labels
    d_lab = dev["data_samples"].gt_instance_labels
    np.testing.assert_array_equal(
        np.asarray(h_lab["keypoint_weights"]), np.asarray(d_lab["keypoint_weights"])
    )
    h_inst = host["data_samples"].gt_instances
    d_inst = dev["data_samples"].gt_instances
    for key in ("in_image", "keypoints_visible", "keypoints_visibility"):
        np.testing.assert_array_equal(np.asarray(h_inst[key]), np.asarray(d_inst[key]))


def test_device_pipeline_roi_downscale():
    """ROI larger than the canvas: the fold-in scale keeps the crop close to
    the direct warp (a resample is inserted, so tolerance is loose)."""
    host = _pipelines(device=False)(_sample(h=600, w=800))
    affine = dict(
        type="TopdownAffine", input_size=(192, 256), use_udp=True, input_padding=1.25,
        device_warp=True, canvas_size=(320, 320),
    )
    dev = Compose([
        dict(type="GetBBoxCenterScale"),
        affine,
        dict(type="GenerateTarget", encoder=dict(CODEC), device=True),
        dict(type="PackPoseInputs"),
    ])(_sample(h=600, w=800))
    crop = warp_affine_batch(
        jnp.asarray(dev["canvas"][None], jnp.float32), jnp.asarray(dev["warp_mat"][None]), (192, 256)
    )[0]
    host_crop = np.asarray(host["inputs"], np.float32)
    # white-noise image downsampled then re-sampled: expect correlation, not
    # equality — check the mean abs error stays bounded and geometry aligns
    assert np.abs(np.asarray(crop) - host_crop).mean() < 40.0
    assert abs(float(np.asarray(crop).mean()) - float(host_crop.mean())) < 3.0


def test_udp_device_encode_matches_host():
    from probpose_code_tpu.codecs.utils.gaussian_heatmap import generate_udp_gaussian_heatmaps

    rng = np.random.RandomState(3)
    kpts = (rng.rand(1, 17, 2) * [47, 63] + rng.randn(1, 17, 2) * 8).astype(np.float32)
    vis = (rng.rand(1, 17) > 0.2).astype(np.float32)
    host_hm, host_w = generate_udp_gaussian_heatmaps((48, 64), kpts, vis, sigma=2.0)
    dev_hm = generate_udp_gaussian_device(jnp.asarray(kpts), jnp.asarray(vis), (48, 64), 2.0)[0]
    np.testing.assert_allclose(np.asarray(dev_hm), host_hm, atol=2e-5)


def test_train_step_on_device_batch():
    """End-to-end: deferred batch through loader collate + jitted train step."""
    from probpose_code_tpu.datasets.loader import collate_pose_samples
    from probpose_code_tpu.engine.optim import build_optimizer
    from probpose_code_tpu.models import PoseModel
    from probpose_code_tpu.parallel import create_train_state, make_mesh, make_train_step, shard_batch

    samples = [_pipelines(device=True)(_sample(seed=i)) for i in range(4)]
    batch = collate_pose_samples(samples)
    # rotation-free pipeline -> separable-warp batch keys
    assert batch["canvas_sep"].dtype == np.uint8
    batch.pop("data_samples")

    model_cfg = dict(
        type="TopdownPoseEstimator",
        data_preprocessor=dict(mean=[123.675, 116.28, 103.53], std=[58.395, 57.12, 57.375], bgr_to_rgb=True),
        backbone=dict(
            type="VisionTransformer",
            arch=dict(embed_dims=32, num_layers=2, num_heads=2, feedforward_channels=64),
            img_size=(256, 192), patch_size=16, with_cls_token=False, out_type="featmap",
            patch_padding=2, qkv_bias=True,
        ),
        head=dict(
            type="ProbMapHead", in_channels=32, out_channels=17,
            deconv_out_channels=(32, 32), deconv_kernel_sizes=(4, 4),
            keypoint_loss=dict(type="OKSHeatmapLoss", use_target_weight=True, smoothing_weight=0.05),
            probability_loss=dict(type="BCELoss", use_target_weight=True, use_sigmoid=True),
            visibility_loss=dict(type="BCELoss", use_target_weight=True, use_sigmoid=True),
            oks_loss=dict(type="MSELoss", use_target_weight=True),
            error_loss=dict(type="L1LogLoss", use_target_weight=True),
            freeze_error=True, freeze_oks=False,
            decoder=dict(CODEC),
        ),
        test_cfg=dict(flip_test=False),
    )
    model = PoseModel(model_cfg)
    model.init()
    import optax

    tx = optax.adamw(1e-4)
    mesh = make_mesh(n_data=2, devices=jax.devices()[:2])
    state = create_train_state(model.variables, tx)
    step = make_train_step(model, tx, mesh=mesh)
    device_batch = shard_batch({k: jnp.asarray(v) for k, v in batch.items()}, mesh)
    state, metrics = step(state, device_batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
