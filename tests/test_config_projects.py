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


def test_pose_anything_project(tmp_path):
    """PAM few-shot project: custom_imports registration, episode dataset,
    forward + train step with decreasing loss (reference project:
    /root/reference/projects/pose_anything)."""
    import json

    import cv2
    import jax
    import jax.numpy as jnp
    import optax

    from probpose_code_tpu.config import Config
    from probpose_code_tpu.registry import DATASETS, MODELS

    from probpose_code_tpu.utils.misc import register_all_modules

    register_all_modules()
    cfg = Config.fromfile(
        osp.join(REPO, "projects/pose_anything/configs/pam_resnet50_mp100_256x256.py"))
    assert "PoseAnythingModel" in MODELS and "FewShotKeypointDataset" in DATASETS

    # synthetic MP-100-style dataset: 2 categories, 3 instances each
    rng = np.random.RandomState(0)
    img_dir = tmp_path / "images"
    img_dir.mkdir()
    images, anns = [], []
    ann_id = 1
    for img_id in range(1, 7):
        img = (rng.rand(200, 200, 3) * 255).astype(np.uint8)
        cv2.imwrite(str(img_dir / f"{img_id}.jpg"), img)
        images.append(dict(id=img_id, file_name=f"{img_id}.jpg", width=200, height=200))
        cat = 1 + (img_id - 1) % 2
        K = 5 if cat == 1 else 4
        kpts = []
        for _ in range(K):
            kpts += [float(rng.uniform(40, 160)), float(rng.uniform(40, 160)), 2]
        anns.append(dict(id=ann_id, image_id=img_id, category_id=cat, bbox=[30.0, 30.0, 140.0, 140.0],
                         area=140.0 * 140.0, iscrowd=0, keypoints=kpts, num_keypoints=K))
        ann_id += 1
    gt = dict(images=images, annotations=anns, categories=[
        dict(id=1, name="catA", skeleton=[[1, 2], [2, 3], [3, 4], [4, 5]]),
        dict(id=2, name="catB", skeleton=[[1, 2], [2, 3], [3, 4]]),
    ])
    ann_file = tmp_path / "ann.json"
    ann_file.write_text(json.dumps(gt))

    ds = DATASETS.build(dict(
        type="FewShotKeypointDataset", ann_file=str(ann_file), img_dir=str(img_dir),
        img_size=(64, 64), num_episodes=8, max_kpts=8))
    sample = ds[0]
    assert sample["support_img"].shape == (64, 64, 3)
    assert sample["adjacency"].shape == (8, 8)

    from projects.pose_anything.datasets import collate_episodes
    from projects.pose_anything.models import pose_anything_loss

    batch = collate_episodes([ds[i] for i in range(4)])
    # normalize images (the full recipe does this in its data_preprocessor)
    batch["query_img"] = batch["query_img"] / 127.5 - 1.0
    batch["support_img"] = batch["support_img"] / 127.5 - 1.0

    model = MODELS.build(dict(
        type="PoseAnythingModel",
        backbone=MODELS.build(dict(type="ResNet", depth=18, out_indices=(3,))),
        head=MODELS.build(dict(type="GraphTransformerHead", in_channels=512, embed_dims=64,
                               num_layers=2, num_heads=4)),
    ))

    def loss_fn(params, batch):
        out = model.apply(params, jnp.asarray(batch["query_img"]), jnp.asarray(batch["support_img"]),
                          jnp.asarray(batch["support_kpts_norm"]), jnp.asarray(batch["support_mask"]),
                          jnp.asarray(batch["adjacency"]), train=False)
        losses = pose_anything_loss(out, {k: jnp.asarray(v) for k, v in batch.items()})
        return sum(v for k, v in losses.items() if k.startswith("loss")), losses

    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 64, 64, 3)),
                           jnp.zeros((1, 8, 2)), jnp.ones((1, 8)), jnp.zeros((1, 8, 8)))
    # head-only overfit on one episode batch: a stable learning check
    # (joint backbone training needs schedules this smoke test doesn't carry)
    labels = jax.tree_util.tree_map_with_path(
        lambda path, _: "head" if any(getattr(p, "key", "") == "head" for p in path) else "frozen",
        variables,
    )
    tx = optax.multi_transform({"head": optax.adam(3e-3), "frozen": optax.set_to_zero()}, labels)
    opt_state = tx.init(variables)

    @jax.jit
    def step(variables, opt_state, batch):
        (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(variables, batch)
        updates, opt_state = tx.update(grads, opt_state, variables)
        return optax.apply_updates(variables, updates), opt_state, total

    losses = []
    for i in range(30):
        variables, opt_state, total = step(variables, opt_state, batch)
        losses.append(float(total))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.8


def test_skps_project(tmp_path):
    """SKPS project: codec offset-field roundtrip, head forward, loss
    decreasing, device predict == codec decode (reference project:
    /root/reference/projects/skps)."""
    import jax
    import jax.numpy as jnp
    import optax

    from probpose_code_tpu.config import Config
    from probpose_code_tpu.registry import KEYPOINT_CODECS, MODELS
    from probpose_code_tpu.utils.misc import register_all_modules

    register_all_modules()
    cfg = Config.fromfile(
        osp.join(REPO, "projects/skps/configs/td-hm_hrnetv2-w18_skps-1xb64-80e_wflw-256x256.py"))
    assert cfg.model["head"]["type"] == "SKPSHead"
    assert "SKPSHead" in MODELS and "SKPSHeatmap" in KEYPOINT_CODECS

    from projects.skps.models import SKPSHead, skps_device_predict, skps_loss

    K = 5
    codec = KEYPOINT_CODECS.build(dict(type="SKPSHeatmap", input_size=(64, 64),
                                       heatmap_size=(16, 16), sigma=1.5))
    rng = np.random.RandomState(0)
    kpts = (rng.rand(1, K, 2) * 60 + 2).astype(np.float32)
    enc = codec.encode(kpts)
    assert enc["heatmaps"].shape == (K, 16, 16)
    assert enc["displacements"].shape == (2 * K, 16, 16)
    # offset field gives exact sub-pixel recovery at the argmax
    dec_kpts, dec_scores = codec.decode(enc["heatmaps"], enc["displacements"])
    np.testing.assert_allclose(dec_kpts[0], kpts[0], atol=0.5)

    head = SKPSHead(in_channels=32, out_channels=K, conv_out_channels=(32,), conv_kernel_sizes=(3,))
    x = jnp.asarray(rng.rand(2, 16, 16, 32).astype(np.float32))
    vs = head.init(jax.random.PRNGKey(0), [x], train=False)
    hm, off = head.apply(vs, [x], train=False)
    assert hm.shape == (2, K, 16, 16) and off.shape == (2, 2 * K, 16, 16)

    # loss decreases on a fixed batch
    heatmap_loss = MODELS.build(dict(type="AdaptiveWingLoss", use_target_weight=True))
    offside_loss = MODELS.build(dict(type="AdaptiveWingLoss", use_target_weight=True))
    batch = dict(
        heatmaps=jnp.asarray(np.stack([enc["heatmaps"]] * 2)),
        displacements=jnp.asarray(np.stack([enc["displacements"]] * 2)),
        keypoint_weights=jnp.ones((2, K), jnp.float32),
    )

    def loss_fn(params, state):
        out, new_state = head.apply(
            {"params": params, **state}, [x], train=True, mutable=["batch_stats"])
        losses = skps_loss(out, batch, heatmap_loss, offside_loss)
        return losses["loss_heatmap"] + losses["loss_offside"], new_state

    params = vs["params"]
    state = {"batch_stats": vs["batch_stats"]}
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    first = last = None
    for _ in range(6):
        (val, new_state), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, state)
        updates, opt_state = opt.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        state = new_state
        first = val if first is None else first
        last = val
    assert float(last) < float(first)

    # jitted device predict agrees with the numpy codec decode
    pred = skps_device_predict((batch["heatmaps"], batch["displacements"]), input_size=(64, 64))
    np.testing.assert_allclose(np.asarray(pred["keypoints"][0]), dec_kpts[0], atol=1e-3)


def test_uniformer_project():
    """UniFormer project: config registration + multi-scale forward with
    window/hybrid stage-3 attention (reference project:
    /root/reference/projects/uniformer)."""
    import jax
    import jax.numpy as jnp

    from probpose_code_tpu.config import Config
    from probpose_code_tpu.registry import MODELS
    from probpose_code_tpu.utils.misc import register_all_modules

    register_all_modules()
    cfg = Config.fromfile(
        osp.join(REPO, "projects/uniformer/configs/td-hm_uniformer-s-8xb128-210e_coco-256x192.py"))
    assert cfg.model["backbone"]["type"] == "UniFormer" and "UniFormer" in MODELS

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(1, 64, 48, 3).astype(np.float32))
    for kwargs in (dict(), dict(use_window=True, window_size=4), dict(use_hybrid=True, window_size=4)):
        bb = MODELS.build(dict(
            type="UniFormer", depths=[1, 1, 2, 1], embed_dims=[16, 32, 64, 128],
            head_dim=16, drop_path_rate=0.1, **kwargs))
        vs = bb.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, x, train=False)
        outs = bb.apply(vs, x, train=False)
        assert [o.shape for o in outs] == [
            (1, 16, 12, 16), (1, 8, 6, 32), (1, 4, 3, 64), (1, 2, 2, 128)]
        assert all(np.isfinite(np.asarray(o)).all() for o in outs)
    # stochastic depth path runs under train with a dropout rng
    outs = bb.apply(vs, x, train=True, rngs={"dropout": jax.random.PRNGKey(2)},
                    mutable=["batch_stats"])[0]
    assert np.isfinite(np.asarray(outs[-1])).all()


def test_just_dance_similarity_oracle():
    """Just Dance similarity vs the path-loaded REFERENCE torch module
    (reference projects/just_dance/calculate_similarity.py imports only
    numpy + torch, so the genuine source is the oracle)."""
    import importlib.util

    import pytest

    torch = pytest.importorskip("torch")  # noqa: F841

    spec = importlib.util.spec_from_file_location(
        "ref_jd_sim", "/root/reference/projects/just_dance/calculate_similarity.py")
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)

    import sys
    sys.path.insert(0, REPO)
    from projects.just_dance.calculate_similarity import (
        calculate_similarity, select_piece_from_similarity)
    from projects.just_dance.utils import get_smoothed_kpt

    rng = np.random.RandomState(0)
    T1, T2 = 26, 30  # min not divisible by 4: covers the floor-of-negative diagonal cut
    tch = np.concatenate([rng.rand(T1, 17, 2) * 192, rng.rand(T1, 17, 1)], -1).astype(np.float32)
    stu = np.concatenate([rng.rand(T2, 17, 2) * 192, rng.rand(T2, 17, 1)], -1).astype(np.float32)
    # some fully-invisible frames to exercise the nan path
    stu[3, :, 2] = 0.0

    ours = calculate_similarity(tch.copy(), stu.copy())
    theirs = ref.calculate_similarity(tch.copy(), stu.copy()).cpu().numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-5, rtol=1e-4)

    piece_ours = select_piece_from_similarity(ours)
    piece_ref = ref.select_piece_from_similarity(ref.calculate_similarity(tch.copy(), stu.copy()))
    assert piece_ours["stu_start"] == piece_ref["stu_start"]
    assert piece_ours["tch_start"] == piece_ref["tch_start"]
    assert piece_ours["length"] == piece_ref["length"]
    np.testing.assert_allclose(piece_ours["similarity"], piece_ref["similarity"], atol=2e-5)

    # smoothing helper: weighted average stays within the window's hull
    kpts = np.concatenate([rng.rand(9, 17, 2) * 100, np.ones((9, 17, 1))], -1).astype(np.float32)
    sm = get_smoothed_kpt(kpts, 4, 5)
    assert sm.shape == (17, 3)
    assert (sm[:, :2] >= kpts[2:7, :, :2].min(0) - 1e-4).all()
    assert (sm[:, :2] <= kpts[2:7, :, :2].max(0) + 1e-4).all()


def test_mmpose4aigc_openpose_drawing():
    """mmpose4aigc: COCO-17 -> OpenPose-18 conversion + skeleton render
    (reference projects/mmpose4aigc/openpose_visualization.py)."""
    import sys

    sys.path.insert(0, REPO)
    from projects.mmpose4aigc.openpose_visualization import (
        coco17_to_openpose18, draw_openpose_skeleton)

    rng = np.random.RandomState(0)
    kpts = np.concatenate([rng.rand(2, 17, 2) * 200 + 20, np.full((2, 17, 1), 0.9)], -1)
    k18 = coco17_to_openpose18(kpts.copy(), kpt_thr=0.4)
    assert k18.shape == (2, 18, 3)
    # openpose joint 1 (index 1) is the synthesized neck = shoulder midpoint
    np.testing.assert_allclose(k18[:, 1, :2], (kpts[:, 5, :2] + kpts[:, 6, :2]) / 2)
    # low shoulder confidence zeroes the neck
    low = kpts.copy()
    low[:, 5, 2] = 0.1
    assert (coco17_to_openpose18(low, kpt_thr=0.4)[:, 1, 2] == 0).all()

    img = draw_openpose_skeleton((256, 256), k18, kpt_thr=0.4)
    assert img.shape == (256, 256, 3) and img.dtype == np.uint8
    assert img.max() > 0  # something was drawn
