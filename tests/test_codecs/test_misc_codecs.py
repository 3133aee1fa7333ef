"""MotionBERTLabel, EDPoseLabel, Hand3DHeatmap codecs + InternetHead/PoseWarper."""

import numpy as np

from probpose_code_tpu.registry import KEYPOINT_CODECS
import probpose_code_tpu.codecs  # noqa: F401


def test_motionbert_label_encode():
    mb = KEYPOINT_CODECS.build(dict(type="MotionBERTLabel", num_keypoints=17, mode="test"))
    rng = np.random.RandomState(0)
    k2d = rng.rand(9, 17, 2) * 1000
    t3d = rng.rand(9, 17, 3) * 0.5 + np.array([0, 0, 3.0])
    cam = dict(w=1000, h=1000, f=[1145.0, 1144.0], c=[512.0, 515.0])
    enc = mb.encode(k2d, None, t3d, None, cam)
    assert enc["keypoint_labels"].shape == (9, 17, 2)
    assert np.abs(enc["keypoint_labels"]).max() <= 1.0 + 1e-6  # normalized
    # root-centered
    root = enc["lifting_target_label"][:, 0]
    np.testing.assert_allclose(root, 0, atol=1e-4)


def test_edpose_label_roundtrip():
    ed = KEYPOINT_CODECS.build(dict(type="EDPoseLabel", num_select=5))
    rng = np.random.RandomState(1)
    enc = ed.encode((640, 480), rng.rand(3, 17, 2) * 400, None,
                    np.array([1000.0, 900, 800]),
                    np.array([[10, 10, 100, 200], [50, 50, 200, 300], [5, 5, 50, 60]], np.float32))
    assert enc["bbox"].max() <= 1.0
    # decode follows the reference tuple convention: input_shapes is (h, w),
    # logits (nq, num_classes) sigmoided, keypoints in xyxy..zz layout
    bboxes, kpts, scores = ed.decode(
        (480, 640), rng.rand(20, 2), rng.rand(20, 4), rng.rand(20, 17 * 3)
    )
    assert kpts.shape == (5, 17, 2) and bboxes.shape == (5, 4) and scores.shape == (5, 17)
    assert (np.diff(scores[:, 0]) <= 1e-9).all()  # sorted desc
    assert kpts[..., 0].max() <= 640 and kpts[..., 1].max() <= 480


def test_hand3d_heatmap_roundtrip():
    h3d = KEYPOINT_CODECS.build(dict(type="Hand3DHeatmap", heatmap_size=(16, 16, 16), image_size=(64, 64)))
    rng = np.random.RandomState(2)
    kpts = np.concatenate([rng.rand(1, 42, 2) * 64, (rng.rand(1, 42, 1) - 0.5) * 300], -1)
    enc = h3d.encode(kpts, np.ones((1, 42)), hand_type=np.array([1, 0]), hand_type_valid=1)
    assert enc["heatmaps"].shape == (42 * 16, 16, 16)
    dk, ds = h3d.decode(enc["heatmaps"])
    err = np.abs(dk[0, :, :2] - kpts[0, :, :2])[enc["keypoint_weights"][0] > 0]
    assert err.mean() < 4.0  # within one heatmap cell (64/16 px)


def test_internet_head_and_posewarper():
    import jax
    import jax.numpy as jnp
    import jax.random as jr

    import probpose_code_tpu.models as M

    h = M.InternetHead(in_channels=256, num_keypoints=42, depth_size=16, deconv_out_channels=(64, 64))
    f = jnp.zeros((2, 8, 8, 256))
    vs = h.init(jr.PRNGKey(0), (f,), train=False)
    out = h.apply(vs, (f,))
    assert out["heatmaps"].shape == (2, 42, 16, 32, 32)
    assert out["root_depth"].shape == (2, 1) and out["hand_type"].shape == (2, 2)

    n = M.PoseWarperNeck(in_channels=32, out_channels=32, inner_channels=32, dilations=(1, 2), num_res_blocks=2)
    key = jnp.zeros((2, 16, 16, 32))
    sup = [jnp.ones((2, 16, 16, 32))]
    nv = n.init(jr.PRNGKey(0), key, sup, train=False)
    assert n.apply(nv, key, sup).shape == (2, 16, 16, 32)


def test_internet_head_loss_trains():
    """InternetHead loss: 3D heatmap MSE + root L1 + handedness BCE all
    gradient-connected through PoseModel."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from probpose_code_tpu.datasets.metainfo import parse_pose_metainfo
    from probpose_code_tpu.models import PoseModel

    cfg = dict(
        type="TopdownPoseEstimator",
        data_preprocessor=dict(mean=[0, 0, 0], std=[255, 255, 255]),
        backbone=dict(type="ResNet", depth=18, out_indices=(3,)),
        head=dict(
            type="InternetHead", in_channels=512, num_keypoints=42, depth_size=8,
            deconv_out_channels=(64, 64),
            decoder=dict(type="Hand3DHeatmap", image_size=(128, 128), heatmap_size=(16, 16, 8),
                         depth_size=8, sigma=2.5, max_bound=255),
        ),
        test_cfg=dict(flip_test=False, input_size=(128, 128)),
    )
    m = PoseModel(cfg, metainfo=parse_pose_metainfo({"dataset_name": "interhand3d"}))
    m.init(input_shape=(1, 128, 128, 3))
    rng = np.random.RandomState(0)
    B, K, D, Hh, Ww = 2, 42, 8, 16, 16
    batch = dict(
        inputs=jnp.asarray(rng.rand(B, 128, 128, 3).astype(np.float32) * 255),
        heatmaps=jnp.asarray(rng.rand(B, K * D, Hh, Ww).astype(np.float32)),
        keypoint_weights=jnp.ones((B, K), jnp.float32),
        root_depth=jnp.asarray(rng.rand(B, 1).astype(np.float32) * 64),
        root_depth_weight=jnp.ones((B, 1), jnp.float32),
        type=jnp.asarray(np.array([[1, 0], [1, 1]], np.float32)),
        type_weight=jnp.ones((B, 1), jnp.float32),
    )
    total, (losses, _) = m.loss_fn(m.variables, batch, rngs={"dropout": jax.random.PRNGKey(0)})
    for key in ("loss_kpt", "loss_rel_root", "loss_hand_type"):
        assert key in losses and np.isfinite(float(losses[key])), key
    grads = jax.grad(lambda p: m.loss_fn({**m.variables, "params": p}, batch,
                                         rngs={"dropout": jax.random.PRNGKey(0)})[0])(m.variables["params"])
    gn = sum(float(jnp.abs(g).sum()) for g in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(gn) and gn > 0


def test_yoloxpose_annotation_processor():
    proc = KEYPOINT_CODECS.build(dict(type="YOLOXPoseAnnotationProcessor", expand_bbox=True))
    kpts = np.array([[[5.0, 5.0], [50.0, 60.0], [20.0, 90.0]]])
    vis = np.array([[1.0, 1.0, 0.0]])  # last kpt invisible: excluded from expansion
    out = proc.encode(keypoints=kpts, keypoints_visible=vis,
                      bbox=np.array([[10.0, 10.0, 40.0, 40.0]]), category_id=[1])
    np.testing.assert_allclose(out["bbox"], [[5, 5, 50, 60]])
    assert out["bbox_labels"][0] == 0  # category ids become 0-based labels


def test_loss_wrappers():
    import jax.numpy as jnp

    from probpose_code_tpu.registry import MODELS

    mw = MODELS.build(dict(type="MultipleLossWrapper", losses=[
        dict(type="KeypointMSELoss"), dict(type="L1Loss")]))
    a, b = jnp.ones((1, 3, 4, 4)), jnp.zeros((1, 3, 4, 4))
    losses = mw([a, a[..., 0]], [b, b[..., 0]])
    assert len(losses) == 2 and all(float(v) == 1.0 for v in losses)

    cl = MODELS.build(dict(type="CombinedLoss", losses=dict(hm=dict(type="KeypointMSELoss"))))
    assert float(cl.hm(a, b)) == 1.0
    assert [n for n, _ in cl.items()] == ["hm"]
