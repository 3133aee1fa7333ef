"""Round-trip / shape tests for the extended codec set."""

import numpy as np
import pytest

from probpose_code_tpu.registry import KEYPOINT_CODECS


def make_keypoints(n=1, k=17, w=192, h=256, margin=0.2, seed=0):
    rng = np.random.RandomState(seed)
    kpts = np.stack(
        [rng.uniform(margin * w, (1 - margin) * w, (n, k)), rng.uniform(margin * h, (1 - margin) * h, (n, k))],
        axis=-1,
    ).astype(np.float32)
    return kpts, np.ones((n, k), dtype=np.float32)


def test_double_probmap_roundtrip():
    codec = KEYPOINT_CODECS.build(
        dict(type="DoubleProbMap", input_size=(192, 256), heatmap_size=(48, 64), sigma=-1,
             in_heatmap_padding=1.0, out_heatmap_padding=1.25)
    )
    kpts, vis = make_keypoints()
    enc = codec.encode(kpts.copy(), vis.copy())
    assert enc["heatmaps"].shape == (17, 64, 48)
    assert enc["out_heatmaps"].shape == (1, 17, 64, 48)
    dec_in, _ = codec.decode(enc["heatmaps"], htm_type="in")
    dec_out, _ = codec.decode(enc["out_heatmaps"][0], htm_type="out")
    assert np.linalg.norm(dec_in - kpts, axis=-1).max() < 5.0
    assert np.linalg.norm(dec_out - kpts, axis=-1).max() < 6.0


def test_megvii_roundtrip():
    codec = KEYPOINT_CODECS.build(dict(type="MegviiHeatmap", input_size=(192, 256), heatmap_size=(48, 64), kernel_size=11))
    kpts, vis = make_keypoints()
    enc = codec.encode(kpts.copy(), vis.copy())
    assert enc["heatmaps"].shape == (17, 64, 48)
    assert enc["heatmaps"].max() == pytest.approx(255.0, rel=1e-3)
    dec, scores = codec.decode(enc["heatmaps"])
    assert np.linalg.norm(dec - kpts, axis=-1).max() < 8.0


def test_integral_regression_roundtrip():
    codec = KEYPOINT_CODECS.build(
        dict(type="IntegralRegressionLabel", input_size=(192, 256), heatmap_size=(48, 64), sigma=2.0)
    )
    kpts, vis = make_keypoints()
    enc = codec.encode(kpts.copy(), vis.copy())
    assert enc["heatmaps"].shape == (17, 64, 48)
    np.testing.assert_allclose(enc["heatmaps"].sum(axis=(1, 2)), 1.0, atol=1e-4)
    dec, _ = codec.decode(enc["keypoint_labels"])
    np.testing.assert_allclose(dec, kpts, atol=1e-3)


def test_associative_embedding_decode():
    codec = KEYPOINT_CODECS.build(
        dict(
            type="AssociativeEmbedding",
            input_size=(512, 512),
            heatmap_size=(128, 128),
            sigma=2.0,
            decode_keypoint_order=list(range(17)),
            decode_keypoint_thr=0.1,
        )
    )
    # two instances with well-separated tags
    kpts, vis = make_keypoints(n=2, w=512, h=512, seed=3)
    kpts[1] += 100  # separate the instances spatially
    kpts = np.clip(kpts, 20, 480)
    enc = codec.encode(kpts.copy(), vis.copy())
    assert enc["heatmaps"].shape == (17, 128, 128)
    assert enc["keypoint_indices"].shape == (2, 17, 2)

    # synth tag maps: instance 0 -> tag 0, instance 1 -> tag 5
    heatmaps = enc["heatmaps"][None]
    tags = np.zeros((1, 17, 128, 128), dtype=np.float32)
    for n, tag_val in [(0, 0.0), (1, 5.0)]:
        for k in range(17):
            x, y = (kpts[n, k] / codec.scale_factor).astype(int)
            tags[0, k, max(0, y - 3):y + 4, max(0, x - 3):x + 4] = tag_val
    batch_kpts, batch_scores, inst_scores = codec.batch_decode(heatmaps, tags)
    assert len(batch_kpts) == 1
    assert batch_kpts[0].shape[0] == 2  # both instances found
    # decoded keypoints near the encoded ones (input space)
    dists = np.linalg.norm(np.sort(batch_kpts[0], axis=0) - np.sort(kpts, axis=0), axis=-1)
    assert np.median(dists) < 8.0


def test_spr_roundtrip():
    codec = KEYPOINT_CODECS.build(
        dict(
            type="SPR",
            input_size=(512, 512),
            heatmap_size=(128, 128),
            sigma=(4, 2),
            generate_keypoint_heatmaps=True,
            minimal_diagonal_length=5,
        )
    )
    kpts, vis = make_keypoints(n=2, w=512, h=512, seed=4)
    kpts[1] = np.clip(kpts[1] + 120, 30, 480)
    enc = codec.encode(kpts.copy(), vis.copy())
    assert enc["heatmaps"].shape == (18, 128, 128)
    assert enc["displacements"].shape == (34, 128, 128)

    dec_kpts, (root_scores, kpt_scores) = codec.decode(enc["heatmaps"], enc["displacements"])
    assert dec_kpts.shape[0] >= 1
    assert kpt_scores is not None
    best = dec_kpts[0]  # strongest root
    errs = np.linalg.norm(best[None] - kpts, axis=-1).mean(axis=-1)
    assert errs.min() < 10.0  # matches one of the GT instances


def test_decoupled_heatmap_roundtrip():
    codec = KEYPOINT_CODECS.build(
        dict(type="DecoupledHeatmap", input_size=(512, 512), heatmap_size=(128, 128))
    )
    np.random.seed(0)
    kpts, vis = make_keypoints(n=2, w=512, h=512, seed=5)
    kpts[1] = np.clip(kpts[1] + 100, 30, 480)
    enc = codec.encode(kpts.copy(), vis.copy())
    assert enc["heatmaps"].shape == (18, 128, 128)
    N = enc["instance_coords"].shape[0]
    assert enc["instance_heatmaps"].shape[0] == N * 17 or enc["instance_heatmaps"].shape[0] == N
    inst_hm = enc["instance_heatmaps"].reshape(N, 17, 128, 128)
    dec, scores = codec.decode(inst_hm, np.ones((N, 1), np.float32))
    assert dec.shape == (N, 17, 2)
