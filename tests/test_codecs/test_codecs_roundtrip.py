"""Codec round-trip tests following the reference test strategy
(tests/test_codecs/*: encode random in-bounds keypoints, decode, compare)."""

import numpy as np
import pytest

from probpose_code_tpu.registry import KEYPOINT_CODECS


def make_keypoints(n=1, k=17, w=192, h=256, margin=0.15, seed=0):
    rng = np.random.RandomState(seed)
    kpts = np.stack(
        [rng.uniform(margin * w, (1 - margin) * w, (n, k)), rng.uniform(margin * h, (1 - margin) * h, (n, k))],
        axis=-1,
    ).astype(np.float32)
    visible = np.ones((n, k), dtype=np.float32)
    return kpts, visible


@pytest.mark.parametrize(
    "cfg,tol",
    [
        (dict(type="ProbMap", input_size=(192, 256), heatmap_size=(48, 64), sigma=-1), 5.0),
        (dict(type="ArgMaxProbMap", input_size=(192, 256), heatmap_size=(48, 64), sigma=-1), 5.0),
        (dict(type="UDPHeatmap", input_size=(192, 256), heatmap_size=(48, 64), sigma=2.0), 4.0),
        (dict(type="MSRAHeatmap", input_size=(192, 256), heatmap_size=(48, 64), sigma=2.0), 5.0),
        (dict(type="MSRAHeatmap", input_size=(192, 256), heatmap_size=(48, 64), sigma=2.0, unbiased=True), 4.0),
        (dict(type="UDPExpMaxHeatmap", input_size=(192, 256), heatmap_size=(48, 64), sigma=2.0), 5.0),
    ],
)
def test_heatmap_codec_roundtrip(cfg, tol):
    codec = KEYPOINT_CODECS.build(cfg)
    kpts, visible = make_keypoints()
    encoded = codec.encode(kpts.copy(), visible.copy())
    assert encoded["heatmaps"].shape[1:] == (64, 48)
    assert encoded["keypoint_weights"].shape == (1, 17)

    decoded, scores = codec.decode(encoded["heatmaps"])
    assert decoded.shape == (1, 17, 2)
    assert scores.shape == (1, 17)
    # decode should land within `tol` input-space pixels of the encoding
    err = np.linalg.norm(decoded - kpts, axis=-1)
    assert err.max() < tol, f"max roundtrip err {err.max():.2f}px"


def test_simcc_roundtrip():
    codec = KEYPOINT_CODECS.build(
        dict(type="SimCCLabel", input_size=(192, 256), sigma=6.0, simcc_split_ratio=2.0)
    )
    kpts, visible = make_keypoints()
    encoded = codec.encode(kpts.copy(), visible.copy())
    assert encoded["keypoint_x_labels"].shape == (1, 17, 384)
    assert encoded["keypoint_y_labels"].shape == (1, 17, 512)
    decoded, scores = codec.decode(encoded["keypoint_x_labels"], encoded["keypoint_y_labels"])
    err = np.linalg.norm(decoded - kpts, axis=-1)
    assert err.max() < 1.0


def test_regression_roundtrip():
    codec = KEYPOINT_CODECS.build(dict(type="RegressionLabel", input_size=(192, 256)))
    kpts, visible = make_keypoints()
    encoded = codec.encode(kpts.copy(), visible.copy())
    decoded, scores = codec.decode(encoded["keypoint_labels"])
    np.testing.assert_allclose(decoded, kpts, atol=1e-3)


def test_probmap_aux_outputs():
    codec = KEYPOINT_CODECS.build(dict(type="ProbMap", input_size=(192, 256), heatmap_size=(48, 64), sigma=-1))
    kpts, visible = make_keypoints()
    kpts[0, 0] = (-50, 100)  # push one keypoint out of the image
    visible[0, 1] = 0.0
    enc = codec.encode(kpts.copy(), visible.copy())
    assert not enc["in_image"][0, 0]
    assert enc["in_image"][0, 2]
    assert enc["annotated"][0, 0]
    assert not enc["annotated"][0, 1]
