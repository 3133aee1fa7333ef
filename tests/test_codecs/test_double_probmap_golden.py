"""DoubleProbMap codec vs reference golden fixtures (encode + both-window
decode; fixtures from tools/make_golden_dp.py)."""

import numpy as np
import pytest

from probpose_code_tpu.codecs import DoubleProbMap


@pytest.fixture(scope="module")
def codec():
    return DoubleProbMap(
        input_size=(192, 256), heatmap_size=(48, 64), sigma=-1,
        in_heatmap_padding=1.0, out_heatmap_padding=1.25,
    )


def test_encode_matches_reference(codec, golden):
    g = golden("double_probmap")
    enc = codec.encode(
        g["keypoints"].copy(), g["visible"].copy(), keypoints_visibility=g["visibility"].copy()
    )
    np.testing.assert_allclose(enc["heatmaps"], g["heatmaps"], atol=1e-5)
    np.testing.assert_allclose(enc["out_heatmaps"], g["out_heatmaps"], atol=1e-5)
    np.testing.assert_allclose(enc["keypoint_weights"], g["keypoint_weights"], atol=1e-6)
    np.testing.assert_allclose(enc["out_kpt_weights"], g["out_kpt_weights"], atol=1e-6)
    np.testing.assert_allclose(enc["in_image"].astype(np.float32), g["in_image"], atol=0)
    np.testing.assert_allclose(enc["annotated"].astype(np.float32), g["annotated"], atol=0)


@pytest.mark.parametrize("window", ["in", "out"])
def test_decode_matches_reference(codec, golden, window):
    g = golden("double_probmap")
    kpts, scores = codec.decode(g["decode_hm"].copy(), htm_type=window)
    np.testing.assert_allclose(kpts, g[f"dec_{window}_k"], atol=1e-3)
    np.testing.assert_allclose(scores, g[f"dec_{window}_s"], atol=1e-5)
