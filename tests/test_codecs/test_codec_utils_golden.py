"""Golden-value tests: codec numeric kernels vs reference outputs.

Fixtures in tests/golden/*.npz hold inputs + outputs captured from the
reference implementation (see tools/make_golden.py). These tests prove the
vectorized rewrites are numerically faithful.
"""

import numpy as np
import pytest

from probpose_code_tpu.codecs.utils import (
    gaussian_blur,
    generate_gaussian_heatmaps,
    generate_offset_heatmap,
    generate_probmaps,
    generate_udp_gaussian_heatmaps,
    generate_unbiased_gaussian_heatmaps,
    get_heatmap_expected_value,
    get_heatmap_maximum,
    get_simcc_maximum,
    refine_keypoints,
    refine_keypoints_dark,
    refine_keypoints_dark_udp,
    refine_simcc_dark,
)

W_HM, H_HM = 48, 64


class TestProbMaps:
    @pytest.mark.parametrize("mode,sigma", [("adaptive", -1.0), ("fixed", 0.8)])
    def test_generate_probmaps(self, golden, mode, sigma):
        g = golden("probmaps")
        hm, w = generate_probmaps((W_HM, H_HM), g["keypoints"].copy(), g["visible"].copy(), sigma=sigma)
        np.testing.assert_allclose(hm, g[f"probmap_{mode}_heatmaps"], atol=1e-6)
        np.testing.assert_allclose(w, g[f"probmap_{mode}_weights"], atol=0)


class TestGaussianMaps:
    def test_msra(self, golden):
        g = golden("gaussians")
        hm, w = generate_gaussian_heatmaps((W_HM, H_HM), g["keypoints"].copy(), g["visible"].copy(), sigma=2.0)
        np.testing.assert_allclose(hm, g["msra"], atol=1e-6)
        np.testing.assert_allclose(w, g["msra_w"], atol=0)

    def test_unbiased(self, golden):
        g = golden("gaussians")
        hm, w = generate_unbiased_gaussian_heatmaps(
            (W_HM, H_HM), g["keypoints"].copy(), g["visible"].copy(), sigma=2.0
        )
        np.testing.assert_allclose(hm, g["unbiased"], atol=1e-6)
        np.testing.assert_allclose(w, g["unbiased_w"], atol=0)

    def test_udp(self, golden):
        g = golden("gaussians")
        hm, w = generate_udp_gaussian_heatmaps((W_HM, H_HM), g["keypoints"].copy(), g["visible"].copy(), sigma=2.0)
        np.testing.assert_allclose(hm, g["udp"], atol=1e-6)
        np.testing.assert_allclose(w, g["udp_w"], atol=0)

    def test_offset(self, golden):
        g = golden("gaussians")
        hm, w = generate_offset_heatmap(
            (W_HM, H_HM), g["keypoints"][:1].copy(), g["visible"][:1].copy(), 0.0546875
        )
        np.testing.assert_allclose(hm, g["offset"], atol=1e-6)
        np.testing.assert_allclose(w, g["offset_w"], atol=0)


class TestDecode:
    def test_heatmap_maximum(self, golden):
        g = golden("decode")
        locs, vals = get_heatmap_maximum(g["heatmaps"].copy())
        np.testing.assert_allclose(locs, g["locs_max"], atol=0)
        np.testing.assert_allclose(vals, g["vals_max"], atol=0)

    def test_expected_value(self, golden):
        g = golden("decode")
        locs, vals = get_heatmap_expected_value(g["heatmaps"].copy())
        np.testing.assert_allclose(locs, g["locs_exp"], atol=1e-4)
        np.testing.assert_allclose(vals, g["vals_exp"], atol=1e-6)

    @pytest.mark.parametrize("kernel,key", [(11, "blurred"), (17, "blurred17")])
    def test_gaussian_blur(self, golden, kernel, key):
        g = golden("decode")
        out = gaussian_blur(g["heatmaps"].copy(), kernel)
        np.testing.assert_allclose(out, g[key], atol=1e-5)

    def test_refine_quarter(self, golden):
        g = golden("decode")
        kpts = g["locs_max"][None].copy()
        out = refine_keypoints(kpts, g["heatmaps"].copy())
        np.testing.assert_allclose(out, g["quarter"], atol=1e-6)

    def test_refine_dark(self, golden):
        g = golden("decode")
        kpts = g["locs_max"][None].copy()
        out = refine_keypoints_dark(kpts, g["heatmaps"].copy(), 11)
        np.testing.assert_allclose(out, g["dark"], atol=1e-4)

    def test_refine_dark_udp(self, golden):
        g = golden("decode")
        kpts = g["locs_max"][None].copy()
        out = refine_keypoints_dark_udp(kpts, g["heatmaps"].copy(), 11)
        np.testing.assert_allclose(out, g["dark_udp"], atol=1e-4)


class TestSimCC:
    def test_maximum(self, golden):
        g = golden("simcc")
        locs, vals = get_simcc_maximum(g["simcc_x"].copy(), g["simcc_y"].copy())
        np.testing.assert_allclose(locs, g["locs"], atol=0)
        np.testing.assert_allclose(vals, g["vals"], atol=1e-7)

    def test_maximum_softmax(self, golden):
        g = golden("simcc")
        locs, vals = get_simcc_maximum(g["simcc_x"].copy(), g["simcc_y"].copy(), apply_softmax=True)
        np.testing.assert_allclose(locs, g["locs_softmax"], atol=0)
        np.testing.assert_allclose(vals, g["vals_softmax"], atol=1e-7)

    def test_refine_dark(self, golden):
        g = golden("simcc")
        out = refine_simcc_dark(g["dark_x_in"].copy(), g["simcc_x"].copy(), 11)
        np.testing.assert_allclose(out, g["dark_x"], atol=1e-4)
