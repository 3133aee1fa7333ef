"""Device ops vs NumPy ground truth: decode, blur, sparsemax, tta, warp."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from probpose_code_tpu.codecs.utils import (
    gaussian_blur,
    get_heatmap_expected_value,
    get_heatmap_maximum,
    refine_keypoints_dark_udp,
)
from probpose_code_tpu.ops import (
    argmax_probmap_decode_batch,
    batch_heatmap_nms,
    dark_udp_refine_batch,
    flip_heatmaps,
    gaussian_blur_batch,
    heatmap_expected_value_batch,
    heatmap_maximum_batch,
    invert_affine,
    sparsemax,
    transform_points,
    warp_affine_batch,
)


def make_heatmaps(b=3, k=17, h=64, w=48, seed=1):
    rng = np.random.RandomState(seed)
    hm = rng.rand(b, k, h, w).astype(np.float32) * 0.08
    yy, xx = np.mgrid[0:h, 0:w]
    for i in range(b):
        for j in range(k):
            cy, cx = rng.randint(3, h - 3), rng.randint(3, w - 3)
            hm[i, j] += np.exp(-((xx - cx) ** 2 + (yy - cy) ** 2) / (2 * 2.0**2)).astype(np.float32)
    return hm


class TestDeviceDecode:
    def test_heatmap_maximum(self):
        hm = make_heatmaps()
        locs_np, vals_np = get_heatmap_maximum(hm.copy())
        locs, vals = jax.jit(heatmap_maximum_batch)(jnp.asarray(hm))
        np.testing.assert_allclose(np.asarray(locs), locs_np, atol=0)
        np.testing.assert_allclose(np.asarray(vals), vals_np, atol=1e-7)

    def test_gaussian_blur(self):
        hm = make_heatmaps(b=2)
        ref = np.stack([gaussian_blur(h.copy(), 11) for h in hm])
        out = jax.jit(gaussian_blur_batch, static_argnums=1)(jnp.asarray(hm), 11)
        np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)

    def test_expected_value(self):
        hm = make_heatmaps(b=2)
        locs, vals = jax.jit(heatmap_expected_value_batch)(jnp.asarray(hm))
        for i in range(hm.shape[0]):
            locs_np, vals_np = get_heatmap_expected_value(hm[i].copy())
            np.testing.assert_allclose(np.asarray(locs)[i], locs_np, atol=2e-3)
            np.testing.assert_allclose(np.asarray(vals)[i], vals_np, atol=1e-5)

    def test_dark_udp_refine(self):
        hm = make_heatmaps(b=2)
        locs_np, _ = get_heatmap_maximum(hm[0].copy())
        ref = refine_keypoints_dark_udp(locs_np[None].copy(), hm[0].copy(), 11)

        locs_dev, _ = heatmap_maximum_batch(jnp.asarray(hm))
        out = jax.jit(dark_udp_refine_batch, static_argnums=2)(locs_dev, jnp.asarray(hm), 11)
        np.testing.assert_allclose(np.asarray(out)[0], ref[0], atol=5e-3)

    def test_argmax_probmap_decode(self):
        hm = make_heatmaps(b=4)
        locs, vals = jax.jit(argmax_probmap_decode_batch, static_argnums=1)(jnp.asarray(hm), 11)
        for i in range(4):
            locs_np, vals_np = get_heatmap_maximum(hm[i].copy())
            ref = refine_keypoints_dark_udp(locs_np[None].copy(), hm[i].copy(), 11)
            np.testing.assert_allclose(np.asarray(locs)[i], ref[0], atol=5e-3)
            np.testing.assert_allclose(np.asarray(vals)[i], vals_np, atol=1e-6)

    def test_heatmap_nms(self):
        hm = make_heatmaps(b=1)
        out = jax.jit(batch_heatmap_nms, static_argnums=1)(jnp.asarray(hm), 5)
        out = np.asarray(out)
        # every surviving pixel is the max of its 5x5 neighborhood
        nz = np.nonzero(out[0, 0])
        for y, x in zip(*nz):
            y0, y1 = max(0, y - 2), min(64, y + 3)
            x0, x1 = max(0, x - 2), min(48, x + 3)
            assert out[0, 0, y, x] == hm[0, 0, y0:y1, x0:x1].max()


class TestSparsemax:
    def test_simplex_projection(self):
        rng = np.random.RandomState(0)
        z = jnp.asarray(rng.randn(4, 17, 96).astype(np.float32) * 3)
        p = jax.jit(sparsemax)(z)
        p = np.asarray(p)
        np.testing.assert_allclose(p.sum(-1), 1.0, atol=1e-5)
        assert (p >= 0).all()
        # sparsity: plenty of exact zeros
        assert (p == 0).mean() > 0.5

    def test_matches_torch_reference_semantics(self):
        # sparsemax of a one-hot-ish logit is ~one-hot
        z = jnp.asarray([[0.0, 5.0, 0.1, -3.0]])
        p = np.asarray(sparsemax(z))
        np.testing.assert_allclose(p, [[0, 1, 0, 0]], atol=1e-6)

    def test_grad(self):
        rng = np.random.RandomState(1)
        z = jnp.asarray(rng.randn(8, 32).astype(np.float32))

        def loss(z_):
            return jnp.sum(sparsemax(z_) ** 2)

        g = jax.grad(loss)(z)
        # finite-difference check on a few coordinates
        eps = 1e-3
        for idx in [(0, 3), (2, 10), (7, 31)]:
            zp = z.at[idx].add(eps)
            zm = z.at[idx].add(-eps)
            fd = (loss(zp) - loss(zm)) / (2 * eps)
            np.testing.assert_allclose(g[idx], fd, atol=2e-2)


class TestTTAFlip:
    def test_flip_heatmap_mode(self):
        hm = make_heatmaps(b=2)
        flip_indices = [0, 2, 1, 4, 3, 6, 5, 8, 7, 10, 9, 12, 11, 14, 13, 16, 15]
        out = flip_heatmaps(jnp.asarray(hm), flip_indices, "heatmap", False)
        ref = hm[..., ::-1][:, flip_indices]
        np.testing.assert_allclose(np.asarray(out), ref, atol=0)

    def test_shift(self):
        hm = make_heatmaps(b=1)
        out = flip_heatmaps(jnp.asarray(hm), None, "heatmap", True)
        ref = hm[..., ::-1]
        np.testing.assert_allclose(np.asarray(out)[..., 1:], ref[..., :-1], atol=0)
        np.testing.assert_allclose(np.asarray(out)[..., 0], ref[..., 0], atol=0)


class TestWarp:
    def test_matches_cv2(self):
        cv2 = pytest.importorskip("cv2")
        rng = np.random.RandomState(3)
        img = rng.rand(128, 96, 3).astype(np.float32)

        from probpose_code_tpu.structures import bbox_xyxy2cs, get_udp_warp_matrix

        center, scale = bbox_xyxy2cs(np.array([10.0, 20.0, 80.0, 120.0]), padding=1.25)
        mat = get_udp_warp_matrix(center, scale, rot=15.0, output_size=(48, 64))
        ref = cv2.warpAffine(img, mat, (48, 64), flags=cv2.INTER_LINEAR)

        out = warp_affine_batch(jnp.asarray(img)[None], jnp.asarray(mat)[None], (48, 64))
        # interior pixels must match cv2 closely (border rows may differ by
        # cv2's fixed-point rounding)
        np.testing.assert_allclose(np.asarray(out)[0][2:-2, 2:-2], ref[2:-2, 2:-2], atol=2e-3)

    def test_invert_and_points(self):
        from probpose_code_tpu.structures import get_udp_warp_matrix

        mat = get_udp_warp_matrix(np.array([50.0, 60.0]), np.array([80.0, 100.0]), 30.0, (48, 64))
        mats = jnp.asarray(mat)[None]
        inv = invert_affine(mats)
        pts = jnp.asarray(np.random.RandomState(0).rand(1, 5, 2).astype(np.float32) * 40)
        back = transform_points(inv, transform_points(mats, pts))
        np.testing.assert_allclose(np.asarray(back), np.asarray(pts), atol=1e-3)
