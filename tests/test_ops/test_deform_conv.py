"""deform_conv2d vs a direct NumPy DCN oracle (mmcv DeformConv2d semantics)."""

import numpy as np


def _oracle(x, offsets, weight, dilation, G):
    """Loop DCN: x (B,H,W,C), offsets (B,H,W,2*G*K*K) mmcv order, weight
    (K,K,C,Co); zero padding outside, bilinear sampling."""
    B, H, W, C = x.shape
    K = weight.shape[0]
    Cg = C // G
    out = np.zeros((B, H, W, weight.shape[-1]), np.float64)
    offs = offsets.reshape(B, H, W, G, K * K, 2)

    def sample(b, py, px, g):
        y0, x0 = int(np.floor(py)), int(np.floor(px))
        acc = np.zeros(Cg)
        for dy in (0, 1):
            for dx in (0, 1):
                yy, xx = y0 + dy, x0 + dx
                if 0 <= yy < H and 0 <= xx < W:
                    wgt = (1 - abs(py - yy)) * (1 - abs(px - xx))
                    acc += x[b, yy, xx, g * Cg:(g + 1) * Cg] * wgt
        return acc

    for b in range(B):
        for i in range(H):
            for j in range(W):
                for k in range(K * K):
                    kh, kw = divmod(k, K)
                    sampled = np.zeros(C)
                    for g in range(G):
                        py = i + dilation * (kh - K // 2) + offs[b, i, j, g, k, 0]
                        px = j + dilation * (kw - K // 2) + offs[b, i, j, g, k, 1]
                        sampled[g * Cg:(g + 1) * Cg] = sample(b, py, px, g)
                    out[b, i, j] += sampled @ weight[kh, kw]
    return out


def test_deform_conv_matches_oracle():
    import jax.numpy as jnp

    from probpose_code_tpu.ops.deform_conv import deform_conv2d

    rng = np.random.RandomState(0)
    B, H, W, C, Co, G, K, d = 2, 6, 5, 4, 3, 2, 3, 2
    x = rng.randn(B, H, W, C).astype(np.float32)
    offsets = (rng.randn(B, H, W, 2 * G * K * K) * 1.5).astype(np.float32)
    weight = rng.randn(K, K, C, Co).astype(np.float32) * 0.2

    got = np.asarray(deform_conv2d(jnp.asarray(x), jnp.asarray(offsets), jnp.asarray(weight),
                                   dilation=d, deform_groups=G))
    want = _oracle(x, offsets, weight, d, G)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_deform_conv_zero_offsets_equals_conv():
    import jax.numpy as jnp
    from jax import lax

    from probpose_code_tpu.ops.deform_conv import deform_conv2d

    rng = np.random.RandomState(1)
    x = rng.randn(1, 8, 8, 4).astype(np.float32)
    w = rng.randn(3, 3, 4, 5).astype(np.float32)
    got = deform_conv2d(jnp.asarray(x), jnp.zeros((1, 8, 8, 18)), jnp.asarray(w),
                        dilation=1, deform_groups=1)
    want = lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(w), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)
