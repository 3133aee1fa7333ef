"""Pallas expected-OKS convolution kernel vs the XLA separable path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from probpose_code_tpu.ops.decode import heatmap_expected_value_batch


def test_pallas_conv_matches_xla():
    if jax.devices()[0].platform not in ("tpu",):
        # the Mosaic TPU lowering is required; interpret mode covers CPU
        from jax.experimental.pallas import tpu as pltpu

        ctx = pltpu.force_tpu_interpret_mode()
    else:
        import contextlib

        ctx = contextlib.nullcontext()

    from probpose_code_tpu.ops.pallas.expected_oks import heatmap_expected_value_pallas

    rng = np.random.RandomState(0)
    hm = jnp.asarray(np.clip(rng.rand(4, 17, 64, 48).astype(np.float32), 0, 1))
    with ctx:
        locs_p, vals_p = heatmap_expected_value_pallas(hm)
    locs_x, vals_x = heatmap_expected_value_batch(hm)
    np.testing.assert_allclose(np.asarray(locs_p), np.asarray(locs_x), atol=1e-4)
    np.testing.assert_allclose(np.asarray(vals_p), np.asarray(vals_x), atol=1e-6)


def _interpret_ctx():
    if jax.devices()[0].platform not in ("tpu",):
        from jax.experimental.pallas import tpu as pltpu

        return pltpu.force_tpu_interpret_mode()
    import contextlib

    return contextlib.nullcontext()


def test_pallas_fused_decode_matches_xla():
    """Single-kernel decode (conv + argmax + Taylor + score) vs XLA, on
    peaked heatmaps (argmax tie-breaks on flat noise are implementation-
    dependent last-bit behavior, so the parity fixture uses real peaks)."""
    from probpose_code_tpu.ops.pallas.expected_oks import heatmap_expected_value_pallas_fused

    rng = np.random.RandomState(1)
    B, K, H, W = 4, 17, 64, 48
    yy, xx = np.mgrid[:H, :W]
    hm = np.zeros((B, K, H, W), np.float32)
    cy = rng.uniform(2, H - 3, (B, K))
    cx = rng.uniform(2, W - 3, (B, K))
    for b in range(B):
        for k in range(K):
            hm[b, k] = np.exp(-((yy - cy[b, k]) ** 2 + (xx - cx[b, k]) ** 2) / 8.0)
    hm = jnp.asarray(hm)
    with _interpret_ctx():
        locs_p, vals_p = heatmap_expected_value_pallas_fused(hm)
    locs_x, vals_x = heatmap_expected_value_batch(hm)
    np.testing.assert_allclose(np.asarray(locs_p), np.asarray(locs_x), atol=1e-3)
    np.testing.assert_allclose(np.asarray(vals_p), np.asarray(vals_x), atol=1e-5)


def test_pallas_attention_matches_xla():
    from probpose_code_tpu.ops.pallas.attention import fused_attention, xla_attention

    rng = np.random.RandomState(0)
    B, N, h, d = 2, 192, 12, 32
    q, k, v = (jnp.asarray(rng.randn(B, N, h, d).astype(np.float32)) for _ in range(3))
    scale = d**-0.5
    with _interpret_ctx():
        out = fused_attention(q, k, v, scale)
    ref = xla_attention(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)
    # gradients flow through the recompute VJP
    with _interpret_ctx():
        g = jax.grad(lambda q_: fused_attention(q_, k, v, scale).sum())(q)
    assert np.isfinite(np.asarray(g)).all() and float(jnp.abs(g).sum()) > 0
