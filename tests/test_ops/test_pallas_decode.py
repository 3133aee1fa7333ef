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
