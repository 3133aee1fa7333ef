"""Pallas kernel for the ProbPose expected-OKS convolution.

One grid step per batch element: the symmetric-padded heatmaps (K, Hp, Wp)
stay in VMEM while both banded matmuls of the separable OKS convolution run
back-to-back on the MXU — the (K, H, Wp) intermediate never touches HBM
(the unfused XLA path writes/reads it once per stage).

The argmax / sub-pixel-Taylor / peak-score tail runs in XLA
(``ops.decode.subpixel_refine_batch``): its gather/argmax patterns are not
yet supported by the Mosaic lowering on this toolchain, and it is
bandwidth-trivial compared to the convolution.

Numerically identical to ``ops.decode.heatmap_expected_value_batch``
(bit-exact on TPU). Measured on v5e at B=256/K=17/64x48: this kernel runs at
~1.8 us/heatmap vs ~0.5 us/heatmap for the XLA separable path — XLA batches
the 256 x 17 small banded matmuls across the whole batch while the per-
sample grid here serializes them, so the XLA path remains the default and
this kernel documents the fusion-maximal alternative.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from probpose_code_tpu.codecs.utils.oks_map import separable_oks_operators


@lru_cache(maxsize=8)
def _operators(K: int, H: int, W: int):
    return separable_oks_operators(K, H, W)


def _conv_kernel(pad_ref, ay_ref, ax_ref, out_ref):
    x = pad_ref[0]  # (K, Hp, Wp)
    ay = ay_ref[:]  # (K, H, Hp)
    ax = ax_ref[:]  # (K, W, Wp)
    rowed = jax.lax.dot_general(
        ay, x, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )  # (K, H, Wp)
    out_ref[0] = jax.lax.dot_general(
        rowed, ax, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )  # (K, H, W)


def oks_convolve_pallas(heatmaps: jnp.ndarray) -> jnp.ndarray:
    """(B, K, H, W) -> OKS-kernel-convolved maps, reflect boundary."""
    B, K, H, W = heatmaps.shape
    Ay, Ax, r = _operators(K, H, W)
    padded = jnp.pad(heatmaps, ((0, 0), (0, 0), (r, r), (r, r)), mode="symmetric")
    Hp, Wp = H + 2 * r, W + 2 * r

    return pl.pallas_call(
        _conv_kernel,
        out_shape=jax.ShapeDtypeStruct((B, K, H, W), jnp.float32),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, K, Hp, Wp), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, H, Hp), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, W, Wp), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, K, H, W), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
    )(padded, jnp.asarray(Ay), jnp.asarray(Ax))


def heatmap_expected_value_pallas(heatmaps: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Expected-OKS decode with the Pallas convolution kernel."""
    from probpose_code_tpu.ops.decode import subpixel_refine_batch
    from probpose_code_tpu.ops.heatmap import gather_hw

    B, K, H, W = heatmaps.shape
    convolved = oks_convolve_pallas(heatmaps)
    flat = convolved.reshape(B, K, H * W)
    idx = jnp.argmax(flat, axis=-1)
    xi = (idx % W).astype(jnp.int32)
    yi = (idx // W).astype(jnp.int32)
    locs = jnp.stack([xi, yi], axis=-1).astype(jnp.float32)
    locs = subpixel_refine_batch(convolved, locs)
    vals = gather_hw(heatmaps, xi, yi)
    return locs, vals
