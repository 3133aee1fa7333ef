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


def _fused_decode_kernel(pad_ref, ay_ref, ax_ref, locs_ref, vals_ref, *, H, W, r):
    """Whole expected-OKS decode for one batch element, VMEM-resident.

    Gathers are unsupported by the Mosaic lowering, so every point lookup
    (argmax index, the five Taylor taps, the raw-score read) is expressed as
    iota comparisons and one-hot contractions — all VPU/MXU ops.
    """
    x = pad_ref[0]  # (K, Hp, Wp)
    ay = ay_ref[:]  # (K, H, Hp)
    ax = ax_ref[:]  # (K, W, Wp)
    K = x.shape[0]

    rowed = jax.lax.dot_general(ay, x, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32)
    conv = jax.lax.dot_general(rowed, ax, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32)
    # conv: (K, H, W). Mosaic prefers >= 2-D vectors: every per-keypoint
    # quantity below is kept (K, 1).

    # argmax with first-max tie-breaking, no gather: smallest linear index
    # among positions equal to the max
    m = jnp.max(jnp.max(conv, axis=2), axis=1)[:, None, None]  # (K, 1, 1)
    lin = (
        jax.lax.broadcasted_iota(jnp.int32, (K, H, W), 1) * W
        + jax.lax.broadcasted_iota(jnp.int32, (K, H, W), 2)
    )
    big = H * W
    masked = jnp.where(conv >= m, lin, big)
    idx = jnp.min(jnp.min(masked, axis=2), axis=1)[:, None]  # (K, 1)
    xi = idx % W
    yi = idx // W

    valid = (xi > 0) & (xi < W - 1) & (yi > 0) & (yi < H - 1)
    xc = jnp.clip(xi, 1, W - 2)
    yc = jnp.clip(yi, 1, H - 2)

    def row_select(maps, y):  # (K, H?, W?) x (K, 1) -> (K, W?)
        oh = (jax.lax.broadcasted_iota(jnp.int32, (K, maps.shape[1]), 1) == y).astype(jnp.float32)
        return jax.lax.dot_general(
            oh[:, None, :], maps, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )[:, 0, :]

    def col_select(rows, xsel):  # (K, W?) x (K, 1) -> (K, 1)
        oh = (jax.lax.broadcasted_iota(jnp.int32, rows.shape, 1) == xsel).astype(jnp.float32)
        return jnp.sum(rows * oh, axis=1, keepdims=True)

    row_c = row_select(conv, yc)
    row_u = row_select(conv, yc - 1)
    row_d = row_select(conv, yc + 1)
    c = col_select(row_c, xc)
    left = col_select(row_c, xc - 1)
    right = col_select(row_c, xc + 1)
    up = col_select(row_u, xc)
    down = col_select(row_d, xc)

    dx = (right - left) * 0.5
    dy = (down - up) * 0.5
    dxx = right + left - 2.0 * c
    dyy = down + up - 2.0 * c
    dxx = jnp.where(dxx != 0.0, dxx, 1e-6)
    dyy = jnp.where(dyy != 0.0, dyy, 1e-6)
    fx = xi.astype(jnp.float32) + jnp.where(valid, -dx / dxx, 0.0)  # (K, 1)
    fy = yi.astype(jnp.float32) + jnp.where(valid, -dy / dyy, 0.0)

    # raw-heatmap score at the integer peak (read from the padded input)
    raw_row = row_select(x, yi + r)
    vals = col_select(raw_row, xi + r)  # (K, 1)

    locs_ref[0] = jnp.concatenate([fx, fy], axis=-1)
    vals_ref[0] = vals


def heatmap_expected_value_pallas_fused(heatmaps: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Single-kernel expected-OKS decode: (B, K, H, W) -> (locs, vals).

    The whole pipeline — separable OKS convolution, argmax, 1-D Taylor
    sub-pixel shift, raw-score lookup — runs in one VMEM-resident program
    per batch element; only the symmetric pad stays in XLA (reflect
    indexing). Decision-level parity with
    ``ops.decode.heatmap_expected_value_batch``.
    """
    B, K, H, W = heatmaps.shape
    Ay, Ax, r = _operators(K, H, W)
    padded = jnp.pad(heatmaps, ((0, 0), (0, 0), (r, r), (r, r)), mode="symmetric")
    Hp, Wp = H + 2 * r, W + 2 * r

    locs, vals = pl.pallas_call(
        lambda p, ay, ax, lo, va: _fused_decode_kernel(p, ay, ax, lo, va, H=H, W=W, r=r),
        out_shape=(
            jax.ShapeDtypeStruct((B, K, 2), jnp.float32),
            jax.ShapeDtypeStruct((B, K, 1), jnp.float32),
        ),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, K, Hp, Wp), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, H, Hp), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, W, Wp), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, K, 2), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ),
    )(padded, jnp.asarray(Ay), jnp.asarray(Ax))
    return locs, vals[..., 0]
