"""Int8 quantized matmul layers for the serving/TTA path.

v5e's MXU runs int8 at 2x the bf16 rate (394 vs 197 TOPS); the flip-TTA
eval protocol needs ~53% of bf16 peak sustained to hit the 5k crops/s north
star (COVERAGE.md bound analysis), which the bf16 schedule cannot reach —
so the big ViT matmuls (qkv / attn-proj / MLP) get an int8 path.

Scheme (AQT-style dynamic W8A8):
- weights: symmetric per-output-channel int8, quantized from the f32 master
  params inside the jit (cost is O(d_in * d_out) elementwise, negligible
  next to the matmul);
- activations: symmetric per-token (row-wise) int8 with dynamic amax scale;
- accumulation in int32 (``preferred_element_type``), dequantized f32.

LayerNorm / softmax / GELU / residuals stay in bf16/f32 — they are
VPU-bound, not MXU-bound, and carry the numerics.

This is a serving-time transform: the same f32 checkpoint params feed both
paths (``backbone.quant='int8'`` in config), no calibration pass needed.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


def quantize_rowwise(x: jnp.ndarray, axis: int = -1):
    """Symmetric int8 quantization with per-row (all-but-``axis``) scales.

    Returns (x_q int8, scale f32 with ``axis`` collapsed to 1).
    """
    amax = jnp.max(jnp.abs(x), axis=axis, keepdims=True)
    scale = (amax / 127.0 + 1e-12).astype(jnp.float32)
    x_q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127).astype(jnp.int8)
    return x_q, scale


class QuantDense(nn.Module):
    """Drop-in ``nn.Dense`` with int8 x int8 -> int32 MXU matmul.

    Parameter tree matches ``nn.Dense`` (``kernel``/``bias``) so converted
    reference checkpoints load unchanged.
    """

    features: int
    use_bias: bool = True
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_features = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (in_features, self.features)
        )
        # per-output-channel weight scales (axis 0 = input dim reduced away)
        w_amax = jnp.max(jnp.abs(kernel), axis=0, keepdims=True)
        w_scale = (w_amax / 127.0 + 1e-12).astype(jnp.float32)  # (1, features)
        w_q = jnp.clip(jnp.round(kernel / w_scale), -127, 127).astype(jnp.int8)

        x_q, a_scale = quantize_rowwise(x)

        y = jax.lax.dot_general(
            x_q,
            w_q,
            (((x_q.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        y = y.astype(jnp.float32) * (a_scale * w_scale.reshape(self.features))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias
        return y.astype(self.dtype)
