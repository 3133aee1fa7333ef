"""Fused multi-head attention Pallas kernel (TPU).

The ViT backbones materialize the (B, h, N, N) attention matrix in HBM
twice per layer (logits out of the QK matmul, probabilities out of the
softmax) plus an f32 round-trip for the stable softmax — at ProbPose-S
serving shapes (N=192 tokens, 12 heads) that HBM traffic, not the MXU
FLOPs, dominates backbone step time (measured ~32% MXU utilization).

This kernel computes one (batch, head) attention block entirely in VMEM:
QK^T with f32 accumulation, stable softmax in f32, and the PV matmul —
the N x N matrix never touches HBM. N=192 fits comfortably (f32 scores =
147 KB), so no flash-attention tiling/streaming is needed.

Backward runs the plain XLA einsum implementation through a custom VJP
(recompute: attention activations are cheap relative to storing them).

Used by ``models/backbones/vit.py`` when running on TPU; the XLA einsum
path remains the reference implementation and the CPU/testing fallback.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def xla_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, scale: float) -> jnp.ndarray:
    """Reference implementation: (B, N, h, d) -> (B, N, h, d)."""
    attn = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k)
    attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", attn, v)


def _mha_kernel(q_ref, k_ref, v_ref, o_ref):
    q = q_ref[0]  # (N, d), pre-scaled
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (N, N) f32, VMEM-resident
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o_ref[0] = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)


def _pallas_forward(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, scale: float) -> jnp.ndarray:
    B, N, h, d = q.shape
    # (B, N, h, d) -> (B*h, N, d) blocks
    def to_blocks(x):
        return jnp.transpose(x, (0, 2, 1, 3)).reshape(B * h, N, d)

    qb, kb, vb = to_blocks(q * jnp.asarray(scale, q.dtype)), to_blocks(k), to_blocks(v)
    spec = pl.BlockSpec((1, N, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _mha_kernel,
        grid=(B * h,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((B * h, N, d), q.dtype),
    )(qb, kb, vb)
    return jnp.transpose(out.reshape(B, h, N, d), (0, 2, 1, 3))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, scale: float) -> jnp.ndarray:
    """VMEM-fused MHA: inputs/outputs (B, N, h, d); softmax in f32."""
    return _pallas_forward(q, k, v, scale)


def _fwd(q, k, v, scale):
    return _pallas_forward(q, k, v, scale), (q, k, v)


def _bwd(scale, res, g):
    q, k, v = res
    _, vjp = jax.vjp(lambda q_, k_, v_: xla_attention(q_, k_, v_, scale), q, k, v)
    return vjp(g)


fused_attention.defvjp(_fwd, _bwd)


def attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, scale: float, use_pallas: Any = None) -> jnp.ndarray:
    """MHA dispatch.

    Default is the XLA einsum path: measured on v5e at ProbPose-S serving
    shapes (N=192, h=12, d=32, B<=128), the per-(batch, head) Pallas grid
    runs ~1.5x SLOWER than XLA (3,070 -> 1,998 flip-crops/s end to end) —
    d=32 blocks pad 4x on the 128-lane MXU and 768 tiny programs serialize
    where XLA batches the small matmuls. The fused kernel is kept as the
    fusion-maximal reference; pass ``use_pallas=True`` to select it.
    """
    if use_pallas:
        return fused_attention(q, k, v, scale)
    return xla_attention(q, k, v, scale)
