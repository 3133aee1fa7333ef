"""Differentiable fused ViT transformer layer (training path).

The serving kernel (``ops/pallas/vit_layer.py``) deletes XLA's lane-dim
LayerNorm reduce fusions and head-split layout copies from the forward
graph, but training still paid them twice (forward + backward): the r4
train-step trace at B=64/bf16 showed ~3.2 ms/step of LN reduce fusions and
~2.1 ms of layout copies inside the 33.6 ms step. This module provides the
same fused layer with a custom VJP so the TRAIN step gets the kernelized
path too:

* forward kernel: identical math to the serving kernel plus per-image
  stochastic-depth branch masks (the flagship recipe trains with
  ``drop_path_rate=0.1``, reference config ``td-pm_ProbPose-small...py:55``)
  and a second output ``x1`` (the post-attention residual) saved for the
  backward;
* backward = two kernels, remat style — intermediates (qkv, attention
  probabilities, MLP hidden) are recomputed in VMEM instead of ever being
  written to HBM:
  - MLP/LN2 half: consumes (x1, dout) -> dx1 + {W1,b1,W2,b2,LN2} grads,
  - attention/LN1 half: consumes (x, dx1) -> dx + {Wqkv,bqkv,Wproj,bproj,
    LN1} grads;
  weight grads accumulate across the (sequential, "arbitrary") grid steps
  into constant-index output blocks.

Like the serving kernel this is gated to the tanh-approximate GELU
(``approximate_gelu=True``, the bf16 training configuration); the exact-erf
path falls back to XLA. Numerics: all matmuls run on the MXU in the compute
dtype with f32 accumulation, LayerNorm statistics and softmax in f32 —
matching the XLA mixed-precision reference within bf16 rounding.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SQRT_2_OVER_PI = math.sqrt(2.0 / math.pi)
_GELU_C = 0.044715


def _gelu_tanh(x):
    return 0.5 * x * (1.0 + jnp.tanh(_SQRT_2_OVER_PI * (x + _GELU_C * x * x * x)))


def _gelu_tanh_grad(x):
    u = _SQRT_2_OVER_PI * (x + _GELU_C * x * x * x)
    t = jnp.tanh(u)
    du = _SQRT_2_OVER_PI * (1.0 + 3.0 * _GELU_C * x * x)
    return 0.5 * (1.0 + t) + 0.5 * x * (1.0 - t * t) * du


def _ln_f32(xf, scale, bias, eps):
    mean = xf.mean(axis=-1, keepdims=True)
    var = (xf * xf).mean(axis=-1, keepdims=True) - mean * mean
    sinv = jax.lax.rsqrt(var + eps)
    xhat = (xf - mean) * sinv
    return xhat * scale + bias, xhat, sinv


def _ln_bwd(dy_scaled, xhat, sinv):
    # dx for y = xhat*scale+bias given dy*scale (per-row reductions over C)
    m1 = dy_scaled.mean(axis=-1, keepdims=True)
    m2 = (dy_scaled * xhat).mean(axis=-1, keepdims=True)
    return sinv * (dy_scaled - m1 - xhat * m2)


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _fwd_kernel(
    x_ref, m1_ref, m2_ref, l1s_ref, l1b_ref, wqkv_ref, bqkv_ref, wp_ref, bp_ref,
    l2s_ref, l2b_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref, x1_ref,
    *, eps, n_heads, head_dim, tokens, group,
):
    C = n_heads * head_dim
    N, G, D, H = tokens, group, head_dim, n_heads
    cdt = wqkv_ref.dtype

    xf = x_ref[:].astype(jnp.float32)
    xn, _, _ = _ln_f32(xf, l1s_ref[:].astype(jnp.float32), l1b_ref[:].astype(jnp.float32), eps)
    qkv = jnp.dot(xn.astype(cdt), wqkv_ref[:], preferred_element_type=jnp.float32)
    qkv = (qkv + bqkv_ref[:].astype(jnp.float32)).astype(cdt)

    attn_heads = []
    for h in range(H):
        c0 = h * D
        qh = qkv[:, c0:c0 + D]
        kh = qkv[:, C + c0:C + c0 + D]
        vh = qkv[:, 2 * C + c0:2 * C + c0 + D]
        outs = []
        for g in range(G):
            r0 = g * N
            s = jax.lax.dot_general(
                qh[r0:r0 + N], kh[r0:r0 + N], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            p = jnp.exp(jnp.minimum(s, 80.0))
            p = p / jnp.sum(p, axis=-1, keepdims=True)
            o = jax.lax.dot_general(
                p.astype(cdt), vh[r0:r0 + N], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            outs.append(o.astype(cdt))
        attn_heads.append(jnp.concatenate(outs, axis=0))
    attn = jnp.concatenate(attn_heads, axis=1)

    h1 = jnp.dot(attn, wp_ref[:], preferred_element_type=jnp.float32)
    m1 = m1_ref[:].astype(jnp.float32)  # (blk, 1): 0 or 1/keep per image
    x1 = xf + m1 * (h1 + bp_ref[:].astype(jnp.float32))

    xn2, _, _ = _ln_f32(x1, l2s_ref[:].astype(jnp.float32), l2b_ref[:].astype(jnp.float32), eps)
    hh = jnp.dot(xn2.astype(cdt), w1_ref[:], preferred_element_type=jnp.float32)
    hh = _gelu_tanh(hh + b1_ref[:].astype(jnp.float32))
    y = jnp.dot(hh.astype(cdt), w2_ref[:], preferred_element_type=jnp.float32)
    m2 = m2_ref[:].astype(jnp.float32)
    x1_ref[:] = x1
    o_ref[:] = (x1 + m2 * (y + b2_ref[:].astype(jnp.float32))).astype(o_ref.dtype)


# ---------------------------------------------------------------------------
# backward, MLP/LN2 half: (x1, dout) -> dx1 + {LN2, W1, b1, W2, b2} grads
# ---------------------------------------------------------------------------


def _bwd_mlp_kernel(
    x1_ref, g_ref, m2_ref, l2s_ref, l2b_ref, w1_ref, b1_ref, w2_ref,
    dx1_ref, dl2s_ref, dl2b_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
    *, eps,
):
    cdt = w1_ref.dtype

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dl2s_ref[:] = jnp.zeros_like(dl2s_ref)
        dl2b_ref[:] = jnp.zeros_like(dl2b_ref)
        dw1_ref[:] = jnp.zeros_like(dw1_ref)
        db1_ref[:] = jnp.zeros_like(db1_ref)
        dw2_ref[:] = jnp.zeros_like(dw2_ref)
        db2_ref[:] = jnp.zeros_like(db2_ref)

    x1 = x1_ref[:]  # f32
    gf = g_ref[:].astype(jnp.float32)
    dbr = gf * m2_ref[:].astype(jnp.float32)  # grad of the MLP branch

    l2s = l2s_ref[:].astype(jnp.float32)
    xn2, xhat2, sinv2 = _ln_f32(x1, l2s, l2b_ref[:].astype(jnp.float32), eps)
    xn2c = xn2.astype(cdt)
    hpre = jnp.dot(xn2c, w1_ref[:], preferred_element_type=jnp.float32)
    hpre = hpre + b1_ref[:].astype(jnp.float32)
    hh = _gelu_tanh(hpre)

    db2_ref[:] += dbr.sum(axis=0, keepdims=True)
    dbrc = dbr.astype(cdt)
    dw2_ref[:] += jax.lax.dot_general(
        hh.astype(cdt), dbrc, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dh = jax.lax.dot_general(
        dbrc, w2_ref[:], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    dhpre = dh * _gelu_tanh_grad(hpre)
    db1_ref[:] += dhpre.sum(axis=0, keepdims=True)
    dhprec = dhpre.astype(cdt)
    dw1_ref[:] += jax.lax.dot_general(
        xn2c, dhprec, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dxn2 = jax.lax.dot_general(
        dhprec, w1_ref[:], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    dl2s_ref[:] += (dxn2 * xhat2).sum(axis=0, keepdims=True)
    dl2b_ref[:] += dxn2.sum(axis=0, keepdims=True)
    dx1_ref[:] = gf + _ln_bwd(dxn2 * l2s, xhat2, sinv2)


# ---------------------------------------------------------------------------
# backward, attention/LN1 half: (x, dx1) -> dx + {LN1, Wqkv, bqkv, Wp, bp}
# ---------------------------------------------------------------------------


def _bwd_attn_kernel(
    x_ref, dx1_ref, m1_ref, l1s_ref, l1b_ref, wqkv_ref, bqkv_ref, wp_ref,
    dx_ref, dl1s_ref, dl1b_ref, dwqkv_ref, dbqkv_ref, dwp_ref, dbp_ref,
    *, eps, n_heads, head_dim, tokens, group,
):
    C = n_heads * head_dim
    N, G, D, H = tokens, group, head_dim, n_heads
    cdt = wqkv_ref.dtype

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dl1s_ref[:] = jnp.zeros_like(dl1s_ref)
        dl1b_ref[:] = jnp.zeros_like(dl1b_ref)
        dwqkv_ref[:] = jnp.zeros_like(dwqkv_ref)
        dbqkv_ref[:] = jnp.zeros_like(dbqkv_ref)
        dwp_ref[:] = jnp.zeros_like(dwp_ref)
        dbp_ref[:] = jnp.zeros_like(dbp_ref)

    xf = x_ref[:].astype(jnp.float32)
    dx1 = dx1_ref[:]  # f32
    dbr = dx1 * m1_ref[:].astype(jnp.float32)  # grad of the attention branch

    l1s = l1s_ref[:].astype(jnp.float32)
    xn1, xhat1, sinv1 = _ln_f32(xf, l1s, l1b_ref[:].astype(jnp.float32), eps)
    xn1c = xn1.astype(cdt)
    qkv = jnp.dot(xn1c, wqkv_ref[:], preferred_element_type=jnp.float32)
    qkv = (qkv + bqkv_ref[:].astype(jnp.float32)).astype(cdt)

    dbp_ref[:] += dbr.sum(axis=0, keepdims=True)
    dbrc = dbr.astype(cdt)
    dattn = jax.lax.dot_general(
        dbrc, wp_ref[:], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (blk, C)

    dq_heads, dk_heads, dv_heads = [], [], []
    for h in range(H):
        c0 = h * D
        qh = qkv[:, c0:c0 + D]
        kh = qkv[:, C + c0:C + c0 + D]
        vh = qkv[:, 2 * C + c0:2 * C + c0 + D]
        dOh = dattn[:, c0:c0 + D].astype(cdt)
        dqs, dks, dvs, os_ = [], [], [], []
        for g in range(G):
            r0 = g * N
            q_, k_, v_, dO = qh[r0:r0 + N], kh[r0:r0 + N], vh[r0:r0 + N], dOh[r0:r0 + N]
            s = jax.lax.dot_general(
                q_, k_, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )
            p = jnp.exp(jnp.minimum(s, 80.0))
            p = p / jnp.sum(p, axis=-1, keepdims=True)
            pc = p.astype(cdt)
            o = jax.lax.dot_general(
                pc, v_, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
            os_.append(o.astype(cdt))
            dv = jax.lax.dot_general(
                pc, dO, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
            dvs.append(dv)
            dp = jax.lax.dot_general(
                dO, v_, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )
            ds = p * (dp - (dp * p).sum(axis=-1, keepdims=True))
            dsc = ds.astype(cdt)
            dqs.append(jax.lax.dot_general(
                dsc, k_, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
            ))
            dks.append(jax.lax.dot_general(
                dsc, q_, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
            ))
        dq_heads.append(jnp.concatenate(dqs, axis=0))
        dk_heads.append(jnp.concatenate(dks, axis=0))
        dv_heads.append(jnp.concatenate(dvs, axis=0))
        o_all = jnp.concatenate(os_, axis=0)  # (blk, D)
        dwp_ref[c0:c0 + D, :] += jax.lax.dot_general(
            o_all, dbrc, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    dqkv = jnp.concatenate(
        [jnp.concatenate(dq_heads, axis=1),
         jnp.concatenate(dk_heads, axis=1),
         jnp.concatenate(dv_heads, axis=1)], axis=1,
    )  # (blk, 3C) f32
    dbqkv_ref[:] += dqkv.sum(axis=0, keepdims=True)
    dqkvc = dqkv.astype(cdt)
    dwqkv_ref[:] += jax.lax.dot_general(
        xn1c, dqkvc, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dxn1 = jax.lax.dot_general(
        dqkvc, wqkv_ref[:], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    dl1s_ref[:] += (dxn1 * xhat1).sum(axis=0, keepdims=True)
    dl1b_ref[:] += dxn1.sum(axis=0, keepdims=True)
    dx_ref[:] = dx1 + _ln_bwd(dxn1 * l1s, xhat1, sinv1)


# ---------------------------------------------------------------------------
# custom-VJP core + public wrapper
# ---------------------------------------------------------------------------


def _pick_group(batch: int, tokens: int, limit: int) -> int:
    for g in (limit, limit // 2, 1):
        if g >= 1 and batch % g == 0:
            return g
    return 0


_const = lambda i: (0, 0)  # noqa: E731
_row = lambda i: (i, 0)  # noqa: E731


def _run_fwd(x2d, m1, m2, params, *, num_heads, eps, dtype, tokens, group):
    (l1s, l1b, wqkv, bqkv, wp, bp, l2s, l2b, w1, b1, w2, b2) = params
    T, C = x2d.shape
    F = w1.shape[-1]
    blk = group * tokens
    kernel = functools.partial(
        _fwd_kernel, eps=eps, n_heads=num_heads, head_dim=C // num_heads,
        tokens=tokens, group=group,
    )
    interpret = jax.devices()[0].platform != "tpu"
    return pl.pallas_call(
        kernel,
        grid=(T // blk,),
        in_specs=[
            pl.BlockSpec((blk, C), _row),
            pl.BlockSpec((blk, 1), _row),
            pl.BlockSpec((blk, 1), _row),
            pl.BlockSpec((1, C), _const), pl.BlockSpec((1, C), _const),
            pl.BlockSpec((C, 3 * C), _const), pl.BlockSpec((1, 3 * C), _const),
            pl.BlockSpec((C, C), _const), pl.BlockSpec((1, C), _const),
            pl.BlockSpec((1, C), _const), pl.BlockSpec((1, C), _const),
            pl.BlockSpec((C, F), _const), pl.BlockSpec((1, F), _const),
            pl.BlockSpec((F, C), _const), pl.BlockSpec((1, C), _const),
        ],
        out_specs=[
            pl.BlockSpec((blk, C), _row),
            pl.BlockSpec((blk, C), _row),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, C), x2d.dtype),
            jax.ShapeDtypeStruct((T, C), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=2 * T * C * (3 * C + C + 2 * F) + 4 * T * tokens * C,
            bytes_accessed=2 * T * C * 2 + T * C * 4 + (C * 3 * C + C * C + 2 * C * F) * 2,
            transcendentals=T * (F + tokens),
        ),
        interpret=interpret,
    )(
        x2d, m1, m2,
        l1s.reshape(1, C), l1b.reshape(1, C),
        wqkv.astype(dtype), bqkv.reshape(1, 3 * C),
        wp.astype(dtype), bp.reshape(1, C),
        l2s.reshape(1, C), l2b.reshape(1, C),
        w1.astype(dtype), b1.reshape(1, F),
        w2.astype(dtype), b2.reshape(1, C),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(15, 16, 17, 18))
def _core(x2d, l1s, l1b, wqkv, bqkv, wp, bp, l2s, l2b, w1, b1, w2, b2, m1, m2,
          num_heads, eps, dtype, tokens):
    group = _pick_group(x2d.shape[0] // tokens, tokens, 4)
    out, _ = _run_fwd(
        x2d, m1, m2, (l1s, l1b, wqkv, bqkv, wp, bp, l2s, l2b, w1, b1, w2, b2),
        num_heads=num_heads, eps=eps, dtype=dtype, tokens=tokens, group=group,
    )
    return out


def _core_fwd(x2d, l1s, l1b, wqkv, bqkv, wp, bp, l2s, l2b, w1, b1, w2, b2, m1, m2,
              num_heads, eps, dtype, tokens):
    group = _pick_group(x2d.shape[0] // tokens, tokens, 4)
    out, x1 = _run_fwd(
        x2d, m1, m2, (l1s, l1b, wqkv, bqkv, wp, bp, l2s, l2b, w1, b1, w2, b2),
        num_heads=num_heads, eps=eps, dtype=dtype, tokens=tokens, group=group,
    )
    # bp/b2 join the residuals only to shape/dtype their gradients
    res = (x2d, x1, m1, m2, l1s, l1b, wqkv, bqkv, wp, bp, l2s, l2b, w1, b1, w2, b2)
    return out, res


def _core_bwd(num_heads, eps, dtype, tokens, res, g):
    (x2d, x1, m1, m2, l1s, l1b, wqkv, bqkv, wp, bp, l2s, l2b, w1, b1, w2, b2) = res
    T, C = x2d.shape
    F = w1.shape[-1]
    # backward recomputes qkv + the MLP hidden in VMEM -> smaller group
    group = _pick_group(T // tokens, tokens, 2)
    blk = group * tokens
    interpret = jax.devices()[0].platform != "tpu"

    # the MLP backward holds the (blk, F) hidden + its grad + both dW
    # accumulators in VMEM at once: at group=2 / d=384 / F=1536 that is
    # ~16.2 MB — 244 KB past the 16 MB scoped-vmem limit on v5e (measured).
    # It is purely row-wise (no cross-token math), so it can block at
    # single-image rows independently of the attention kernel's group.
    blk_mlp = tokens * _pick_group(T // tokens, tokens, 1)

    mlp = functools.partial(_bwd_mlp_kernel, eps=eps)
    dx1, dl2s, dl2b, dw1, db1, dw2, db2 = pl.pallas_call(
        mlp,
        grid=(T // blk_mlp,),
        in_specs=[
            pl.BlockSpec((blk_mlp, C), _row),
            pl.BlockSpec((blk_mlp, C), _row),
            pl.BlockSpec((blk_mlp, 1), _row),
            pl.BlockSpec((1, C), _const), pl.BlockSpec((1, C), _const),
            pl.BlockSpec((C, F), _const), pl.BlockSpec((1, F), _const),
            pl.BlockSpec((F, C), _const),
        ],
        out_specs=[
            pl.BlockSpec((blk_mlp, C), _row),
            pl.BlockSpec((1, C), _const), pl.BlockSpec((1, C), _const),
            pl.BlockSpec((C, F), _const), pl.BlockSpec((1, F), _const),
            pl.BlockSpec((F, C), _const), pl.BlockSpec((1, C), _const),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, C), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
            jax.ShapeDtypeStruct((C, F), jnp.float32),
            jax.ShapeDtypeStruct((1, F), jnp.float32),
            jax.ShapeDtypeStruct((F, C), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=6 * T * C * F,
            bytes_accessed=T * C * (4 + 2 + 4) + 2 * C * F * 2,
            transcendentals=T * F,
        ),
        interpret=interpret,
    )(
        x1, g, m2,
        l2s.reshape(1, C), l2b.reshape(1, C),
        w1.astype(dtype), b1.reshape(1, F), w2.astype(dtype),
    )

    attn = functools.partial(
        _bwd_attn_kernel, eps=eps, n_heads=num_heads, head_dim=C // num_heads,
        tokens=tokens, group=group,
    )
    dx, dl1s, dl1b, dwqkv, dbqkv, dwp, dbp = pl.pallas_call(
        attn,
        grid=(T // blk,),
        in_specs=[
            pl.BlockSpec((blk, C), _row),
            pl.BlockSpec((blk, C), _row),
            pl.BlockSpec((blk, 1), _row),
            pl.BlockSpec((1, C), _const), pl.BlockSpec((1, C), _const),
            pl.BlockSpec((C, 3 * C), _const), pl.BlockSpec((1, 3 * C), _const),
            pl.BlockSpec((C, C), _const),
        ],
        out_specs=[
            pl.BlockSpec((blk, C), _row),
            pl.BlockSpec((1, C), _const), pl.BlockSpec((1, C), _const),
            pl.BlockSpec((C, 3 * C), _const), pl.BlockSpec((1, 3 * C), _const),
            pl.BlockSpec((C, C), _const), pl.BlockSpec((1, C), _const),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, C), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
            jax.ShapeDtypeStruct((C, 3 * C), jnp.float32),
            jax.ShapeDtypeStruct((1, 3 * C), jnp.float32),
            jax.ShapeDtypeStruct((C, C), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=2 * T * C * (3 * C + C) * 2 + 12 * T * tokens * C,
            bytes_accessed=T * C * (2 + 4 + 4) + (C * 3 * C + C * C) * 2,
            transcendentals=T * tokens,
        ),
        interpret=interpret,
    )(
        x2d, dx1, m1,
        l1s.reshape(1, C), l1b.reshape(1, C),
        wqkv.astype(dtype), bqkv.reshape(1, 3 * C), wp.astype(dtype),
    )

    return (
        dx.astype(x2d.dtype),
        dl1s.reshape(l1s.shape).astype(l1s.dtype),
        dl1b.reshape(l1b.shape).astype(l1b.dtype),
        dwqkv.astype(wqkv.dtype),
        dbqkv.reshape(bqkv.shape).astype(bqkv.dtype),
        dwp.astype(wp.dtype),
        dbp.reshape(bp.shape).astype(bp.dtype),
        dl2s.reshape(l2s.shape).astype(l2s.dtype),
        dl2b.reshape(l2b.shape).astype(l2b.dtype),
        dw1.astype(w1.dtype),
        db1.reshape(b1.shape).astype(b1.dtype),
        dw2.astype(w2.dtype),
        db2.reshape(b2.shape).astype(b2.dtype),
        jnp.zeros_like(m1),
        jnp.zeros_like(m2),
    )


_core.defvjp(_core_fwd, _core_bwd)


def vit_layer_train(
    x: jnp.ndarray,
    ln1_scale, ln1_bias, w_qkv, b_qkv, w_proj, b_proj,
    ln2_scale, ln2_bias, w_fc1, b_fc1, w_fc2, b_fc2,
    drop_mask1=None,
    drop_mask2=None,
    *,
    num_heads: int,
    eps: float = 1e-6,
    dtype=jnp.bfloat16,
):
    """Differentiable fused layer. x: (B, N, C); ``drop_mask{1,2}``: per-image
    stochastic-depth multipliers of shape (B,) (0 or 1/keep), or None for the
    identity. Returns (B, N, C) in ``x.dtype``, or None when the shape can't
    be grouped (caller falls back to the XLA path). Tanh-approximate GELU
    only — gate on ``approximate_gelu=True`` at the call site."""
    B, N, C = x.shape
    if C % num_heads or w_qkv.shape != (C, 3 * C):
        return None
    D = C // num_heads
    if D % 8 or N % 8:
        return None
    if _pick_group(B, N, 4) == 0 or _pick_group(B, N, 2) == 0:
        return None

    # fold the attention q-scale into W_qkv's first C columns (differentiable
    # traced ops: the unscaling of the gradient falls out of autodiff)
    scale = D ** -0.5
    col_scale = jnp.concatenate(
        [jnp.full((C,), scale, jnp.float32), jnp.ones((2 * C,), jnp.float32)]
    )
    w_qkv = w_qkv * col_scale
    b_qkv = (b_qkv if b_qkv is not None else jnp.zeros((3 * C,), jnp.float32)) * col_scale

    T = B * N
    ones = jnp.ones((B,), jnp.float32)
    m1 = jnp.repeat((drop_mask1 if drop_mask1 is not None else ones).astype(jnp.float32), N)[:, None]
    m2 = jnp.repeat((drop_mask2 if drop_mask2 is not None else ones).astype(jnp.float32), N)[:, None]

    out = _core(
        x.reshape(T, C), ln1_scale, ln1_bias, w_qkv, b_qkv, w_proj, b_proj,
        ln2_scale, ln2_bias, w_fc1, b_fc1, w_fc2, b_fc2, m1, m2,
        num_heads, eps, dtype, N,
    )
    return out.reshape(B, N, C)
