"""Sparsemax (sparse softmax) in JAX with a closed-form custom VJP.

Replaces the reference's pip ``sparsemax`` package (torch autograd), used by
ProbMapHead to normalize heatmap logits over the flattened H*W axis
(reference ``probmap_head.py:11,251,642``).

Forward (Martins & Astudillo, 2016): project z onto the probability simplex:
    p = max(z - tau(z), 0),  tau = (sum_{support} z - 1) / |support|
Backward: dL/dz = g - mean_support(g) on the support, 0 elsewhere.

The sort-based forward runs on-device (B*K rows of H*W=3072 on the default
ProbPose geometry) and fuses cleanly under jit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


from functools import partial


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def sparsemax(z: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    p, _ = _sparsemax_fwd_impl(z, axis)
    return p


def _sparsemax_fwd_impl(z: jnp.ndarray, axis: int, iters: int = 26):
    """Threshold search by bisection — ~4x faster than the sort-based
    simplex projection on TPU (sorts are VPU-hostile) and exact to fp32
    precision: after shifting so max(z) = 0, tau lies in [-1, 0] and
    ``sum(max(z - tau, 0))`` is monotone decreasing in tau."""
    z = jnp.moveaxis(z, axis, -1)
    z_shift = z - jax.lax.stop_gradient(jnp.max(z, axis=-1, keepdims=True))
    lo = jnp.full(z_shift.shape[:-1] + (1,), -1.0, dtype=z_shift.dtype)
    hi = jnp.zeros(z_shift.shape[:-1] + (1,), dtype=z_shift.dtype)

    def body(_, carry):
        lo, hi = carry
        mid = (lo + hi) * 0.5
        mass = jnp.maximum(z_shift - mid, 0.0).sum(axis=-1, keepdims=True)
        return jnp.where(mass > 1.0, mid, lo), jnp.where(mass > 1.0, hi, mid)

    lo, hi = jax.lax.fori_loop(0, iters, body, (lo, hi))
    tau = (lo + hi) * 0.5
    p = jnp.maximum(z_shift - tau, 0.0)
    # exact renormalization over the support removes the residual bisection
    # error (keeps sum(p) == 1 to machine precision)
    p = p / jnp.maximum(p.sum(axis=-1, keepdims=True), 1e-12)
    return jnp.moveaxis(p, -1, axis), (p, axis)


def _sparsemax_fwd(z, axis):
    out, (p, _) = _sparsemax_fwd_impl(z, axis)
    return out, p


def _sparsemax_bwd(axis, p, g):
    g_m = jnp.moveaxis(g, axis, -1)
    support = (p > 0).astype(g_m.dtype)
    g_sum = jnp.sum(g_m * support, axis=-1, keepdims=True)
    n_support = jnp.maximum(jnp.sum(support, axis=-1, keepdims=True), 1.0)
    dz = support * (g_m - g_sum / n_support)
    return (jnp.moveaxis(dz, -1, axis),)


sparsemax.defvjp(_sparsemax_fwd, _sparsemax_bwd)
