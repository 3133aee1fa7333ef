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


def _sparsemax_fwd_impl(z: jnp.ndarray, axis: int):
    z = jnp.moveaxis(z, axis, -1)
    n = z.shape[-1]
    # stabilize like softmax; sparsemax is shift-invariant
    z_shift = z - jax.lax.stop_gradient(jnp.max(z, axis=-1, keepdims=True))
    z_sorted = jnp.sort(z_shift, axis=-1)[..., ::-1]
    cumsum = jnp.cumsum(z_sorted, axis=-1)
    ks = jnp.arange(1, n + 1, dtype=z.dtype)
    support = z_sorted * ks > (cumsum - 1.0)
    k_z = jnp.sum(support, axis=-1, keepdims=True)  # |support| >= 1 always
    cumsum_k = jnp.take_along_axis(cumsum, k_z.astype(jnp.int32) - 1, axis=-1)
    tau = (cumsum_k - 1.0) / k_z.astype(z.dtype)
    p = jnp.maximum(z_shift - tau, 0.0)
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
