"""RealNVP normalizing flow for RLE regression (flax).

Parity target: reference ``mmpose/models/utils/realnvp.py``: six coupling
layers with alternating [0,1]/[1,0] masks, scale nets ending in tanh, and
a standard-normal prior. ``log_prob`` evaluates the density of residual
errors for the RLE loss.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

_MASKS = np.array([[0, 1], [1, 0]] * 3, dtype=np.float32)

# torch init: xavier_uniform_(weight, gain=0.01) -> variance scaled by 1e-4
_init = nn.initializers.variance_scaling(1e-4, "fan_avg", "uniform")


class _ScaleNet(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = nn.leaky_relu(nn.Dense(64, kernel_init=_init)(x), 0.01)
        x = nn.leaky_relu(nn.Dense(64, kernel_init=_init)(x), 0.01)
        return nn.tanh(nn.Dense(2, kernel_init=_init)(x))


class _TransNet(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = nn.leaky_relu(nn.Dense(64, kernel_init=_init)(x), 0.01)
        x = nn.leaky_relu(nn.Dense(64, kernel_init=_init)(x), 0.01)
        return nn.Dense(2, kernel_init=_init)(x)


class RealNVP(nn.Module):
    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """log_prob of x (N, 2) under the flow."""
        masks = jnp.asarray(_MASKS)
        log_det = jnp.zeros(x.shape[0], dtype=x.dtype)
        z = x
        for i in reversed(range(masks.shape[0])):
            m = masks[i]
            z_ = m * z
            s = _ScaleNet(name=f"s{i}")(z_) * (1 - m)
            t = _TransNet(name=f"t{i}")(z_) * (1 - m)
            z = (1 - m) * (z - t) * jnp.exp(-s) + z_
            log_det = log_det - s.sum(axis=1)
        # standard bivariate normal prior
        prior_logp = -0.5 * (z**2).sum(axis=1) - jnp.log(2 * jnp.pi)
        return prior_logp + log_det
