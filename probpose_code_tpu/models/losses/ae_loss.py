"""Associative Embedding (push/pull) grouping loss (JAX, masked form).

Parity target: reference ``mmpose/models/losses/ae_loss.py``
(AssociativeEmbeddingLoss): pull = MSE of each keypoint tag to its instance
mean; push = mean over instance pairs of exp(-(mean_i - mean_j)^2), diagonal
removed. The reference loops Python-side over data-dependent instance
counts; here instances are padded to a static N and masked, so the loss runs
inside the jitted step.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from probpose_code_tpu.registry import MODELS


@MODELS.register_module()
class AssociativeEmbeddingLoss:
    def __init__(self, loss_weight: float = 1.0, push_loss_factor: float = 0.5):
        self.loss_weight = loss_weight
        self.push_loss_factor = push_loss_factor

    def _per_image(self, tags: jnp.ndarray, keypoint_indices: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """tags (K*L, H, W); keypoint_indices (N, K, 2) [flat_index, valid]."""
        N, K, _ = keypoint_indices.shape
        C, H, W = tags.shape
        L = C // K
        tags = tags.reshape(L, K, H * W)

        idx = keypoint_indices[..., 0].astype(jnp.int32)  # (N, K)
        valid = keypoint_indices[..., 1].astype(jnp.float32)  # (N, K)
        idx = jnp.clip(idx, 0, H * W - 1)

        # gather per-keypoint tags: (L, N, K)
        kpt_tags = jnp.stack(
            [jnp.take_along_axis(tags[l], idx.T, axis=1).T for l in range(L)], axis=0
        )
        n_valid = valid.sum(axis=1)  # (N,)
        inst_mean = (kpt_tags * valid[None]).sum(axis=2) / jnp.maximum(n_valid[None], 1.0)  # (L, N)
        inst_valid = (n_valid > 0).astype(jnp.float32)

        # pull: per-instance MSE to the instance mean, averaged like the
        # reference (sum over instances of per-instance mean, / max(N,1))
        sq = ((kpt_tags - inst_mean[:, :, None]) ** 2).sum(axis=0)  # (N, K)
        per_inst = (sq * valid).sum(axis=1) / jnp.maximum(n_valid, 1.0)
        n_inst = jnp.maximum(inst_valid.sum(), 1.0)
        pull = (per_inst * inst_valid).sum() / n_inst

        # push: exp(-diff^2) over instance pairs (diagonal removed)
        diff = inst_mean[:, :, None] - inst_mean[:, None, :]  # (L, N, N)
        affinity = jnp.exp(-(diff**2).sum(axis=0))
        pair_valid = inst_valid[:, None] * inst_valid[None]
        eye = jnp.eye(N)
        push = ((affinity - eye) * pair_valid * (1 - eye)).sum() / jnp.maximum(n_inst**2 - n_inst, 1.0) \
            if N > 1 else jnp.float32(0.0)
        push = jnp.where(inst_valid.sum() > 1, push, 0.0)
        return pull, push

    def __call__(self, tags: jnp.ndarray, keypoint_indices: jnp.ndarray):
        """tags (B, K*L, H, W); keypoint_indices (B, N, K, 2) padded."""
        B = tags.shape[0]
        pulls, pushes = [], []
        for b in range(B):
            pull, push = self._per_image(tags[b], keypoint_indices[b])
            pulls.append(pull)
            pushes.append(push)
        pull_loss = jnp.stack(pulls).mean() * self.loss_weight
        push_loss = jnp.stack(pushes).mean() * self.loss_weight * self.push_loss_factor
        return pull_loss, push_loss
