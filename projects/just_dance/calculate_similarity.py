"""Pose-sequence similarity for the Just Dance demo.

Behavioral parity target: reference
``projects/just_dance/calculate_similarity.py`` — an (M student frames x
N teacher frames) similarity matrix from per-frame COCO keypoints,
computed on the bbox-normalized joint layout, then the best time
alignment picked as the anti-diagonal with the highest summed similarity.

TPU mapping: the reference's torch/CUDA elementwise pipeline becomes one
jitted jnp program over the full (M, N, K) block; the diagonal-sum scan
and max-pool smoothing are tiny host-side numpy.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

flip_indices = np.array([0, 2, 1, 4, 3, 6, 5, 8, 7, 10, 9, 12, 11, 14, 13, 16, 15])
valid_indices = np.array([0] + list(range(5, 17)))


@jax.jit
def _similarity_block(stu: jnp.ndarray, tch: jnp.ndarray) -> jnp.ndarray:
    """stu (M, K', 3), tch (N, K', 3) -> (M, N) similarity (reference
    ``_calculate_similarity``: per-pair bbox-normalized coordinates, score
    gating at 0.3, exp(-50 d^2) weighted by joint visibility, scaled by a
    log visible-count factor)."""
    s = stu[:, None]  # (M, 1, K, 3)
    t = tch[None, :]  # (1, N, K, 3)
    pair = jnp.stack(jnp.broadcast_arrays(s, t), axis=-1)  # (M, N, K, 3, 2)
    mask = (pair[..., 2, 0] > 0.3) & (pair[..., 2, 1] > 0.3)  # (M, N, K)
    pair = jnp.where(mask[..., None, None], pair, 0.0)

    big = jnp.where(pair == 0, 256.0, pair)
    x_min = big[..., 0, :].min(axis=2, keepdims=False)  # (M, N, 2)
    y_min = big[..., 1, :].min(axis=2, keepdims=False)
    x_max = pair[..., 0, :].max(axis=2)
    y_max = pair[..., 1, :].max(axis=2)

    x = (pair[..., 0, :] - x_min[:, :, None]) / (x_max[:, :, None] - x_min[:, :, None] + 1e-4)
    y = (pair[..., 1, :] - y_min[:, :, None]) / (y_max[:, :, None] - y_min[:, :, None] + 1e-4)
    vis = (pair[..., 2, :] > 0.3).astype(jnp.float32)

    xy_dist = jnp.stack([x, y], axis=-2)  # (M, N, K, 2, 2)
    d = xy_dist[..., 0] - xy_dist[..., 1]  # (M, N, K, 2)
    score = vis[..., 0] * vis[..., 1]  # (M, N, K)

    sim = (jnp.exp(-50.0 * (d ** 2).sum(-1)) * score).sum(-1) / (score.sum(-1) + 1e-6)
    n_vis = score.sum(-1)
    sim = sim * jnp.log(jnp.clip(1 + (n_vis - 1) * 10, 1, None)) / np.log(161)
    return jnp.nan_to_num(sim)


def calculate_similarity(tch_kpts: np.ndarray, stu_kpts: np.ndarray) -> np.ndarray:
    """Max of the direct and horizontally-flipped student similarity
    (reference :47-62; the flip mirrors x around the 192-px crop)."""
    assert tch_kpts.shape[1:] == (17, 3) and stu_kpts.shape[1:] == (17, 3)
    stu = jnp.asarray(stu_kpts[:, valid_indices], jnp.float32)
    tch = jnp.asarray(tch_kpts[:, valid_indices], jnp.float32)
    sim1 = _similarity_block(stu, tch)

    stu_flip = stu_kpts[:, flip_indices].copy()
    stu_flip[..., 0] = 191.5 - stu_flip[..., 0]
    sim2 = _similarity_block(jnp.asarray(stu_flip[:, valid_indices], jnp.float32), tch)
    return np.asarray(jnp.maximum(sim1, sim2))


def select_piece_from_similarity(similarity: np.ndarray) -> dict:
    """Best anti-diagonal alignment + max-pool-smoothed per-frame scores
    (reference :65-85)."""
    similarity = np.asarray(similarity)
    m, n = similarity.shape
    rows = np.arange(m)[:, None]
    cols = np.arange(n)[None, :]
    diag = m - 1 - rows + cols  # anti-diagonal index in [0, m+n-2]
    sums = np.zeros(m + n - 1, similarity.dtype)
    np.add.at(sums, diag.ravel(), similarity.ravel())
    sums[: min(m, n) // 4] = 0
    sums[-min(m, n) // 4 :] = 0  # floor-of-negative, like the reference
    index = int(sums.argmax())

    # horizontal max-pool (kernel 11, pad 5) then take the chosen diagonal
    pad = np.pad(similarity, ((0, 0), (5, 5)), constant_values=-np.inf)
    smooth = np.max(np.stack([pad[:, i : i + n] for i in range(11)]), axis=0)
    vec = np.diagonal(smooth, offset=index - m + 1)

    return dict(
        stu_start=max(0, m - 1 - index),
        tch_start=max(0, index - m + 1),
        length=len(vec),
        similarity=np.asarray(vec),
    )
