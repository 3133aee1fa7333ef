"""CIDHead: Contextual Instance Decoupling (CVPR 2022).

Behavioral parity with reference
``mmpose/models/heads/heatmap_heads/cid_head.py``: IIA module (1x1 conv +
truncated sigmoid, instance feature sampling at root coords, :57-200),
GFD module (channel + spatial attention conditioning of the shared
feature map, :201-362), CIDHead loss (coupled/decoupled focal heatmap
losses + per-image InfoNCE over instance features, :566-660) and predict
(root NMS -> top instances -> per-instance decoupled heatmaps, :491-564).

TPU-native: instances are padded to a static ``max_instances`` per batch;
the per-instance GFD pass is one batched program over (B*M) conditioned
copies with masked losses, instead of the reference's dynamic gather.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from probpose_code_tpu.registry import MODELS

EPS = 1e-4


def trunc_sigmoid(x, delta: float = EPS):
    return jnp.clip(jax.nn.sigmoid(x), delta, 1 - delta)


class GFDModule(nn.Module):
    """Global Feature Decoupling (reference :284-362)."""

    gfd_channels: int
    num_keypoints: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, instance_feats, instance_coords):
        """feats (N, H, W, C_in) gathered per instance; instance_feats
        (N, C_in); instance_coords (N, 2) xy in heatmap pixels."""
        N, H, W, _ = feats.shape
        g = nn.Conv(self.gfd_channels, (1, 1), name="conv_down")(feats)
        # channel attention
        ch = nn.Dense(self.gfd_channels, name="channel_atn")(instance_feats)
        ch_feats = g * ch[:, None, None, :]
        # spatial attention
        sp = nn.Dense(self.gfd_channels, name="spatial_atn")(instance_feats)
        feats_sp = g * sp[:, None, None, :]
        fsum = feats_sp.sum(axis=-1, keepdims=True)
        ys, xs = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32), jnp.arange(W, dtype=jnp.float32), indexing="ij")
        pix = jnp.stack([xs, ys], -1) + 0.5  # (H, W, 2)
        rel = (instance_coords[:, None, None, :] - pix[None]) / 32.0  # (N, H, W, 2)
        mask = jax.nn.sigmoid(nn.Conv(1, (5, 5), padding="SAME", name="spatial_conv")(
            jnp.concatenate([fsum, rel], axis=-1)
        ))
        sp_feats = g * mask
        fused = nn.Conv(self.gfd_channels, (1, 1), name="fuse_attention")(
            jnp.concatenate([ch_feats, sp_feats], axis=-1)
        )
        out = nn.Conv(self.num_keypoints, (1, 1), name="heatmap_conv")(nn.relu(fused))
        return trunc_sigmoid(out)


@MODELS.register_module()
class CIDHead(nn.Module):
    """IIA + GFD head. ``__call__`` returns the coupled (K+1) heatmaps and
    the shared feature map; ``forward_instances`` runs the GFD for a padded
    instance set."""

    in_channels: int
    gfd_channels: int
    num_keypoints: int
    prior_prob: float = 0.01
    coupled_heatmap_loss: Any = None
    decoupled_heatmap_loss: Any = None
    contrastive_loss: Any = None
    decoder: Any = None
    dtype: Any = jnp.float32

    def setup(self):
        bias = -math.log((1 - self.prior_prob) / self.prior_prob)
        self.keypoint_root_conv = nn.Conv(
            self.num_keypoints + 1, (1, 1), bias_init=nn.initializers.constant(bias), name="iia_conv"
        )
        self.gfd = GFDModule(self.gfd_channels, self.num_keypoints, dtype=self.dtype, name="gfd")

    def __call__(self, feats, train: bool = False) -> Dict[str, jnp.ndarray]:
        x = feats[-1] if isinstance(feats, (tuple, list)) else feats  # (B, H, W, C)
        heatmaps = trunc_sigmoid(self.keypoint_root_conv(x))
        return dict(
            feats=x.astype(jnp.float32),
            heatmaps=jnp.transpose(heatmaps.astype(jnp.float32), (0, 3, 1, 2)),
        )

    def forward_instances(self, feats, instance_coords, instance_imgids):
        """feats (B, H, W, C); instance_coords (N, 2) int xy; imgids (N,).

        Returns decoupled heatmaps (N, K, H, W).
        """
        inst_feats = feats[instance_imgids, instance_coords[:, 1], instance_coords[:, 0]]  # (N, C)
        g = feats[instance_imgids]  # (N, H, W, C)
        hm = self.gfd(g, inst_feats, instance_coords.astype(jnp.float32))
        return jnp.transpose(hm, (0, 3, 1, 2))


def cid_head_loss(
    outputs: Dict[str, jnp.ndarray],
    batch: Dict[str, jnp.ndarray],
    forward_instances,  # bound apply fn
    losses_cfg: Dict[str, Any],
) -> Dict[str, jnp.ndarray]:
    """Masked dense CID losses (reference ``cid_head.py:566-660``).

    batch: heatmaps (B, K+1, H, W), instance_coords (B, M, 2) int,
    instance_valid (B, M), instance_heatmaps (B, M, K, H, W),
    keypoint_weights (B, M, K), optional heatmap_mask (B, H, W).
    """
    B, M = batch["instance_coords"].shape[:2]
    coords = batch["instance_coords"].reshape(B * M, 2)
    imgids = jnp.repeat(jnp.arange(B), M)
    valid = batch["instance_valid"].reshape(B * M).astype(jnp.float32)

    feats = outputs["feats"]
    inst_feats = feats[imgids, coords[:, 1], coords[:, 0]]  # (BM, C)

    losses: Dict[str, jnp.ndarray] = {}
    mask = batch.get("heatmap_mask")
    if mask is not None:
        mask = mask[:, None]
    losses["loss/heatmap_coupled"] = losses_cfg["coupled"](
        outputs["heatmaps"], batch["heatmaps"], None, mask
    )

    pred_inst_hms = forward_instances(feats, coords, imgids)  # (BM, K, H, W)
    gt_inst = batch["instance_heatmaps"].reshape(B * M, *batch["instance_heatmaps"].shape[2:])
    kw = batch["keypoint_weights"].reshape(B * M, -1) * valid[:, None]
    losses["loss/heatmap_decoupled"] = losses_cfg["decoupled"](pred_inst_hms, gt_inst, kw)

    # per-image masked InfoNCE over instance features
    f = inst_feats.reshape(B, M, -1)
    fn = f / jnp.clip(jnp.linalg.norm(f, axis=-1, keepdims=True), 1e-8, None)
    temp = getattr(losses_cfg["contrastive"], "temp", 0.05)
    w = getattr(losses_cfg["contrastive"], "loss_weight", 1.0)
    logits = jnp.einsum("bmc,bnc->bmn", fn, fn) / temp
    vmask = batch["instance_valid"].astype(jnp.float32)
    neg_inf = jnp.where(vmask[:, None, :] > 0, 0.0, -1e9)
    logp = jax.nn.log_softmax(logits + neg_inf, axis=-1)
    diag = jnp.take_along_axis(logp, jnp.arange(M)[None, :, None], axis=-1)[..., 0]  # (B, M)
    n_total = jnp.clip(vmask.sum(), 1.0, None)
    losses["loss/contrastive"] = -(diag * vmask).sum() / n_total * w
    return losses


def smooth_heatmaps_device(heatmaps: jnp.ndarray, blur_kernel_size: int) -> jnp.ndarray:
    """Reference ``cid_head.py:smooth_heatmaps:19-31``: average-pool blur
    (count_include_pad semantics: divisor is always k*k) averaged with the
    raw maps. Works on any (..., H, W) layout."""
    if blur_kernel_size <= 1:
        return heatmaps
    k = blur_kernel_size
    pad = (k - 1) // 2
    ndim = heatmaps.ndim
    window = (1,) * (ndim - 2) + (k, k)
    padding = ((0, 0),) * (ndim - 2) + (((pad, pad),) * 2)
    summed = jax.lax.reduce_window(heatmaps, 0.0, jax.lax.add, window, (1,) * ndim, padding)
    return (heatmaps + summed / (k * k)) * 0.5


def cid_device_predict(
    outputs: Dict[str, jnp.ndarray],
    forward_instances,
    *,
    flip_test: bool = False,
    flip_indices: Optional[Sequence[int]] = None,
    input_size: Optional[Tuple[int, int]] = None,
    max_instances: int = 30,
    score_threshold: float = 0.01,
    blur_kernel_size: int = 3,
) -> Dict[str, jnp.ndarray]:
    """Root detect -> top-M instances -> decoupled heatmaps -> refine decode,
    entirely in the jitted program (reference ``forward_test`` :152-200 +
    ``predict`` :491-564, with the reference's dynamic instance filtering
    replaced by a static top-M + validity mask).

    With ``flip_test`` the inputs batch is [orig; mirrored] (2B): the IIA is
    a 1x1 conv, which commutes with the mirror, so the flipped half's feats
    and heatmaps are spatially re-aligned here (reference flips the FEATURE
    map before the IIA, ``cid_head.py:523-527``); decoupled heatmaps from the
    mirrored half are channel-gathered with ``flip_indices`` and averaged
    (:540-543).
    """
    from probpose_code_tpu.ops.decode import quarter_offset_refine_batch
    from probpose_code_tpu.ops.heatmap import batch_heatmap_nms

    heatmaps = outputs["heatmaps"]  # (B or 2B, K+1, H, W)
    feats = outputs["feats"]  # NHWC
    if flip_test:
        B = heatmaps.shape[0] // 2
        roots = (heatmaps[:B, -1:] + heatmaps[B:, -1:, :, ::-1]) * 0.5
        feats = jnp.concatenate([feats[:B], feats[B:, :, ::-1, :]], axis=0)
    else:
        B = heatmaps.shape[0]
        roots = heatmaps[:, -1:]
    H, W = roots.shape[-2:]
    max_instances = min(max_instances, H * W)

    smoothed = smooth_heatmaps_device(roots, blur_kernel_size)
    # hierarchical pool (reference :114-132): kernel grows with map size
    map_size = (H + W) / 2.0
    nms_kernel = 7 if map_size > 300 else (5 if map_size > 200 else 3)
    peaks = batch_heatmap_nms(smoothed, nms_kernel)[:, 0]  # (B, H, W)
    scores, idx = jax.lax.top_k(peaks.reshape(B, -1), max_instances)  # (B, M)
    xs = (idx % W).astype(jnp.int32)
    ys = (idx // W).astype(jnp.int32)
    coords = jnp.stack([xs, ys], -1).reshape(B * max_instances, 2)
    imgids = jnp.repeat(jnp.arange(B), max_instances)
    if flip_test:
        coords_all = jnp.concatenate([coords, coords], axis=0)
        imgids_all = jnp.concatenate([imgids, imgids + B], axis=0)
    else:
        coords_all, imgids_all = coords, imgids

    inst_hms = forward_instances(feats, coords_all, imgids_all)  # ((1|2)BM, K, H, W)
    if flip_test:
        orig, flipped = jnp.split(inst_hms, 2, axis=0)
        flipped = flipped[:, jnp.asarray(list(flip_indices))]
        inst_hms = (orig + flipped) * 0.5
    inst_hms = smooth_heatmaps_device(inst_hms, blur_kernel_size)  # (BM, K, H, W)

    # DecoupledHeatmap-codec decode on device: argmax + quarter-offset refine
    K = inst_hms.shape[1]
    kflat = inst_hms.reshape(B * max_instances, K, -1)
    kidx = jnp.argmax(kflat, axis=-1)
    kx = (kidx % W).astype(jnp.float32)
    ky = (kidx // W).astype(jnp.float32)
    locs = jnp.stack([kx, ky], -1)  # (BM, K, 2)
    locs = quarter_offset_refine_batch(locs, inst_hms)
    kscores = jnp.take_along_axis(kflat, kidx[..., None], axis=-1)[..., 0]
    kscores = kscores.reshape(B, max_instances, K) * scores[..., None]

    keypoints = locs.reshape(B, max_instances, K, 2)
    if input_size is not None:
        # input-space scale + the half-cell center shift the reference adds
        # after decoding (cid_head.py:549-551)
        scale = jnp.asarray([input_size[0] / W, input_size[1] / H], jnp.float32)
        keypoints = keypoints * scale + scale * 0.5
    return dict(
        keypoints=keypoints,
        keypoint_scores=kscores,
        scores=scores * (scores > score_threshold),
        instance_coords=coords.reshape(B, max_instances, 2),
    )
