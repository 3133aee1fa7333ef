"""Bottom-up pose estimation: estimator module, AE head, DEKR head.

Parity targets:
- ``BottomupPoseEstimator`` (reference ``pose_estimators/bottomup.py``):
  whole-image multi-person estimation; predict emits dense fields, grouping
  happens host-side in the codec (dynamic instance counts don't jit).
- ``AssociativeEmbeddingHead`` (reference ``heads/heatmap_heads/ae_head.py``):
  a deconv heatmap head with 2K output channels — K keypoint heatmaps + K
  tagging maps; losses = KeypointMSE + AE push/pull.
- ``DEKRHead`` (reference ``heads/hybrid_heads/dekr_head.py:527``,
  simplified rescoring-free form): a heatmap branch (K+1 channels incl. the
  instance root) + a displacement branch (K*2 channels), decoded by the SPR
  codec.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from probpose_code_tpu.registry import MODELS

from ..heads.heatmap_head import ConvStack, DeconvStack


@MODELS.register_module()
class BottomupPoseEstimator(nn.Module):
    backbone: nn.Module
    head: nn.Module
    neck: Optional[nn.Module] = None

    def extract_feat(self, inputs: jnp.ndarray, train: bool = False):
        feats = self.backbone(inputs, train=train)
        if self.neck is not None:
            feats = self.neck(feats)
        return feats

    def __call__(self, inputs: jnp.ndarray, train: bool = False):
        return self.head(self.extract_feat(inputs, train=train), train=train)


@MODELS.register_module()
class AssociativeEmbeddingHead(nn.Module):
    in_channels: int
    num_keypoints: int
    tag_dim: int = 1
    tag_per_keypoint: bool = True
    deconv_out_channels: Optional[Sequence[int]] = (256,)
    deconv_kernel_sizes: Optional[Sequence[int]] = (4,)
    keypoint_loss: Any = None
    tag_loss: Any = None
    decoder: Any = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = False) -> Dict[str, jnp.ndarray]:
        x = feats[-1] if isinstance(feats, (tuple, list)) else feats
        if self.deconv_out_channels:
            x = DeconvStack(self.deconv_out_channels, self.deconv_kernel_sizes, self.dtype, name="deconv_layers")(
                x, train=train
            )
        tag_ch = self.num_keypoints * self.tag_dim if self.tag_per_keypoint else self.tag_dim
        x = nn.Conv(self.num_keypoints + tag_ch, (1, 1), name="final_layer")(x)
        x = jnp.transpose(x.astype(jnp.float32), (0, 3, 1, 2))
        return dict(heatmaps=x[:, : self.num_keypoints], tags=x[:, self.num_keypoints:])


class RescoreMLP(nn.Module):
    """DEKR RescoreNet (reference ``dekr_head.py:90-152``): 3-layer MLP over
    pose-geometry features predicting an instance OKS score. The forward at
    decode time runs HOST-side on the decoded (variable-count) instances —
    this module only materializes the params in the flax tree so torch
    checkpoints convert and orbax save/restore carries them. Params are
    ZERO-initialized: the net is pretrained-or-nothing (no gradient reaches
    it), and the decode tail skips rescoring while the kernels are all-zero
    (a random init would silently corrupt every instance score)."""

    hidden: int = 256

    @nn.compact
    def __call__(self, x):
        zeros = nn.initializers.zeros
        x = nn.relu(nn.Dense(self.hidden, kernel_init=zeros, name="l1")(x))
        x = nn.relu(nn.Dense(self.hidden, kernel_init=zeros, name="l2")(x))
        return nn.Dense(1, kernel_init=zeros, name="l3")(x)[..., 0]


@MODELS.register_module()
class DEKRHead(nn.Module):
    in_channels: int
    num_keypoints: int
    conv_out_channels: Sequence[int] = (32,)
    heatmap_loss: Any = None
    displacement_loss: Any = None
    decoder: Any = None
    rescore_cfg: Any = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = False) -> Dict[str, jnp.ndarray]:
        if self.rescore_cfg is not None:
            # materialize rescore-net params (host-side forward at decode
            # time); the zeros probe is dead code XLA eliminates
            RescoreMLP(name="rescore")(
                jnp.zeros((1, int(self.rescore_cfg.get("in_channels", 74))), jnp.float32)
            )
        x = feats[-1] if isinstance(feats, (tuple, list)) else feats
        # heatmap branch: K keypoints + 1 root channel
        h = ConvStack(self.conv_out_channels, [3] * len(self.conv_out_channels), self.dtype, name="heatmap_conv")(
            x, train=train
        )
        heatmaps = nn.Conv(self.num_keypoints + 1, (1, 1), name="heatmap_final")(h)
        # displacement branch: 2 channels per keypoint
        d = ConvStack(self.conv_out_channels, [3] * len(self.conv_out_channels), self.dtype, name="disp_conv")(
            x, train=train
        )
        displacements = nn.Conv(self.num_keypoints * 2, (1, 1), name="disp_final")(d)
        return dict(
            heatmaps=jnp.transpose(heatmaps.astype(jnp.float32), (0, 3, 1, 2)),
            displacements=jnp.transpose(displacements.astype(jnp.float32), (0, 3, 1, 2)),
        )


def ae_head_loss(outputs, batch, keypoint_loss, tag_loss) -> Dict[str, jnp.ndarray]:
    """AE head losses: heatmap MSE (+ valid-region mask, reference
    ``ae_head.py:294-299``) + push/pull over padded keypoint indices."""
    hm_mask = batch.get("heatmap_mask")
    losses = {
        "loss_kpt": keypoint_loss(
            outputs["heatmaps"], batch["heatmaps"], batch.get("keypoint_weights"),
            mask=hm_mask[:, None] if hm_mask is not None else None,
        )
    }
    if "keypoint_indices" in batch:
        pull, push = tag_loss(outputs["tags"], batch["keypoint_indices"])
        losses["loss_pull"] = pull
        losses["loss_push"] = push
    return losses


def dekr_head_loss(outputs, batch, heatmap_loss, displacement_loss) -> Dict[str, jnp.ndarray]:
    """DEKR losses: weighted heatmap MSE + smooth-L1 displacement field.
    An invalid-region ``heatmap_mask`` (BottomupGetHeatmapMask, reference
    ``dekr config`` train pipeline) multiplies into the heatmap weights."""
    mask = batch.get("heatmap_weights")
    hm_mask = batch.get("heatmap_mask")
    if hm_mask is not None:
        hm_mask = hm_mask[:, None]  # (B, 1, H, W) broadcast over channels
        mask = hm_mask if mask is None else mask * hm_mask
    losses = {
        "loss_kpt": heatmap_loss(outputs["heatmaps"], batch["heatmaps"], None, mask=mask)
    }
    if "displacements" in batch:
        losses["loss_disp"] = displacement_loss(
            outputs["displacements"], batch["displacements"], batch.get("displacement_weights")
        )
    return losses


# -- predict-time programs (device flip merges + host decode tail) ----------


def dekr_predict_merge(outputs, outputs_flipped, flip_indices, input_size,
                       shift_heatmap: bool) -> Dict[str, jnp.ndarray]:
    """Flip-TTA merge of DEKR dense outputs inside the jitted predict program
    (reference ``dekr_head.py:380-414``): heatmaps average with the root
    channel appended to the flip permutation; displacements flip in 'offset'
    mode with the x coordinate amendment."""
    from probpose_code_tpu.ops.tta import flip_heatmaps

    heatmaps = outputs["heatmaps"]
    displacements = outputs["displacements"]
    if outputs_flipped is not None:
        num_kpts = heatmaps.shape[1] - 1
        hm_f = flip_heatmaps(
            outputs_flipped["heatmaps"],
            flip_indices=list(flip_indices) + [num_kpts],
            flip_mode="heatmap",
            shift_heatmap=shift_heatmap,
        )
        heatmaps = (heatmaps + hm_f) * 0.5
        disp_f = flip_heatmaps(
            outputs_flipped["displacements"],
            flip_indices=list(flip_indices),
            flip_mode="offset",
            shift_heatmap=False,
        )
        # coordinate amendment (reference dekr_head.py:406-408)
        x_scale = input_size[0] / heatmaps.shape[-1]
        disp_f = disp_f.at[:, ::2].add((x_scale - 1.0) / x_scale)
        displacements = (displacements + disp_f) * 0.5
    return dict(heatmaps=heatmaps, displacements=displacements)


def ae_predict_merge(outputs, outputs_flipped, flip_indices, shift_heatmap: bool,
                     tag_per_keypoint: bool = True) -> Dict[str, jnp.ndarray]:
    """Flip-TTA merge for AE outputs (reference ``ae_head.py:127-158``):
    heatmaps average; tags from both views CONCATENATE along the tag dim so
    grouping sees both embeddings."""
    from probpose_code_tpu.ops.tta import flip_heatmaps

    heatmaps = outputs["heatmaps"]
    tags = outputs["tags"]
    if outputs_flipped is not None:
        hm_f = flip_heatmaps(
            outputs_flipped["heatmaps"], flip_indices=list(flip_indices),
            flip_mode="heatmap", shift_heatmap=shift_heatmap,
        )
        heatmaps = (heatmaps + hm_f) * 0.5
        tags_f = flip_heatmaps(
            outputs_flipped["tags"],
            flip_indices=list(flip_indices) if tag_per_keypoint else None,
            flip_mode="heatmap", shift_heatmap=shift_heatmap,
        )
        tags = jnp.concatenate([tags, tags_f], axis=1)
    return dict(heatmaps=heatmaps, tags=tags)


def rescore_dekr_instances(keypoints, keypoint_scores, skeleton, norm_indexes,
                           params) -> "np.ndarray":
    """Host-side DEKR RescoreNet forward (reference ``dekr_head.py:90-152``):
    relative joint offsets + torso-normalized link lengths + scores through a
    3-layer MLP whose params live in the regular flax tree
    (``head/rescore/l{1,2,3}``)."""
    import numpy as np

    joint_1, joint_2 = zip(*skeleton)
    relate = (keypoints[:, list(joint_1)] - keypoints[:, list(joint_2)])[..., :2]
    length = np.linalg.norm(relate, axis=-1)  # (N, L)
    normalize = (length[:, norm_indexes[0]] + length[:, norm_indexes[1]]) / 2
    normalize = np.clip(normalize, 1.0, None)[:, None]
    length = length / normalize
    relate = relate / normalize[..., None]
    feature = np.concatenate(
        [relate.reshape(len(keypoints), -1), length, keypoint_scores], axis=1
    ).astype(np.float32)

    x = np.maximum(feature @ np.asarray(params["l1"]["kernel"]) + np.asarray(params["l1"]["bias"]), 0)
    x = np.maximum(x @ np.asarray(params["l2"]["kernel"]) + np.asarray(params["l2"]["bias"]), 0)
    x = x @ np.asarray(params["l3"]["kernel"]) + np.asarray(params["l3"]["bias"])
    return x[:, 0]
