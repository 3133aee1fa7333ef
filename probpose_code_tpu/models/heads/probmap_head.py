"""ProbMapHead — the ProbPose 5-branch head (flax, NHWC).

Parity target: reference ``mmpose/models/heads/hybrid_heads/probmap_head.py``
(1,128 LoC). Five outputs from the backbone feature map:

1. heatmaps      — deconv stack -> 1x1 conv -> sparsemax(x / T) over H*W
                   (T=0.5, scaled by ``normalize``), clamped to [0, 1]
2. probabilities — conv/BN/maxpool tower -> sigmoid  (P(keypoint in image))
3. visibilities  — same tower -> sigmoid
4. oks           — same tower -> sigmoid (detached input)
5. errors        — same tower -> ReLU    (detached input)

The aux towers pool the (16, 12) ViT grid to (1, 1) via kernel sizes
(4,3)/(2,2)/(2,2) (reference :264). ``detach_*``/``freeze_*`` map to
``stop_gradient`` on the branch input/output — parameter-freezing by cutting
the only gradient path.

Training-loss and predict-time logic (flip-TTA averaging, on-device OKS /
error target computation replacing the reference's per-step CPU round-trip,
``probmap_head.py:474-537``) live in ``models/pose_estimators/topdown.py``.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from probpose_code_tpu.ops.sparsemax import sparsemax
from probpose_code_tpu.registry import MODELS

from .heatmap_head import ConvStack, DeconvStack


class ScalarBranchTower(nn.Module):
    """conv3x3 + BN + maxpool + ReLU x3, then 1x1 conv -> (B, K)."""

    channels: int
    out_channels: int
    pool_sizes: Sequence = ((4, 3), (2, 2), (2, 2))
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        for i, pool in enumerate(self.pool_sizes):
            x = nn.Conv(self.channels, kernel_size=(3, 3), padding="SAME", dtype=self.dtype, name=f"conv{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, name=f"bn{i}")(x)
            # clamp the window to the remaining extent: feature grids smaller
            # than the canonical 16x12 (inputs < 256x192) would otherwise
            # produce an EMPTY tensor whose mean is silently nan
            window = (min(pool[0], x.shape[1]), min(pool[1], x.shape[2]))
            x = nn.max_pool(x, window_shape=window, strides=window, padding="VALID")
            x = nn.relu(x)
        x = nn.Conv(self.out_channels, kernel_size=(1, 1), name="final")(x)
        # pool the (possibly > 1x1) residual grid to a scalar per channel
        x = jnp.mean(x, axis=(1, 2))
        return x.astype(jnp.float32)  # (B, K) logits


@MODELS.register_module()
class ProbMapHead(nn.Module):
    in_channels: int
    out_channels: int
    deconv_out_channels: Optional[Sequence[int]] = (256, 256, 256)
    deconv_kernel_sizes: Optional[Sequence[int]] = (4, 4, 4)
    conv_out_channels: Optional[Sequence[int]] = None
    conv_kernel_sizes: Optional[Sequence[int]] = None
    temperature: float = 0.5
    normalize: Optional[float] = None
    detach_probability: bool = True
    detach_visibility: bool = True
    learn_heatmaps_from_zeros: bool = False
    freeze_heatmaps: bool = False
    freeze_probability: bool = False
    freeze_visibility: bool = False
    freeze_oks: bool = False
    freeze_error: bool = False
    # loss / decoder configs are consumed by the estimator's loss/predict
    keypoint_loss: Any = None
    probability_loss: Any = None
    visibility_loss: Any = None
    oks_loss: Any = None
    error_loss: Any = None
    decoder: Any = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = False) -> Dict[str, jnp.ndarray]:
        x = feats[-1] if isinstance(feats, (tuple, list)) else feats  # (B, h, w, C)

        # -- heatmap branch ---------------------------------------------
        h = x
        if self.deconv_out_channels:
            h = DeconvStack(self.deconv_out_channels, self.deconv_kernel_sizes, self.dtype, name="deconv_layers")(
                h, train=train
            )
        if self.conv_out_channels:
            h = ConvStack(self.conv_out_channels, self.conv_kernel_sizes, self.dtype, name="conv_layers")(
                h, train=train
            )
        h = nn.Conv(self.out_channels, kernel_size=(1, 1), name="final_layer")(h)
        h = jnp.transpose(h.astype(jnp.float32), (0, 3, 1, 2))  # (B, K, H, W)
        B, K, H, W = h.shape
        h = h.reshape(B, K, H * W)
        if self.normalize is not None:
            h = sparsemax(h / self.temperature)
            h = h * self.normalize
        else:
            h = h / self.temperature
        heatmaps = jnp.clip(h, 0.0, 1.0).reshape(B, K, H, W)
        if self.freeze_heatmaps:
            heatmaps = jax.lax.stop_gradient(heatmaps)

        # -- scalar branches --------------------------------------------
        x_prob = jax.lax.stop_gradient(x) if self.detach_probability else x
        probabilities = nn.sigmoid(
            ScalarBranchTower(self.in_channels, self.out_channels, dtype=self.dtype, name="probability_layers")(
                x_prob, train=train
            )
        )
        if self.freeze_probability:
            probabilities = jax.lax.stop_gradient(probabilities)

        x_vis = jax.lax.stop_gradient(x) if self.detach_visibility else x
        visibilities = nn.sigmoid(
            ScalarBranchTower(self.in_channels, self.out_channels, dtype=self.dtype, name="visibility_layers")(
                x_vis, train=train
            )
        )
        if self.freeze_visibility:
            visibilities = jax.lax.stop_gradient(visibilities)

        x_det = jax.lax.stop_gradient(x)
        oks = nn.sigmoid(
            ScalarBranchTower(self.in_channels, self.out_channels, dtype=self.dtype, name="oks_layers")(
                x_det, train=train
            )
        )
        if self.freeze_oks:
            oks = jax.lax.stop_gradient(oks)

        errors = nn.relu(
            ScalarBranchTower(self.in_channels, self.out_channels, dtype=self.dtype, name="error_layers")(
                x_det, train=train
            )
        )
        if self.freeze_error:
            errors = jax.lax.stop_gradient(errors)

        return dict(
            heatmaps=heatmaps,
            probabilities=probabilities,
            visibilities=visibilities,
            oks=oks,
            errors=errors,
        )


class HeatmapTower(nn.Module):
    """deconv stack + conv stack + 1x1 final (+ sigmoid) -> (B, K, H, W).

    One of the two heatmap branches of DoubleProbMapHead (reference
    ``DP_head.py:_build_heatmap_head:301``: deconv/conv/final/normalize)."""

    out_channels: int
    deconv_out_channels: Optional[Sequence[int]] = (256, 256, 256)
    deconv_kernel_sizes: Optional[Sequence[int]] = (4, 4, 4)
    conv_out_channels: Optional[Sequence[int]] = None
    conv_kernel_sizes: Optional[Sequence[int]] = None
    normalize: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if self.deconv_out_channels:
            x = DeconvStack(self.deconv_out_channels, self.deconv_kernel_sizes, self.dtype, name="deconv_layers")(
                x, train=train
            )
        if self.conv_out_channels:
            x = ConvStack(self.conv_out_channels, self.conv_kernel_sizes, self.dtype, name="conv_layers")(
                x, train=train
            )
        x = nn.Conv(self.out_channels, kernel_size=(1, 1), name="final_layer")(x)
        x = jnp.transpose(x.astype(jnp.float32), (0, 3, 1, 2))  # (B, K, H, W)
        if self.normalize:
            x = nn.sigmoid(x)
        return x


@MODELS.register_module()
class DoubleProbMapHead(nn.Module):
    """Dual-heatmap ProbPose head (reference ``hybrid_heads/DP_head.py:50``).

    Two full heatmap towers over the same backbone features: the first
    predicts keypoints on the tight "in" activation window (codec
    ``in_heatmap_padding``), the second on the expanded "out" window
    (``out_heatmap_padding``) so out-of-image keypoints stay supervisable.
    Plus the four scalar branches (probability/visibility/OKS/error) shared
    with ProbMapHead. Merge of the two windows (reference
    ``merge_heatmaps:693`` / ``_merge_predictions:1460``) happens in the
    loss/predict programs in ``pose_estimators/topdown.py``.
    """

    in_channels: int
    out_channels: int
    deconv_out_channels: Optional[Sequence[int]] = (256, 256, 256)
    deconv_kernel_sizes: Optional[Sequence[int]] = (4, 4, 4)
    conv_out_channels: Optional[Sequence[int]] = None
    conv_kernel_sizes: Optional[Sequence[int]] = None
    normalize: bool = False
    detach_probability: bool = True
    detach_visibility: bool = True
    detach_second_heatmaps: bool = False
    learn_heatmaps_from_zeros: bool = False
    split_heatmaps_by: str = "in/all"
    freeze_heatmaps: bool = False
    freeze_second_heatmaps: bool = False
    freeze_probability: bool = False
    freeze_visibility: bool = False
    freeze_oks: bool = False
    freeze_error: bool = False
    # loss / decoder configs are consumed by the estimator's loss/predict
    keypoint_loss: Any = None
    probability_loss: Any = None
    visibility_loss: Any = None
    oks_loss: Any = None
    error_loss: Any = None
    decoder: Any = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = False) -> Dict[str, jnp.ndarray]:
        assert self.split_heatmaps_by in ("visibility", "in/out", "in/all")
        x = feats[-1] if isinstance(feats, (tuple, list)) else feats  # (B, h, w, C)

        tower = dict(
            out_channels=self.out_channels,
            deconv_out_channels=self.deconv_out_channels,
            deconv_kernel_sizes=self.deconv_kernel_sizes,
            conv_out_channels=self.conv_out_channels,
            conv_kernel_sizes=self.conv_kernel_sizes,
            normalize=self.normalize,
            dtype=self.dtype,
        )
        heatmaps1 = HeatmapTower(**tower, name="first_head")(x, train=train)
        if self.freeze_heatmaps:
            heatmaps1 = jax.lax.stop_gradient(heatmaps1)

        x2 = jax.lax.stop_gradient(x) if self.detach_second_heatmaps else x
        heatmaps2 = HeatmapTower(**tower, name="second_head")(x2, train=train)
        if self.freeze_second_heatmaps:
            heatmaps2 = jax.lax.stop_gradient(heatmaps2)

        x_prob = jax.lax.stop_gradient(x) if self.detach_probability else x
        probabilities = nn.sigmoid(
            ScalarBranchTower(self.in_channels, self.out_channels, dtype=self.dtype, name="probability_layers")(
                x_prob, train=train
            )
        )
        if self.freeze_probability:
            probabilities = jax.lax.stop_gradient(probabilities)

        x_vis = jax.lax.stop_gradient(x) if self.detach_visibility else x
        visibilities = nn.sigmoid(
            ScalarBranchTower(self.in_channels, self.out_channels, dtype=self.dtype, name="visibility_layers")(
                x_vis, train=train
            )
        )
        if self.freeze_visibility:
            visibilities = jax.lax.stop_gradient(visibilities)

        x_det = jax.lax.stop_gradient(x)
        oks = nn.sigmoid(
            ScalarBranchTower(self.in_channels, self.out_channels, dtype=self.dtype, name="oks_layers")(
                x_det, train=train
            )
        )
        if self.freeze_oks:
            oks = jax.lax.stop_gradient(oks)

        errors = nn.relu(
            ScalarBranchTower(self.in_channels, self.out_channels, dtype=self.dtype, name="error_layers")(
                x_det, train=train
            )
        )
        if self.freeze_error:
            errors = jax.lax.stop_gradient(errors)

        return dict(
            heatmaps=heatmaps1,
            out_heatmaps=heatmaps2,
            probabilities=probabilities,
            visibilities=visibilities,
            oks=oks,
            errors=errors,
        )
