"""Coordinate-regression losses (JAX).

Parity targets in reference ``mmpose/models/losses/regression_loss.py``:
SmoothL1Loss:90, L1LogLoss:135 (ProbPose error branch), SoftWeightSmoothL1:183,
WingLoss:258, SoftWingLoss:321, MPJPELoss:446, L1Loss:485, MSELoss:524,
RLELoss:16 (residual log-likelihood with a RealNVP flow — flow lives in
``models.utils.realnvp``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from probpose_code_tpu.registry import MODELS


def _smooth_l1(pred, target, beta: float = 1.0):
    diff = jnp.abs(pred - target)
    return jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)


def _apply_weight_product(output, target, target_weight):
    """Reference semantics: multiply BOTH operands by the weight."""
    w = target_weight
    while w.ndim < output.ndim:
        w = w[..., None]
    return output * w, target * w


@MODELS.register_module()
class SmoothL1Loss:
    def __init__(self, use_target_weight: bool = False, loss_weight: float = 1.0):
        self.use_target_weight = use_target_weight
        self.loss_weight = loss_weight

    def __call__(self, output, target, target_weight=None):
        if self.use_target_weight:
            assert target_weight is not None
            output, target = _apply_weight_product(output, target, target_weight)
        return _smooth_l1(output, target).mean() * self.loss_weight


@MODELS.register_module()
class L1LogLoss:
    """Smooth-L1 on log(1 + x) — relative error; ProbPose error branch."""

    def __init__(self, use_target_weight: bool = False, loss_weight: float = 1.0):
        self.use_target_weight = use_target_weight
        self.loss_weight = loss_weight

    def __call__(self, output, target, target_weight=None):
        output = jnp.log1p(output)
        target = jnp.log1p(target)
        if self.use_target_weight:
            assert target_weight is not None
            output, target = _apply_weight_product(output, target, target_weight)
        return _smooth_l1(output, target).mean() * self.loss_weight


@MODELS.register_module()
class L1Loss:
    def __init__(self, reduction: str = "mean", use_target_weight: bool = False, loss_weight: float = 1.0):
        assert reduction in ("mean", "sum", "none")
        self.reduction = reduction
        self.use_target_weight = use_target_weight
        self.loss_weight = loss_weight

    def __call__(self, output, target, target_weight=None):
        if self.use_target_weight:
            assert target_weight is not None
            output, target = _apply_weight_product(output, target, target_weight)
        loss = jnp.abs(output - target)
        if self.reduction == "mean":
            loss = loss.mean()
        elif self.reduction == "sum":
            loss = loss.sum()
        return loss * self.loss_weight


@MODELS.register_module()
class MSELoss:
    def __init__(self, use_target_weight: bool = False, loss_weight: float = 1.0):
        self.use_target_weight = use_target_weight
        self.loss_weight = loss_weight

    def __call__(self, output, target, target_weight=None):
        if self.use_target_weight:
            assert target_weight is not None
            output, target = _apply_weight_product(output, target, target_weight)
        return jnp.mean((output - target) ** 2) * self.loss_weight


@MODELS.register_module()
class WingLoss:
    def __init__(
        self,
        omega: float = 10.0,
        epsilon: float = 2.0,
        use_target_weight: bool = False,
        loss_weight: float = 1.0,
    ):
        self.omega = omega
        self.epsilon = epsilon
        self.use_target_weight = use_target_weight
        self.loss_weight = loss_weight
        self.C = self.omega * (1.0 - jnp.log(1.0 + self.omega / self.epsilon))

    def _criterion(self, pred, target):
        delta = jnp.abs(target - pred)
        losses = jnp.where(
            delta < self.omega,
            self.omega * jnp.log(1.0 + delta / self.epsilon),
            delta - self.C,
        )
        return losses.mean(axis=-1).mean(axis=-1).sum()

    def __call__(self, output, target, target_weight=None):
        if self.use_target_weight:
            assert target_weight is not None
            output, target = _apply_weight_product(output, target, target_weight)
        return self._criterion(output, target) * self.loss_weight


@MODELS.register_module()
class SoftWingLoss:
    def __init__(
        self,
        omega1: float = 2.0,
        omega2: float = 20.0,
        epsilon: float = 0.5,
        use_target_weight: bool = False,
        loss_weight: float = 1.0,
    ):
        self.omega1 = omega1
        self.omega2 = omega2
        self.epsilon = epsilon
        self.use_target_weight = use_target_weight
        self.loss_weight = loss_weight
        self.B = self.omega1 - self.omega2 * jnp.log(1.0 + self.omega1 / self.epsilon)

    def _criterion(self, pred, target):
        delta = jnp.abs(target - pred)
        losses = jnp.where(
            delta < self.omega1,
            delta,
            self.omega2 * jnp.log(1.0 + delta / self.epsilon) + self.B,
        )
        return losses.mean(axis=-1).mean(axis=-1).sum()

    def __call__(self, output, target, target_weight=None):
        if self.use_target_weight:
            assert target_weight is not None
            output, target = _apply_weight_product(output, target, target_weight)
        return self._criterion(output, target) * self.loss_weight




def _safe_norm(x, axis=-1):
    """L2 norm with a zero (not NaN) gradient at exactly-zero vectors.

    ``jnp.linalg.norm`` differentiates to ``x / ||x||`` — NaN when a joint
    difference is exactly zero, which happens whenever a target weight is 0
    (the reference's torch.norm has the same pole but never sees it because
    weights multiply the *summed* loss there).
    """
    sq = jnp.sum(x * x, axis=axis)
    positive = sq > 0
    return jnp.sqrt(jnp.where(positive, sq, 1.0)) * positive


@MODELS.register_module()
class MPJPELoss:
    """Mean per-joint position error (3D pipelines)."""

    def __init__(self, use_target_weight: bool = False, loss_weight: float = 1.0):
        self.use_target_weight = use_target_weight
        self.loss_weight = loss_weight

    def __call__(self, output, target, target_weight=None):
        if self.use_target_weight:
            assert target_weight is not None
            w = target_weight
            while w.ndim < output.ndim:
                w = w[..., None]
            loss = jnp.mean(_safe_norm((output - target) * w))
        else:
            loss = jnp.mean(_safe_norm(output - target))
        return loss * self.loss_weight


@MODELS.register_module()
class MPJPEVelocityJointLoss:
    """MPJPE + scale-normalized MPJPE + 3D velocity loss (MotionBERT;
    reference ``regression_loss.py:390-442``). Inputs are sequences
    (..., T, K, D); velocity differentiates along the T axis."""

    def __init__(
        self,
        use_target_weight: bool = False,
        loss_weight: float = 1.0,
        lambda_scale: float = 0.5,
        lambda_3d_velocity: float = 20.0,
    ):
        self.use_target_weight = use_target_weight
        self.loss_weight = loss_weight
        self.lambda_scale = lambda_scale
        self.lambda_3d_velocity = lambda_3d_velocity

    def __call__(self, output, target, target_weight=None):
        norm_output = jnp.mean(jnp.sum(output**2, axis=-1, keepdims=True), axis=-2, keepdims=True)
        norm_target = jnp.mean(jnp.sum(target * output, axis=-1, keepdims=True), axis=-2, keepdims=True)
        scaled = norm_target / jnp.clip(norm_output, 1e-8) * output

        vel_out = output[..., 1:, :, :] - output[..., :-1, :, :]
        vel_tgt = target[..., 1:, :, :] - target[..., :-1, :, :]

        if self.use_target_weight:
            assert target_weight is not None
            w = target_weight
            while w.ndim < output.ndim:
                w = w[..., None]
            mpjpe = jnp.mean(_safe_norm((output - target) * w))
            nmpjpe = jnp.mean(_safe_norm((scaled - target) * w))
            w_vel = w[..., 1:, :, :] if w.shape[-3] == output.shape[-3] else w
            vel = jnp.mean(_safe_norm((vel_out - vel_tgt) * w_vel))
        else:
            mpjpe = jnp.mean(_safe_norm(output - target))
            nmpjpe = jnp.mean(_safe_norm(scaled - target))
            vel = jnp.mean(_safe_norm(vel_out - vel_tgt))
        return (mpjpe + nmpjpe * self.lambda_scale + vel * self.lambda_3d_velocity) * self.loss_weight


@MODELS.register_module()
class SoftWeightSmoothL1Loss:
    """Smooth-L1 multiplied (not gated) by a soft weight (reference :183)."""

    def __init__(
        self,
        use_target_weight: bool = False,
        supervise_empty: bool = True,
        beta: float = 1.0,
        loss_weight: float = 1.0,
    ):
        self.use_target_weight = use_target_weight
        self.supervise_empty = supervise_empty
        self.beta = beta
        self.loss_weight = loss_weight

    def __call__(self, output, target, target_weight=None):
        loss = _smooth_l1(output, target, beta=self.beta)
        if self.use_target_weight:
            assert target_weight is not None
            w = target_weight
            while w.ndim < loss.ndim:
                w = w[..., None]
            loss = loss * w
            if not self.supervise_empty:
                denom = jnp.maximum((w > 0).sum() * (loss.size / max(w.size, 1)), 1.0)
                return loss.sum() / denom * self.loss_weight
        return loss.mean() * self.loss_weight


@MODELS.register_module()
class RLELoss:
    """Residual log-likelihood estimation loss (RLE, ICCV 2021).

    Matches the reference ``losses/regression_loss.py:RLELoss.forward``:
    ``sigma`` is the RAW head output (sigmoid is applied here), the RealNVP
    flow density of the normalized residual enters as
    ``nf_loss = log(sigma) - log_phi`` and the residual form adds the
    Laplace/Gaussian Q term. The flow lives in ``RLEHead`` (so its params
    train jointly); ``log_phi_fn`` evaluates it on the residuals computed
    here, keeping loss and flow inputs bit-identical.
    """

    def __init__(
        self,
        use_target_weight: bool = False,
        size_average: bool = True,
        residual: bool = True,
        q_distribution: str = "laplace",
        loss_weight: float = 1.0,
    ):
        assert q_distribution in ("laplace", "gaussian")
        self.use_target_weight = use_target_weight
        self.size_average = size_average
        self.residual = residual
        self.q_distribution = q_distribution
        self.loss_weight = loss_weight

    def __call__(self, pred, sigma, target, target_weight=None, log_phi_fn=None):
        assert log_phi_fn is not None, "RLE needs the flow log-likelihood (head.log_phi)"
        sigma = jax.nn.sigmoid(sigma)
        error = (pred - target) / (sigma + 1e-9)  # (B, K, 2)
        log_phi = log_phi_fn(error)  # (B, K)
        nf_loss = jnp.log(sigma) - log_phi[..., None]

        if self.residual:
            if self.q_distribution == "laplace":
                loss_q = jnp.log(sigma * 2) + jnp.abs(error)
            else:
                loss_q = jnp.log(sigma * jnp.sqrt(2 * jnp.pi)) + 0.5 * error**2
            loss = nf_loss + loss_q
        else:
            loss = nf_loss

        if self.use_target_weight and target_weight is not None:
            w = target_weight
            while w.ndim < loss.ndim:
                w = w[..., None]
            loss = loss * w
        if self.size_average:
            loss = loss / pred.shape[0]
        return loss.sum() * self.loss_weight


@MODELS.register_module()
class OKSLoss:
    """OKS similarity loss (YOLO-Pose; reference ``regression_loss.py:688-790``).

    ``oks = sum_k w_k exp(-(d_k / sqrt(area) / (2 sigma_k))^2 / 2)``; loss is
    ``1-oks`` / ``1-oks^2`` / ``-log(oks)``. ``target_weight`` defaults to a
    uniform 1/K normalization unless ``norm_target_weight`` renormalizes by
    the visible count.
    """

    def __init__(
        self,
        metainfo=None,
        reduction: str = "mean",
        mode: str = "linear",
        eps: float = 1e-8,
        norm_target_weight: bool = False,
        loss_weight: float = 1.0,
    ):
        assert reduction in ("mean", "sum", "none")
        assert mode in ("linear", "square", "log")
        self.reduction = reduction
        self.mode = mode
        self.eps = eps
        self.norm_target_weight = norm_target_weight
        self.loss_weight = loss_weight
        self.sigmas = None
        if metainfo is not None:
            from probpose_code_tpu.datasets.metainfo import get_metainfo

            name = str(metainfo).split("/")[-1].replace(".py", "")
            try:
                info = get_metainfo(name)
                if info.get("sigmas") is not None:
                    self.sigmas = np.asarray(info["sigmas"], dtype=np.float32)
            except Exception:
                pass

    def __call__(self, output, target, target_weight=None, areas=None):
        dist = jnp.linalg.norm(output - target, axis=-1)
        if areas is not None:
            dist = dist / jnp.clip(jnp.sqrt(areas), self.eps, None)[..., None]
        if self.sigmas is not None:
            sigmas = jnp.asarray(self.sigmas).reshape(*((1,) * (dist.ndim - 1)), -1)
            dist = dist / (sigmas * 2)
        oks = jnp.exp(-(dist**2) / 2)
        if target_weight is not None:
            if self.norm_target_weight:
                target_weight = target_weight / jnp.clip(
                    target_weight.sum(axis=-1, keepdims=True), self.eps, None
                )
            else:
                target_weight = target_weight / target_weight.shape[-1]
            oks = oks * target_weight
        oks = oks.sum(axis=-1)
        if self.mode == "linear":
            loss = 1 - oks
        elif self.mode == "square":
            loss = 1 - oks**2
        else:
            loss = -jnp.log(jnp.clip(oks, self.eps, None))
        if self.reduction == "sum":
            loss = loss.sum()
        elif self.reduction == "mean":
            loss = loss.mean()
        return loss * self.loss_weight


@MODELS.register_module()
class BoneLoss:
    """Bone-length consistency loss (reference ``regression_loss.py:553-603``):
    L1 between the batch-mean bone lengths of output and target, where bones
    are the (joint, parent) edges for every non-root joint."""

    def __init__(self, joint_parents, use_target_weight: bool = False, loss_weight: float = 1.0):
        self.joint_parents = list(joint_parents)
        self.use_target_weight = use_target_weight
        self.loss_weight = loss_weight
        self.non_root_indices = [i for i, p in enumerate(self.joint_parents) if i != p]

    def _bones(self, x):
        parents = jnp.asarray(self.joint_parents)
        lengths = _safe_norm(x - x[:, parents, :])
        return lengths[:, jnp.asarray(self.non_root_indices)]

    def __call__(self, output, target, target_weight=None):
        ob, tb = self._bones(output), self._bones(target)
        if self.use_target_weight:
            assert target_weight is not None
            loss = jnp.mean(jnp.abs((ob * target_weight).mean(0) - (tb * target_weight).mean(0)))
        else:
            loss = jnp.mean(jnp.abs(ob.mean(0) - tb.mean(0)))
        return loss * self.loss_weight


@MODELS.register_module()
class SemiSupervisionLoss:
    """Semi-supervised lifting loss (reference ``regression_loss.py:606-685``;
    Pavllo et al. CVPR'19): projection loss of (unlabeled pose + trajectory)
    re-projected through the camera intrinsics, plus bone-length consistency
    between unlabeled and labeled poses. The warmup gate is expressed with
    ``jnp.where`` on an iteration counter carried by the caller so the loss
    stays jittable (the reference mutates ``self.num_iterations`` host-side).
    """

    def __init__(self, joint_parents, projection_loss_weight: float = 1.0,
                 bone_loss_weight: float = 1.0, warmup_iterations: int = 0):
        self.criterion_projection = MPJPELoss(loss_weight=projection_loss_weight)
        self.criterion_bone = BoneLoss(joint_parents, loss_weight=bone_loss_weight)
        self.warmup_iterations = warmup_iterations

    @staticmethod
    def project_joints(x, intrinsics):
        """Pinhole (+ optional radial/tangential distortion) projection.

        Args:
            x: (N, K, 3) 3D joints.
            intrinsics: (N, 4) ``[f, c]`` or (N, 9) ``[f(2), c(2), k(3), p(2)]``.
        """
        intrinsics = jnp.asarray(intrinsics)
        while intrinsics.ndim < x.ndim:
            intrinsics = intrinsics[:, None]
        f = intrinsics[..., :2]
        c = intrinsics[..., 2:4]
        _x = jnp.clip(x[..., :2] / x[..., 2:], -1, 1)
        if intrinsics.shape[-1] == 9:
            k = intrinsics[..., 4:7]
            p = intrinsics[..., 7:9]
            r2 = jnp.sum(_x**2, axis=-1, keepdims=True)
            radial = 1 + jnp.sum(k * jnp.concatenate((r2, r2**2, r2**3), axis=-1), axis=-1, keepdims=True)
            tan = jnp.sum(p * _x, axis=-1, keepdims=True)
            _x = _x * (radial + tan) + p * r2
        return f * _x + c

    def __call__(self, output: dict, target: dict, num_iterations=None):
        losses = {}
        unlabeled_output = output["unlabeled_pose"] + output["unlabeled_traj"]
        proj_2d = self.project_joints(unlabeled_output, target["intrinsics"])
        loss_proj = self.criterion_projection(proj_2d, target["unlabeled_target_2d"], None)
        loss_bone = self.criterion_bone(output["unlabeled_pose"], output["labeled_pose"], None)
        if num_iterations is not None:
            gate = (jnp.asarray(num_iterations) > self.warmup_iterations).astype(loss_proj.dtype)
            loss_proj, loss_bone = loss_proj * gate, loss_bone * gate
        losses["proj_loss"] = loss_proj
        losses["bone_loss"] = loss_bone
        return losses
