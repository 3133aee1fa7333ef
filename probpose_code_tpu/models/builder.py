"""Model construction from config dicts + the PoseModel runtime wrapper.

``build_pose_estimator(cfg)`` turns a reference-style model config
(type/backbone/head/neck/data_preprocessor dicts) into a flax module tree.
``PoseModel`` owns the module + variables and exposes the two device
programs: ``predict`` (preprocess -> forward [-> flipped forward] -> decode)
and the loss function assembled per head type — both pure and jittable.

Counterpart of the reference's registry-built ``TopdownPoseEstimator`` plus
mmengine's module wrappers; the reference resolves decoding host-side per
sample (``base_head.py:decode:33``), here decode is part of the jitted
program (see SURVEY §7 architecture stance).
"""

from __future__ import annotations

import copy
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from probpose_code_tpu.registry import KEYPOINT_CODECS, MODELS

from .pose_estimators.topdown import (
    TopdownPoseEstimator,
    double_probmap_head_loss,
    double_probmap_head_predict,
    heatmap_head_loss,
    preprocess_inputs,
    probmap_head_loss,
    probmap_head_predict,
    regression_head_loss,
    simcc_head_loss,
)


def build_pose_estimator(cfg: Dict[str, Any]):
    """Build the flax module tree from a model config dict.

    Returns (module, aux) where aux carries data_preprocessor/test_cfg/head
    configs needed by the runtime programs.
    """
    cfg = copy.deepcopy(dict(cfg))
    model_type = cfg.pop("type", "TopdownPoseEstimator")
    data_preprocessor = cfg.pop("data_preprocessor", None) or {}
    test_cfg = cfg.pop("test_cfg", None) or {}
    train_cfg = cfg.pop("train_cfg", None) or {}

    backbone_cfg = cfg.pop("backbone")
    head_cfg = cfg.pop("head", None)
    neck_cfg = cfg.pop("neck", None)

    backbone = MODELS.build(_resolve_dtype(_adapt_backbone_cfg(backbone_cfg)))
    head_module_cfg = dict(head_cfg) if head_cfg else None
    if head_module_cfg and head_module_cfg.get("type") in ("YOLOXPoseHead", "RTMOHead"):
        # assigner/prior/losses configure the runtime loss program, not the
        # flax module tree
        for key in list(head_module_cfg):
            if key.startswith("loss_") or key in (
                "assigner", "prior_generator", "overlaps_power", "use_aux_loss",
                "proxy_target_cc", "decoder",
            ):
                head_module_cfg.pop(key)
    head = MODELS.build(_resolve_dtype(head_module_cfg)) if head_cfg else None
    neck = MODELS.build(_resolve_dtype(dict(neck_cfg))) if neck_cfg else None

    # PoseLifter extras: trajectory branch + semi-supervised loss (reference
    # ``pose_lifter.py:40-70`` traj_backbone/traj_head/semi_loss args)
    traj_backbone_cfg = cfg.pop("traj_backbone", None)
    traj_head_cfg = cfg.pop("traj_head", None)
    semi_loss_cfg = cfg.pop("semi_loss", None)
    extra_modules = {}
    if traj_backbone_cfg:
        extra_modules["traj_backbone"] = MODELS.build(_resolve_dtype(dict(traj_backbone_cfg)))
    if traj_head_cfg:
        extra_modules["traj_head"] = MODELS.build(_resolve_dtype(dict(traj_head_cfg)))

    if isinstance(model_type, str):
        estimator_cls = MODELS.get(model_type)
        if estimator_cls is None:
            raise KeyError(f"unknown pose estimator type {model_type}")
    else:
        estimator_cls = model_type
    module = estimator_cls(backbone=backbone, head=head, neck=neck, **extra_modules)

    aux = dict(
        data_preprocessor=data_preprocessor,
        test_cfg=test_cfg,
        train_cfg=train_cfg,
        head_cfg=dict(head_cfg) if head_cfg else {},
        backbone_cfg=dict(backbone_cfg),
    )
    if semi_loss_cfg:
        aux["semi_loss_cfg"] = dict(semi_loss_cfg)
    if traj_head_cfg:
        aux["traj_head_cfg"] = dict(traj_head_cfg)
    return module, aux


_DTYPE_MAP = {"float32": jnp.float32, "bfloat16": jnp.bfloat16, "float16": jnp.float16}


def _resolve_dtype(cfg: Dict[str, Any]) -> Dict[str, Any]:
    if isinstance(cfg.get("dtype"), str):
        cfg["dtype"] = _DTYPE_MAP[cfg["dtype"]]
    return cfg


def _adapt_backbone_cfg(cfg: Dict[str, Any]) -> Dict[str, Any]:
    """Map reference-style backbone configs onto our modules.

    Accepts ``type='mmpretrain.VisionTransformer'`` (the ProbPose config
    spelling) and its kwargs (patch_cfg.padding, with_cls_token, out_type...).
    """
    cfg = copy.deepcopy(dict(cfg))
    t = cfg.get("type", "")
    if t in ("mmpretrain.VisionTransformer", "VisionTransformer"):
        cfg["type"] = "VisionTransformer"
        patch_cfg = cfg.pop("patch_cfg", None)
        if patch_cfg and "padding" in patch_cfg:
            cfg["patch_padding"] = patch_cfg["padding"]
    # torch-checkpoint init specs don't apply to flax modules: weights load
    # through engine.checkpoint's converter instead (reference init_cfg
    # Pretrained semantics); frozen_stages is an optimizer-side concern here
    cfg.pop("init_cfg", None)
    cfg.pop("frozen_stages", None)
    return cfg


def build_loss_modules(head_cfg: Dict[str, Any]) -> Dict[str, Any]:
    """Resolve the head's loss config dicts into callables."""
    defaults = dict(
        keypoint_loss=dict(type="KeypointMSELoss", use_target_weight=True),
        probability_loss=dict(type="BCELoss", use_target_weight=True),
        visibility_loss=dict(type="BCELoss", use_target_weight=True),
        oks_loss=dict(type="MSELoss", use_target_weight=True),
        error_loss=dict(type="L1LogLoss", use_target_weight=True),
    )
    out = {}
    for key, default in defaults.items():
        loss_cfg = head_cfg.get(key, default) or default
        out[key.replace("_loss", "")] = MODELS.build(loss_cfg)
    # single-loss heads (HeatmapHead, SimCCHead, RTMCCHead) use the 'loss' key
    if "loss" in head_cfg and head_cfg["loss"]:
        out["keypoint"] = MODELS.build(head_cfg["loss"])
    if head_cfg.get("type") == "VisPredictHead":
        # the wrapper's 'loss' supervises VISIBILITY; the pose loss comes
        # from the wrapped head (reference hybrid_heads/vis_head.py)
        out["vis"] = out.pop("keypoint", None) or MODELS.build(
            dict(type="BCELoss", use_target_weight=False))
        inner = dict(head_cfg.get("pose_cfg", {}))
        out["keypoint"] = MODELS.build(inner["loss"]) if inner.get("loss") else MODELS.build(
            dict(type="KeypointMSELoss", use_target_weight=True))
    # bottomup heads: DEKR (heatmap + displacement), AE (keypoint + tag),
    # CID (coupled/decoupled focal + contrastive InfoNCE)
    for key, short in (
        ("heatmap_loss", "heatmap"),
        ("displacement_loss", "displacement"),
        ("tag_loss", "tag"),
        ("coupled_heatmap_loss", "coupled"),
        ("decoupled_heatmap_loss", "decoupled"),
        ("contrastive_loss", "contrastive"),
    ):
        if head_cfg.get(key):
            out[short] = MODELS.build(head_cfg[key])
    return out


class PoseModel:
    """Runtime handle: flax module + variables + jitted programs.

    This is the TPU-shaped equivalent of the reference's built
    ``TopdownPoseEstimator``: ``predict()`` runs the whole
    normalize->forward->TTA->decode pipeline as one device program.
    """

    def __init__(self, cfg: Dict[str, Any], metainfo: Optional[dict] = None, seed: int = 0):
        self.cfg = copy.deepcopy(dict(cfg))
        self.module, self.aux = build_pose_estimator(cfg)
        self.metainfo = metainfo
        self.loss_modules = build_loss_modules(self.aux["head_cfg"])
        head_cfg = self.aux["head_cfg"]
        self.head_type = head_cfg.get("type", "HeatmapHead")
        if self.head_type == "EDPoseHead":
            # the reference-schema EDPose head carries a transformer
            # 'decoder' cfg; its codec lives under 'data_decoder'
            self.decoder_cfg = head_cfg.get("data_decoder")
        elif self.head_type == "VisPredictHead":
            # the wrapper's codec lives on the wrapped pose head
            self.decoder_cfg = dict(head_cfg.get("pose_cfg", {})).get("decoder")
        else:
            self.decoder_cfg = head_cfg.get("decoder")
        self.decoder = KEYPOINT_CODECS.build(self.decoder_cfg) if self.decoder_cfg else None
        if self.decoder_cfg and "input_size" in self.decoder_cfg:
            self.input_size = tuple(self.decoder_cfg["input_size"])
        elif "input_size" in self.aux["test_cfg"]:
            self.input_size = tuple(self.aux["test_cfg"]["input_size"])
        else:
            self.input_size = (192, 256)
        self.onestage = self.head_type in ("YOLOXPoseHead", "RTMOHead")
        self.is_lifter = self.cfg.get("type") == "PoseLifter"
        self.variables = None
        self._predict_fn = None
        self._seed = seed

    # -- initialization --------------------------------------------------

    def init(self, input_shape: Optional[Tuple[int, ...]] = None, seed: Optional[int] = None):
        if input_shape is None:
            if self.is_lifter:
                bb = self.aux["backbone_cfg"]
                if bb.get("type") == "DSTFormer":
                    input_shape = (1, 9, bb.get("num_joints", 17), bb.get("in_channels", 3))
                else:  # TCN-style (B, K*2, T) — channels-first sequences
                    input_shape = (1, bb.get("in_channels", 34), 27)
            else:
                w, h = self.input_size
                input_shape = (1, h, w, 3)
        rng = jax.random.PRNGKey(self._seed if seed is None else seed)
        dummy = jnp.zeros(input_shape, jnp.float32)
        if self.head_type == "RTMOHead":
            # the DCC only runs on assigned positives, so __call__ never
            # touches it — drive it once at init so its params exist
            def init_fn(module, x):
                out = module(x, train=False)
                pf = out["pose_vecs"][:, :2]
                cs = jnp.ones((x.shape[0], 2, 4), jnp.float32)
                gr = jnp.zeros((x.shape[0], 2, 2), jnp.float32)
                module.head.dcc(pf, cs, gr, mask=None, train=False)
                return out

            self.variables = self.module.init({"params": rng, "dropout": rng}, dummy, method=init_fn)
        elif self.head_type == "RLEHead":
            # the flow only runs inside the loss (head.log_phi) — drive it
            # once at init so its params exist in the variable tree
            def init_fn(module, x):
                out = module(x, train=False)
                module.head.log_phi(jnp.zeros((1, out.shape[1], 2), jnp.float32))
                return out

            self.variables = self.module.init({"params": rng, "dropout": rng}, dummy, method=init_fn)
        elif self.head_type == "CIDHead":
            # the GFD only runs per detected instance — drive it once at
            # init so its params exist in the variable tree
            def init_fn(module, x):
                out = module(x, train=False)
                coords = jnp.zeros((x.shape[0], 2), jnp.int32)
                module.head.forward_instances(out["feats"], coords, jnp.arange(x.shape[0]))
                return out

            self.variables = self.module.init({"params": rng, "dropout": rng}, dummy, method=init_fn)
        else:
            self.variables = self.module.init({"params": rng, "dropout": rng}, dummy, train=False)
        return self.variables

    @property
    def params(self):
        return self.variables["params"]

    def num_params(self) -> int:
        return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(self.params))

    # -- programs --------------------------------------------------------

    def preprocess(self, images: jnp.ndarray) -> jnp.ndarray:
        if self.is_lifter:
            # lifter inputs are keypoint sequences, not images
            return jnp.asarray(images, jnp.float32)
        dp = self.aux["data_preprocessor"]
        if dp.get("type"):  # registered preprocessor (e.g. PoseDataPreprocessor)
            proc = self.aux.get("_dp_obj")
            if proc is None:
                proc = self.aux["_dp_obj"] = MODELS.build(dict(dp))
            return proc(images)
        return preprocess_inputs(
            images,
            mean=dp.get("mean", (0.0, 0.0, 0.0)),
            std=dp.get("std", (1.0, 1.0, 1.0)),
            bgr_to_rgb=dp.get("bgr_to_rgb", False),
        )

    def forward(self, variables, images, train: bool = False, rngs=None, mutable=False):
        """tensor-mode forward (preprocess + backbone + head)."""
        x = self.preprocess(images)
        return self.module.apply(variables, x, train=train, rngs=rngs, mutable=mutable)

    def _onestage_static_cfg(self):
        head_cfg = self.aux["head_cfg"]
        assigner_cfg = dict(head_cfg.get("assigner") or {})
        assigner_cfg.pop("type", None)
        oks_cal = assigner_cfg.pop("oks_calculator", None)
        assigner_cfg.pop("iou_calculator", None)
        from probpose_code_tpu.models.task_modules import PoseOKS

        oks_sigmas = PoseOKS(**({k: v for k, v in dict(oks_cal or {}).items() if k != "type"})).sigmas
        loss_oks_cfg = dict(head_cfg.get("loss_oks") or {"type": "OKSLoss"})
        loss_oks_cfg["reduction"] = "none"
        loss_oks = MODELS.build(loss_oks_cfg)
        return assigner_cfg, oks_sigmas, loss_oks

    def _onestage_loss(self, variables, batch, rngs=None):
        head_cfg = self.aux["head_cfg"]
        assigner_cfg, oks_sigmas, loss_oks = self._onestage_static_cfg()
        x = self.preprocess(batch["inputs"])
        head_type = self.head_type

        def _w(key, default=1.0):
            return float((head_cfg.get(key) or {}).get("loss_weight", default))

        if head_type == "RTMOHead":
            from probpose_code_tpu.models.heads.rtmo_head import rtmo_loss

            loss_cls_cfg = dict(head_cfg.get("loss_cls") or {"type": "VariFocalLoss"})
            loss_cls_cfg.setdefault("reduction", "sum")
            loss_cls = MODELS.build(loss_cls_cfg)
            mode_cfg = self.aux["train_cfg"]

            def fn(module, x, batch):
                outputs = module(x, train=True)
                return rtmo_loss(
                    outputs, batch,
                    dcc_apply=lambda pf, cs, gr, m, tr: module.head.dcc(pf, cs, gr, mask=m, train=tr),
                    dcc_target_heatmap=lambda kt, cs, gr, sg, ar: module.head.dcc.generate_target_heatmap(
                        kt, cs, gr, sg, ar
                    ),
                    assigner_cfg=assigner_cfg,
                    oks_sigmas=oks_sigmas,
                    loss_oks=loss_oks,
                    loss_mle_weight=_w("loss_mle"),
                    loss_cls=loss_cls,
                    loss_bbox_weight=_w("loss_bbox", 5.0),
                    loss_vis_weight=_w("loss_vis"),
                    overlaps_power=float(head_cfg.get("overlaps_power", 1.0)),
                    bbox_padding=float(head_cfg.get("bbox_padding", 1.25)),
                    proxy_target_cc=bool(mode_cfg.get("proxy_target_cc", head_cfg.get("proxy_target_cc", False))),
                )
        else:
            from probpose_code_tpu.models.heads.yoloxpose_head import yolox_pose_loss

            def fn(module, x, batch):
                outputs = module(x, train=True)
                return yolox_pose_loss(
                    outputs, batch, outputs["priors"],
                    assigner_cfg=assigner_cfg,
                    oks_sigmas=oks_sigmas,
                    loss_oks=loss_oks,
                    num_classes=int(head_cfg.get("num_classes", 1)),
                    overlaps_power=float(head_cfg.get("overlaps_power", 1.0)),
                    loss_cls_weight=_w("loss_cls"),
                    loss_obj_weight=_w("loss_obj"),
                    loss_bbox_weight=_w("loss_bbox", 5.0),
                    loss_vis_weight=_w("loss_vis"),
                )

        losses, new_state = self.module.apply(
            variables, x, batch, method=fn, rngs=rngs, mutable=["batch_stats"]
        )
        total = sum(v for k, v in losses.items() if k.startswith("loss_"))
        return total, (losses, new_state)

    def device_preprocess_batch(self, batch: Dict[str, Any]) -> Dict[str, Any]:
        """Device half of the input pipeline (fused into the jitted step).

        When the host pipeline ran with ``TopdownAffine(device_warp=True)``
        [+ ``GenerateTarget(device=True)``], the batch carries uint8
        ``canvas`` images, ``warp_mat`` affines and heatmap-space keypoints
        instead of pre-warped crops / pre-rendered target maps; this method
        performs the warp (ops.warp) and the target encode (ops.encode) on
        device, replacing the reference's cv2.warpAffine + NumPy
        ``generate_probmaps`` host hot loops (SURVEY §3.1).
        """
        if not ({"canvas", "canvas_sep", "kpts_hm"} & set(batch)):
            return batch
        from probpose_code_tpu.ops.encode import (
            generate_probmaps_device,
            generate_udp_gaussian_device,
            probmap_encode_scales,
        )
        from probpose_code_tpu.ops.warp import warp_affine_batch, warp_affine_separable

        batch = dict(batch)
        if "canvas_sep" in batch:  # rotation-free: MXU matmul warp
            canvas = batch.pop("canvas_sep")
            mats = batch.pop("warp_mat_sep")
            batch["inputs"] = warp_affine_separable(canvas.astype(jnp.float32), mats, self.input_size)
        elif "canvas" in batch:
            canvas = batch.pop("canvas")
            mats = batch.pop("warp_mat")
            batch["inputs"] = warp_affine_batch(canvas.astype(jnp.float32), mats, self.input_size)
        if "kpts_hm" in batch and "heatmaps" not in batch:
            kpts = batch.pop("kpts_hm")
            vis = batch.pop("kpts_visible")
            dc = self.decoder_cfg or {}
            hm_size = tuple(dc.get("heatmap_size", (48, 64)))
            if dc.get("type") == "UDPHeatmap":
                batch["heatmaps"] = generate_udp_gaussian_device(
                    kpts, vis, hm_size, float(dc.get("sigma", 2.0))
                )
            else:  # ProbMap family
                scales = probmap_encode_scales(kpts.shape[1], hm_size, float(dc.get("sigma", -1.0)))
                batch["heatmaps"] = generate_probmaps_device(kpts, vis, hm_size, scales)
        return batch

    def loss_fn(self, variables, batch, rngs=None):
        """Returns (total_loss, (loss_dict, new_mutable_state))."""
        if self.head_type == "EDPoseHead":
            raise NotImplementedError(
                "EDPose training is not supported (parity with reference "
                "edpose_head.py:1215-1219); use the trainable EDPoseTPUHead "
                "config variant instead."
            )
        if self.onestage:
            return self._onestage_loss(variables, batch, rngs=rngs)
        batch = self.device_preprocess_batch(batch)
        x = self.preprocess(batch["inputs"])
        if self.head_type == "CIDHead":
            # the per-instance GFD pass needs module methods, so the loss
            # computes inside one method-apply (reference cid_head.py:566-660)
            from .heads.cid_head import cid_head_loss

            class _DefaultContrastive:
                temp, loss_weight = 0.05, 1.0

            losses_cfg = dict(
                coupled=self.loss_modules.get("coupled") or self.loss_modules["keypoint"],
                decoupled=self.loss_modules.get("decoupled") or self.loss_modules["keypoint"],
                contrastive=self.loss_modules.get("contrastive") or _DefaultContrastive(),
            )

            def fn(module, x):
                outputs = module(x, train=True)
                return cid_head_loss(
                    outputs, batch,
                    lambda f, c, i: module.head.forward_instances(f, c, i),
                    losses_cfg,
                )

            losses, new_state = self.module.apply(
                variables, x, method=fn, rngs=rngs, mutable=["batch_stats"]
            )
            total = sum(v for k, v in losses.items() if k.startswith("loss"))
            return total, (losses, new_state)
        if self.head_type == "EDPoseTPUHead" and rngs and "gt_bboxes" in batch:
            # DETR-style denoising training (reference EDPose DN groups,
            # edpose_head.py DN setup): noised GT boxes enter as an extra
            # query group with known correspondence — needs a method-apply
            # to thread dn_boxes past the estimator's __call__
            from .heads.edpose_head import edpose_loss, make_dn_queries

            dn_rng = jax.random.fold_in(next(iter(rngs.values())), 131)
            # cap the DN group at 20 slots: GT is padded to max_gt=50 but
            # the keypoint-group decoder cost grows with (Q+D)*K tokens, and
            # slots beyond the typical instance count are inert center boxes
            dn_cap = 20
            dnb, dnv = make_dn_queries(
                batch["gt_bboxes"][:, :dn_cap],
                batch["gt_valid"][:, :dn_cap].astype(jnp.float32),
                tuple(self.input_size), dn_rng,
            )

            def fn(module, x):
                feats = module.extract_feat(x, train=True)
                return module.head(feats, train=True, dn_boxes=dnb, dn_valid=dnv)

            outputs, new_state = self.module.apply(
                variables, x, method=fn, rngs=rngs, mutable=["batch_stats"]
            )
            losses = edpose_loss(outputs, batch, input_size=tuple(self.input_size))
            total = sum(v for k, v in losses.items() if k.startswith("loss"))
            return total, (losses, new_state)
        outputs, new_state = self.module.apply(
            variables, x, train=True, rngs=rngs, mutable=["batch_stats"]
        )
        if self.head_type == "ProbMapHead":
            losses = probmap_head_loss(
                outputs, batch, self.loss_modules, self.aux["head_cfg"], input_size=self.input_size
            )
        elif self.head_type == "DoubleProbMapHead":
            losses = double_probmap_head_loss(
                outputs, batch, self.loss_modules, self.aux["head_cfg"], input_size=self.input_size
            )
        elif self.head_type in ("SimCCHead", "RTMCCHead", "RTMWHead"):
            losses = simcc_head_loss(outputs, batch, self.loss_modules["keypoint"])
        elif self.head_type in ("RegressionHead", "RLEHead", "IntegralRegressionHead", "DSNTHead"):
            losses = regression_head_loss(
                outputs, batch, self.loss_modules["keypoint"], self.head_type, self.module, variables
            )
        elif self.head_type == "CPMHead":
            from .heads.multistage_heads import cpm_head_loss

            losses = cpm_head_loss(outputs, batch, self.loss_modules["keypoint"])
        elif self.head_type == "MSPNHead":
            from .heads.multistage_heads import mspn_head_loss

            losses = mspn_head_loss(
                outputs, batch, self.loss_modules["keypoint"],
                list(self.aux["head_cfg"].get("level_indices", [])),
            )
        elif self.head_type == "InternetHead":
            from .pose_estimators.topdown import internet_head_loss

            losses = internet_head_loss(outputs, batch)
        elif self.head_type == "DEKRHead":
            from .pose_estimators.bottomup import dekr_head_loss

            losses = dekr_head_loss(
                outputs, batch,
                self.loss_modules.get("heatmap") or self.loss_modules["keypoint"],
                self.loss_modules.get("displacement"),
            )
        elif self.head_type == "AssociativeEmbeddingHead":
            from .pose_estimators.bottomup import ae_head_loss

            losses = ae_head_loss(
                outputs, batch, self.loss_modules["keypoint"], self.loss_modules.get("tag")
            )
        elif self.head_type == "EDPoseTPUHead":
            from .heads.edpose_head import edpose_loss

            losses = edpose_loss(outputs, batch, input_size=tuple(self.input_size))
        elif self.head_type == "VisPredictHead":
            # wrapped-head loss + visibility BCE; reference
            # hybrid_heads/vis_head.py:195-210: the visibility TARGET is
            # keypoint_weights, weighted by keypoints_visible_weights (ones
            # when absent) iff the loss uses target weights
            pose_out, vis = outputs
            losses = heatmap_head_loss(pose_out, batch, self.loss_modules["keypoint"])
            vis_target = batch.get("keypoint_weights", batch.get("annotated"))
            if vis_target is not None:
                vis_mod = self.loss_modules["vis"]
                if getattr(vis_mod, "use_target_weight", False):
                    w = batch.get("keypoints_visible_weights")
                    w = jnp.ones_like(vis_target) if w is None else w
                    losses["loss_vis"] = vis_mod(vis, vis_target, w)
                else:
                    losses["loss_vis"] = vis_mod(vis, vis_target)
        elif self.head_type in ("TemporalRegressionHead", "TrajectoryRegressionHead", "MotionRegressionHead"):
            # PoseLifter training (reference ``pose_lifter.py:loss`` ->
            # temporal_regression_head.loss: MPJPE on root-centered labels)
            pred = outputs[0] if isinstance(outputs, tuple) else outputs
            target = batch["lifting_target_label"].reshape(pred.shape)
            weight = batch.get("lifting_target_weight")
            if weight is None:
                weight = jnp.ones(pred.shape[:-1], jnp.float32)
            if self.aux["head_cfg"].get("loss"):
                loss_mod = self.loss_modules["keypoint"]
            else:  # reference default for lifting heads
                from probpose_code_tpu.models.losses.regression_loss import MPJPELoss

                loss_mod = MPJPELoss(use_target_weight=True)
            losses = {"loss_kpt": loss_mod(pred, target, weight.reshape(pred.shape[:-1]))}
            if isinstance(outputs, tuple) and len(outputs) > 1:
                # trajectory branch (reference ``pose_lifter.py`` traj_head
                # loss on the global root position, ``target_root``)
                traj_target = batch.get("trajectory_target_label", batch.get("target_root"))
                if traj_target is not None:
                    from probpose_code_tpu.models.losses.regression_loss import MPJPELoss as _MPJPE

                    traj = outputs[1]
                    losses["loss_traj"] = _MPJPE(use_target_weight=False)(
                        traj, traj_target.reshape(traj.shape)
                    )
            if self.aux.get("semi_loss_cfg") and "intrinsics" in batch:
                from probpose_code_tpu.registry import MODELS as _M

                semi = _M.build(dict(self.aux["semi_loss_cfg"]))
                semi_out = {
                    "labeled_pose": pred,
                    "unlabeled_pose": batch.get("unlabeled_pose", pred),
                    "unlabeled_traj": outputs[1] if isinstance(outputs, tuple) else jnp.zeros_like(pred[:, :1]),
                }
                semi_tgt = {
                    "unlabeled_target_2d": batch["unlabeled_target_2d"],
                    "intrinsics": batch["intrinsics"],
                }
                for k, v in semi(semi_out, semi_tgt, num_iterations=batch.get("iteration")).items():
                    losses[f"loss_{k}"] = v
            dist = jnp.linalg.norm(jax.lax.stop_gradient(pred) - target, axis=-1)
            valid = weight.reshape(pred.shape[:-1]) > 0
            losses["mpjpe"] = (dist * valid).sum() / jnp.maximum(valid.sum(), 1)
        else:
            losses = heatmap_head_loss(outputs, batch, self.loss_modules["keypoint"])
        total = sum(v for k, v in losses.items() if k.startswith("loss_"))
        return total, (losses, new_state)

    def _predict_precision(self):
        """Matmul/conv precision for the predict program.

        TPU 'default' precision feeds f32 convs through bf16 MXU passes
        (~1e-2 heatmap drift vs the f32 torch reference — enough to flip
        argmax decodes). When the model runs in f32 (parity/eval mode),
        force full precision; explicit bf16 configs keep the fast path.
        """
        bb_dtype = self.aux["backbone_cfg"].get("dtype")
        head_dtype = self.aux["head_cfg"].get("dtype")
        is_lowp = any(str(d) in ("bfloat16", "float16") for d in (bb_dtype, head_dtype) if d is not None)
        return "default" if is_lowp else "highest"

    def make_predict(self, flip_test: Optional[bool] = None, jit: bool = True):
        """Build the full predict program: images -> decoded predictions."""
        test_cfg = self.aux["test_cfg"]
        if self.head_type == "EDPoseHead":
            # DETR-family: the device program is the raw two-stage forward;
            # the EDPoseLabel top-k decode runs host-side like the reference
            # (edpose_head.py:predict -> data_decoder.decode)
            if flip_test or (flip_test is None and test_cfg.get("flip_test", False)):
                raise NotImplementedError(
                    "flip_test is not supported for EDPose (parity with "
                    "reference edpose_head.py:926); set test_cfg.flip_test=False"
                )
            precision = self._predict_precision()

            def _predict_edpose(variables, images):
                with jax.default_matmul_precision(precision):
                    x = self.preprocess(images)
                    logits, boxes, kpts = self.module.apply(variables, x, train=False)
                    return dict(
                        pred_logits=jax.nn.sigmoid(logits), pred_boxes=boxes, pred_keypoints=kpts
                    )

            return jax.jit(_predict_edpose) if jit else _predict_edpose
        if self.onestage:
            head_type = self.head_type
            nms_pre = int(test_cfg.get("nms_pre", 300))
            bbox_padding = float(self.aux["head_cfg"].get("bbox_padding", 1.25))

            def _predict_onestage(variables, images):
                x = self.preprocess(images)

                def fn(module, x):
                    outputs = module(x, train=False)
                    if head_type == "RTMOHead":
                        from probpose_code_tpu.models.heads.rtmo_head import rtmo_device_predict

                        return rtmo_device_predict(
                            outputs,
                            lambda pf, cs, gr, m, tr: module.head.dcc(pf, cs, gr, mask=m, train=tr),
                            nms_pre=nms_pre,
                            bbox_padding=bbox_padding,
                        )
                    from probpose_code_tpu.models.heads.yoloxpose_head import yolox_device_predict

                    return yolox_device_predict(outputs, nms_pre=nms_pre)

                return self.module.apply(variables, x, method=fn)

            precision = self._predict_precision()

            def _predict_onestage_p(variables, images):
                with jax.default_matmul_precision(precision):
                    return _predict_onestage(variables, images)

            return jax.jit(_predict_onestage_p) if jit else _predict_onestage_p
        flip_test = test_cfg.get("flip_test", False) if flip_test is None else flip_test
        shift_heatmap = test_cfg.get("shift_heatmap", False)
        if self.is_lifter:
            # 2D->3D lifting (reference ``pose_lifter.py:predict:223-300``):
            # decode (denormalize + root restore) runs host-side in the val
            # loop via the lifting codec. Flip-TTA mirrors the input around
            # x=0 with flip_indices and un-mirrors the 3D output (the
            # MotionBERT protocol; TCN recipes ship flip_test=False).
            fi = list(self.metainfo["flip_indices"]) if self.metainfo else None
            is_dst = self.aux["backbone_cfg"].get("type") == "DSTFormer"
            do_flip = bool(flip_test) and fi is not None and is_dst
            precision = self._predict_precision()

            def _predict_lifter(variables, inputs):
                with jax.default_matmul_precision(precision):
                    x = self.preprocess(inputs)

                    def run(z):
                        out = self.module.apply(variables, z, train=False)
                        return out if isinstance(out, tuple) else (out,)

                    outs = run(x)
                    if do_flip:
                        idx = jnp.asarray(fi)
                        xf = jnp.take(x.at[..., 0].multiply(-1.0), idx, axis=-2)  # (B, T, K, C)
                        outs_f = run(xf)

                        def unflip(o):
                            # permute the keypoint axis back, negate x
                            return jnp.take(o, idx, axis=-2).at[..., 0].multiply(-1.0)

                        outs = tuple(
                            (o + unflip(of)) * 0.5 if of.ndim >= 3 else o
                            for o, of in zip(outs, outs_f)
                        )
                    preds = dict(keypoints_3d=outs[0])
                    if len(outs) > 1:
                        preds["trajectory"] = outs[1]
                    return preds

            return jax.jit(_predict_lifter) if jit else _predict_lifter
        if self.head_type == "EDPoseTPUHead":
            # trainable DETR-family redesign: normalized two-stage outputs ->
            # input-pixel boxes/keypoints; host applies score_thr + NMS via
            # the one-stage attach tail
            input_size = tuple(self.input_size)
            precision = self._predict_precision()

            def _predict_edpose_tpu(variables, images):
                from probpose_code_tpu.models.heads.edpose_head import edpose_device_predict

                with jax.default_matmul_precision(precision):
                    x = self.preprocess(images)
                    out = self.module.apply(variables, x, train=False)
                    return edpose_device_predict(out, input_size)

            return jax.jit(_predict_edpose_tpu) if jit else _predict_edpose_tpu
        if self.head_type == "CIDHead":
            # instance-conditioned bottomup: the whole detect->GFD->decode
            # chain is one jitted program (reference cid_head.py:491-564)
            if self.metainfo:
                fi = list(self.metainfo["flip_indices"])
            else:  # identity fallback, same as the generic branch below
                nk = self.aux["head_cfg"].get("num_keypoints", 17)
                fi = list(range(nk))
            max_instances = int(test_cfg.get("max_instances", 30))
            score_threshold = float(test_cfg.get("score_threshold", 0.01))
            blur = int(test_cfg.get("blur_kernel_size", 3))
            input_size = self.input_size
            do_flip = bool(flip_test)
            precision = self._predict_precision()

            def _predict_cid(variables, images):
                from probpose_code_tpu.models.heads.cid_head import cid_device_predict

                with jax.default_matmul_precision(precision):
                    x = self.preprocess(images)
                    if do_flip:
                        x = jnp.concatenate([x, x[:, :, ::-1, :]], axis=0)

                    def fn(module, x):
                        outputs = module(x, train=False)
                        return cid_device_predict(
                            outputs,
                            lambda f, c, i: module.head.forward_instances(f, c, i),
                            flip_test=do_flip,
                            flip_indices=fi,
                            input_size=input_size,
                            max_instances=max_instances,
                            score_threshold=score_threshold,
                            blur_kernel_size=blur,
                        )

                    return self.module.apply(variables, x, method=fn)

            return jax.jit(_predict_cid) if jit else _predict_cid
        if self.metainfo:
            flip_indices = list(self.metainfo["flip_indices"])
        else:
            # no metainfo: identity permutation sized to the head's keypoint
            # count (a 17-kpt default would mis-gather e.g. 133-kpt wholebody)
            hc = self.aux["head_cfg"]
            num_kpts = hc.get("out_channels") or hc.get("num_joints") or hc.get("num_keypoints") or 17
            flip_indices = list(range(num_kpts))
        freeze_oks = self.aux["head_cfg"].get("freeze_oks", False)
        head_type = self.head_type
        input_size = self.input_size

        def _predict(variables, images):
            head_type = self.head_type  # local: VisPredictHead rebinds to its inner head
            x = self.preprocess(images)
            outputs_flipped = None
            if flip_test:
                # run original + mirrored crops as ONE double batch: a single
                # set of larger matmuls uses the MXU far better than two
                # sequential half-size forwards
                both = jnp.concatenate([x, x[:, :, ::-1, :]], axis=0)
                outs_both = self.module.apply(variables, both, train=False)
                B = x.shape[0]
                split = lambda t: (t[:B], t[B:])  # noqa: E731
                if isinstance(outs_both, dict):
                    pairs = {k: split(v) for k, v in outs_both.items()}
                    outputs = {k: v[0] for k, v in pairs.items()}
                    outputs_flipped = {k: v[1] for k, v in pairs.items()}
                elif isinstance(outs_both, (tuple, list)):
                    pairs = [split(v) for v in outs_both]
                    outputs = tuple(p[0] for p in pairs)
                    outputs_flipped = tuple(p[1] for p in pairs)
                else:
                    outputs, outputs_flipped = split(outs_both)
            else:
                outputs = self.module.apply(variables, x, train=False)
            vis_pred = None
            if head_type == "VisPredictHead":
                # unwrap (reference hybrid_heads/vis_head.py:predict): the
                # inner pose head decodes as usual; visibility averages over
                # the flip pair with the channel permutation (flip_visibility)
                inner_type = dict(self.aux["head_cfg"].get("pose_cfg", {})).get("type", "HeatmapHead")
                outputs, vis_pred = outputs
                if outputs_flipped is not None:
                    outputs_flipped, vis_f = outputs_flipped
                    vis_f = vis_f[:, jnp.asarray(flip_indices)]
                    vis_pred = (vis_pred + vis_f) * 0.5
                head_type = inner_type
            if head_type == "DEKRHead":
                from .pose_estimators.bottomup import dekr_predict_merge

                return dekr_predict_merge(
                    outputs, outputs_flipped, flip_indices, input_size, shift_heatmap
                )
            if head_type == "AssociativeEmbeddingHead":
                from .pose_estimators.bottomup import ae_predict_merge

                tag_per_kpt = bool(self.aux["head_cfg"].get("tag_per_keypoint", True))
                return ae_predict_merge(
                    outputs, outputs_flipped, flip_indices, shift_heatmap,
                    tag_per_keypoint=tag_per_kpt,
                )
            if head_type == "ProbMapHead":
                return probmap_head_predict(
                    outputs,
                    outputs_flipped,
                    flip_indices,
                    input_size=input_size,
                    shift_heatmap=shift_heatmap,
                    freeze_oks=freeze_oks,
                )
            if head_type == "DoubleProbMapHead":
                return double_probmap_head_predict(
                    outputs,
                    outputs_flipped,
                    flip_indices,
                    decoder_cfg=self.decoder_cfg or {},
                    input_size=input_size,
                    shift_heatmap=shift_heatmap,
                    freeze_oks=freeze_oks,
                )
            if head_type in ("SimCCHead", "RTMCCHead", "RTMWHead"):
                from .pose_estimators.topdown import simcc_head_predict

                ratio = (self.decoder_cfg or {}).get("simcc_split_ratio", 2.0)
                res = simcc_head_predict(outputs, outputs_flipped, flip_indices, simcc_split_ratio=ratio)
                if vis_pred is not None:
                    res["keypoints_visible"] = vis_pred
                return res
            if head_type in ("RegressionHead", "RLEHead", "IntegralRegressionHead", "DSNTHead"):
                from .pose_estimators.topdown import regression_head_predict

                res = regression_head_predict(outputs, outputs_flipped, flip_indices, input_size, head_type)
                if vis_pred is not None:
                    res["keypoints_visible"] = vis_pred
                return res
            if head_type == "InternetHead":
                # 3D hand volume decode in-jit: argmax over (D, H, W), x/y
                # scaled to input space, z kept in depth bins (reference
                # internet_head.py predict -> Hand3DHeatmap decode; the
                # shipped recipe runs flip_test=False)
                hm3d = outputs["heatmaps"]  # (B, K, D, Hh, Ww)
                B3, K3, D3, Hh3, Ww3 = hm3d.shape
                flat3 = hm3d.reshape(B3, K3, -1)
                idx3 = jnp.argmax(flat3, axis=-1)
                vals3 = jnp.take_along_axis(flat3, idx3[..., None], axis=-1)[..., 0]
                z3 = (idx3 // (Hh3 * Ww3)).astype(jnp.float32)
                y3 = ((idx3 % (Hh3 * Ww3)) // Ww3).astype(jnp.float32)
                x3 = (idx3 % Ww3).astype(jnp.float32)
                kpts3 = jnp.stack(
                    [x3 / Ww3 * input_size[0], y3 / Hh3 * input_size[1], z3], axis=-1
                )
                return dict(
                    keypoints=kpts3,
                    keypoint_scores=vals3,
                    rel_root_depth=outputs["root_depth"][..., 0],
                    hand_type=jax.nn.sigmoid(outputs["hand_type"]),
                )
            # plain heatmap head: decode per the decoder codec type
            from probpose_code_tpu.ops.decode import (
                dark_refine_batch,
                dark_udp_refine_batch,
                heatmap_expected_value_batch,
                quarter_offset_refine_batch,
            )
            from probpose_code_tpu.ops.heatmap import heatmap_maximum_batch

            heatmaps = outputs
            if head_type in ("CPMHead", "MSPNHead"):
                # decode the final stage/unit (reference cpm_head.py:224)
                heatmaps = heatmaps[-1]
                if outputs_flipped is not None:
                    outputs_flipped = outputs_flipped[-1]
            if outputs_flipped is not None:
                hm_f = flip_heatmaps_ref(outputs_flipped, flip_indices, shift_heatmap)
                heatmaps = (heatmaps + hm_f) * 0.5
            B, K, H, W = heatmaps.shape
            decoder_type = (self.decoder_cfg or {}).get("type", "UDPHeatmap")
            blur = (self.decoder_cfg or {}).get("blur_kernel_size", 11)
            if decoder_type in ("ProbMap", "UDPExpMaxHeatmap"):
                locs, vals = heatmap_expected_value_batch(heatmaps)
                scale = jnp.asarray([input_size[0] / (W - 1), input_size[1] / (H - 1)], dtype=jnp.float32)
            elif decoder_type == "MSRAHeatmap":
                locs, vals = heatmap_maximum_batch(heatmaps)
                if (self.decoder_cfg or {}).get("unbiased", False):
                    locs = dark_refine_batch(locs, heatmaps, blur)
                else:
                    locs = quarter_offset_refine_batch(locs, heatmaps)
                scale = jnp.asarray([input_size[0] / W, input_size[1] / H], dtype=jnp.float32)
            else:  # UDPHeatmap / ArgMaxProbMap
                locs, vals = heatmap_maximum_batch(heatmaps)
                locs = dark_udp_refine_batch(locs, heatmaps, blur)
                scale = jnp.asarray([input_size[0] / (W - 1), input_size[1] / (H - 1)], dtype=jnp.float32)
            res = dict(keypoints=locs * scale, keypoint_scores=vals, heatmaps=heatmaps)
            if vis_pred is not None:
                res["keypoints_visible"] = vis_pred
            return res

        precision = self._predict_precision()

        def _predict_p(variables, images):
            with jax.default_matmul_precision(precision):
                return _predict(variables, images)

        return jax.jit(_predict_p) if jit else _predict_p


def flip_heatmaps_ref(heatmaps, flip_indices, shift_heatmap):
    from probpose_code_tpu.ops.tta import flip_heatmaps

    return flip_heatmaps(heatmaps, flip_indices=flip_indices, flip_mode="heatmap", shift_heatmap=shift_heatmap)
