"""Training / evaluation runner (replaces mmengine Runner on the TPU stack).

Orchestrates the full reference training recipe (``tools/train.py`` ->
``Runner.from_cfg(cfg).train()``, EpochBasedTrainLoop semantics):

- config-driven dataloaders / model / optimizer / schedulers
- the jitted, mesh-sharded train step (parallel.train_step); data-parallel
  over all visible devices by default
- periodic validation (predict program + CocoMetric / MultiDatasetEvaluator)
- checkpointing with best-by-metric tracking (``save_best='COCO/AP'``, auto
  resume), via orbax
- interval logging with loss/accuracy monitors and iteration timing
  (IterTimerHook + LoggerHook equivalents)

Host-side data feeding uses the prefetching loader; one fused device step per
iteration.
"""

from __future__ import annotations

import json
import os
import os.path as osp
import time
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

import probpose_code_tpu.evaluation  # noqa: F401  (register metrics/evaluators)
from probpose_code_tpu.config import Config
from probpose_code_tpu.datasets import DataLoader
from probpose_code_tpu.datasets.metainfo import parse_pose_metainfo
from probpose_code_tpu.engine.optim import build_optimizer
from probpose_code_tpu.models import PoseModel
from probpose_code_tpu.parallel import (
    TrainState,
    create_train_state,
    make_mesh,
    make_train_step,
    shard_batch,
)
from probpose_code_tpu.registry import DATASETS, EVALUATORS, METRICS
from probpose_code_tpu.structures import InstanceData


class Runner:
    def __init__(self, cfg: Config, work_dir: Optional[str] = None):
        self.cfg = cfg
        self.work_dir = work_dir or cfg.get("work_dir", "work_dirs/default")
        os.makedirs(self.work_dir, exist_ok=True)
        self.logger = _SimpleLogger(osp.join(self.work_dir, "train.log"))

        # datasets ----------------------------------------------------
        self.train_dataloader_cfg = cfg.get("train_dataloader")
        self.val_dataloader_cfg = cfg.get("val_dataloader")
        self.train_loader = None
        self.val_loader = None
        self.val_dataset = None

        # model -------------------------------------------------------
        train_ds_cfg = (self.train_dataloader_cfg or {}).get("dataset", {})
        metainfo_cfg = train_ds_cfg.get("metainfo") or {"dataset_name": "coco"}
        self.metainfo = parse_pose_metainfo(dict(metainfo_cfg))
        self.model = PoseModel(cfg.model, metainfo=self.metainfo)

        # parallel ----------------------------------------------------
        mesh_cfg = cfg.get("env_cfg", {}).get("mesh", {})
        n_model = mesh_cfg.get("model", 1)
        n_data = mesh_cfg.get("data", -1)
        n_data = len(jax.devices()) // n_model if n_data in (-1, None) else n_data
        self.mesh = make_mesh(n_data=n_data, n_model=n_model)

        self.max_epochs = cfg.get("train_cfg", {}).get("max_epochs", 1)
        self.val_interval = cfg.get("train_cfg", {}).get("val_interval", 10)
        self.log_interval = cfg.get("default_hooks", {}).get("logger", {}).get("interval", 50)
        ckpt_cfg = cfg.get("default_hooks", {}).get("checkpoint", {})
        self.ckpt_interval = ckpt_cfg.get("interval", 10)
        self.save_best = ckpt_cfg.get("save_best")
        # mmengine CheckpointHook rule semantics: explicit rule wins, else
        # inferred from the key name (error-style metrics are minimized).
        rule = ckpt_cfg.get("rule")
        if rule is None and self.save_best:
            key = str(self.save_best).lower()
            rule = "less" if any(t in key for t in ("nme", "epe", "mpjpe", "loss", "error")) else "greater"
        self.save_best_rule = rule or "greater"
        self.best_metric = -np.inf if self.save_best_rule == "greater" else np.inf
        self.state: Optional[TrainState] = None
        self.epoch = 0

        # hooks (EMA, mode switches, ...) from cfg.custom_hooks
        from probpose_code_tpu.engine.hooks import Hook  # noqa: F401
        from probpose_code_tpu.registry import HOOKS

        self.hooks = [HOOKS.build(h) for h in cfg.get("custom_hooks", [])]

        # scalar-logging backends (visualizer.vis_backends config surface)
        from probpose_code_tpu.visualization import build_vis_backends

        self.vis_backends = build_vis_backends(cfg, self.work_dir)

    # -- construction helpers ---------------------------------------------

    def _collate_fn(self):
        if getattr(self.model, "onestage", False) or \
                getattr(self.model, "head_type", None) == "EDPoseTPUHead":
            # padded flat-GT batches (PackOneStageInputs); EDPoseTPU trains
            # on the same contract as the one-stage heads
            from probpose_code_tpu.datasets.transforms import collate_onestage

            return collate_onestage
        from probpose_code_tpu.datasets.loader import collate_pose_samples

        return collate_pose_samples

    def build_train_loader(self) -> DataLoader:
        cfg = dict(self.train_dataloader_cfg)
        ds = DATASETS.build(cfg["dataset"])
        return DataLoader(
            ds,
            batch_size=cfg.get("batch_size", 32),
            shuffle=cfg.get("sampler", {}).get("shuffle", True),
            collate_fn=self._collate_fn(),
            drop_last=True,
            num_workers=cfg.get("num_workers", 4),
        )

    def build_val_loader(self) -> DataLoader:
        cfg = dict(self.val_dataloader_cfg)
        self.val_dataset = DATASETS.build(cfg["dataset"])
        return DataLoader(
            self.val_dataset,
            batch_size=cfg.get("batch_size", 32),
            shuffle=False,
            collate_fn=self._collate_fn(),
            drop_last=False,
            num_workers=cfg.get("num_workers", 4),
        )

    def build_evaluator(self):
        ev_cfg = self.cfg.get("val_evaluator")
        if ev_cfg is None:
            return None
        if isinstance(ev_cfg, dict) and ev_cfg.get("type") in ("MultiDatasetEvaluator", "Evaluator"):
            evaluator = EVALUATORS.build(ev_cfg)
        elif isinstance(ev_cfg, (list, tuple)):
            evaluator = EVALUATORS.build(dict(type="Evaluator", metrics=list(ev_cfg)))
        else:
            evaluator = EVALUATORS.build(dict(type="Evaluator", metrics=[ev_cfg]))
        evaluator.dataset_meta = self.metainfo
        return evaluator

    # -- training ---------------------------------------------------------

    def setup_training(self, steps_per_epoch: Optional[int] = None):
        if self.state is not None:
            # in-process continuation (train() called again, e.g. chunked
            # schedules): the live TrainState carries params + optimizer;
            # rebuilding from model.variables would reset progress — and
            # crash outright, since the donated init arrays were consumed
            # by the first train step (buffer donation deletes them)
            return
        if self.model.variables is None:
            self.model.init()
        if steps_per_epoch is None:
            steps_per_epoch = len(self.train_loader) if self.train_loader else 1000
        self.tx, self.lr_fn = build_optimizer(
            self.model.params,
            self.cfg.get("optim_wrapper", {}),
            param_scheduler=self.cfg.get("param_scheduler"),
            steps_per_epoch=steps_per_epoch,
            max_epochs=self.max_epochs,
        )
        self.state = create_train_state(self.model.variables, self.tx)
        self.train_step = make_train_step(self.model, self.tx, mesh=self.mesh)
        self.rng = jax.random.PRNGKey(self.cfg.get("seed", 0))

    def train(self, max_epochs: Optional[int] = None):
        if self.train_loader is None:
            self.train_loader = self.build_train_loader()
        self.setup_training()
        if self.cfg.get("resume"):
            self.try_resume()

        max_epochs = max_epochs or self.max_epochs
        evaluator = self.build_evaluator()

        for hook in self.hooks:
            hook.before_run(self)
        for epoch in range(self.epoch, max_epochs):
            self.epoch = epoch
            for hook in self.hooks:
                hook.before_train_epoch(self, epoch)
            self.train_loader.set_epoch(epoch)
            self._train_epoch(epoch)

            save_ckpt = (epoch + 1) % self.ckpt_interval == 0 or epoch + 1 == max_epochs
            run_val = evaluator is not None and (
                (epoch + 1) % self.val_interval == 0 or epoch + 1 == max_epochs)
            if save_ckpt or run_val:
                # EMA-style hooks swap their averaged weights in here, so val
                # metrics, best-ckpt selection and saved checkpoints all see
                # the EMA weights (reference EMAHook protocol).
                for hook in self.hooks:
                    hook.before_eval(self)
            if save_ckpt:
                self.save_checkpoint(osp.join(self.work_dir, f"epoch_{epoch + 1}"))
            if run_val:
                metrics = self.val(evaluator)
                for hook in self.hooks:
                    hook.after_val_epoch(self, metrics)
                self._maybe_save_best(metrics)
            if save_ckpt or run_val:
                for hook in self.hooks:
                    hook.after_eval(self)
        for hook in self.hooks:
            hook.after_run(self)
        return self.state

    def _train_epoch(self, epoch: int):
        t_data = t_step = 0.0
        t0 = time.perf_counter()
        for i, batch in enumerate(self.train_loader):
            data_samples = batch.pop("data_samples", None)
            batch.pop("img_metas", None)
            device_batch = shard_batch({k: jnp.asarray(v) for k, v in batch.items()}, self.mesh)
            t1 = time.perf_counter()
            t_data += t1 - t0

            self.state, metrics = self.train_step(self.state, device_batch, self.rng)
            for hook in self.hooks:
                hook.after_train_iter(self, int(self.state.step), metrics)
            t0 = time.perf_counter()
            t_step += t0 - t1

            if (i + 1) % self.log_interval == 0:
                host_metrics = {k: float(v) for k, v in metrics.items()}
                step = int(self.state.step)
                lr = float(self.lr_fn(step))
                for backend in self.vis_backends:
                    backend.add_scalars({f"train/{k}": v for k, v in host_metrics.items()}, step)
                self.logger.log(
                    f"Epoch [{epoch + 1}][{i + 1}/{len(self.train_loader)}] "
                    f"lr: {lr:.2e} "
                    + " ".join(f"{k}: {v:.4f}" for k, v in host_metrics.items())
                    + f" data_time: {t_data / (i + 1):.3f}s step_time: {t_step / (i + 1):.3f}s"
                )

    # -- validation -------------------------------------------------------

    def val(self, evaluator=None, flip_test: Optional[bool] = None) -> Dict[str, float]:
        """Validation pass. ``flip_test`` overrides the model's
        ``test_cfg.flip_test`` (None keeps the config value)."""
        if self.val_loader is None:
            self.val_loader = self.build_val_loader()
        if evaluator is None:
            evaluator = self.build_evaluator()
        if self.state is None and self.model.variables is None:
            self.model.init()
        variables = {"params": self.state.params, "batch_stats": self.state.batch_stats} \
            if self.state is not None else self.model.variables
        predict = self.model.make_predict(flip_test=flip_test, jit=True)

        for batch in self.val_loader:
            data_samples = batch.get("data_samples")
            if data_samples is None and "img_metas" in batch:
                # one-stage collate (PackOneStageInputs) ships flat meta
                # dicts instead of PoseDataSamples — synthesize them so the
                # metric sees the same contract as every other family
                from probpose_code_tpu.structures import PoseDataSample

                data_samples = []
                for meta in batch["img_metas"]:
                    s = PoseDataSample()
                    s.set_metainfo(dict(meta))
                    data_samples.append(s)
            preds = predict(variables, jnp.asarray(batch["inputs"]))
            preds = {k: np.asarray(v) for k, v in preds.items()}
            if "keypoints_3d" in preds:  # PoseLifter: codec denormalize + root restore
                attach_lifting_predictions(preds, data_samples, self.model)
            elif "pred_logits" in preds:  # DETR-family: host top-k decode
                attach_edpose_predictions(preds, data_samples, self.model)
            elif "displacements" in preds or "tags" in preds or "instance_coords" in preds:
                # bottomup dense heads (DEKR / AE / CID): codec host decode
                attach_bottomup_predictions(preds, data_samples, self.model, variables=variables)
            elif getattr(self.model, "onestage", False) or ("bboxes" in preds and "scores" in preds):
                # one-stage padded outputs (YOLOX-Pose / RTMO / EDPoseTPU)
                attach_onestage_predictions(preds, data_samples, self.model)
            else:
                attach_predictions(preds, data_samples, self.model.input_size)
            evaluator.process(data_samples)
        metrics = evaluator.evaluate(len(self.val_loader.dataset))
        for backend in self.vis_backends:
            backend.add_scalars(
                {f"val/{k}": v for k, v in metrics.items()},
                int(self.state.step) if self.state is not None else 0,
            )
        self.logger.log("val: " + " ".join(f"{k}: {v:.4f}" for k, v in metrics.items()))
        return metrics

    def _maybe_save_best(self, metrics: Dict[str, float]):
        if not self.save_best:
            return
        # Reference recipes write unprefixed keys (save_best='PCK') while our
        # metrics arrive prefixed by the metric's default_prefix
        # ('mpii/PCK', 'coco/AP', ...) — match exact key or '/<key>' suffix.
        key = self.save_best if self.save_best in metrics else next(
            (k for k in metrics if k.endswith("/" + self.save_best)), None)
        if key is None:
            return
        better = (metrics[key] > self.best_metric) if self.save_best_rule == "greater" \
            else (metrics[key] < self.best_metric)
        if better:
            self.best_metric = metrics[key]
            self.save_checkpoint(osp.join(self.work_dir, "best"))
            self.logger.log(f"new best {key}: {self.best_metric:.4f}")

    # -- checkpointing ----------------------------------------------------

    def save_checkpoint(self, path: str):
        from probpose_code_tpu.engine.checkpoint import save_checkpoint

        save_checkpoint(
            path,
            params=self.state.params if self.state else self.model.params,
            batch_stats=self.state.batch_stats if self.state else self.model.variables.get("batch_stats", {}),
            opt_state=self.state.opt_state if self.state else None,
            meta=dict(epoch=self.epoch + 1, step=int(self.state.step) if self.state else 0,
                      dataset_meta={"dataset_name": self.metainfo["dataset_name"]}),
        )
        self.logger.log(f"checkpoint saved to {path}")

    def try_resume(self):
        from probpose_code_tpu.engine.checkpoint import latest_checkpoint, load_checkpoint

        path = latest_checkpoint(self.work_dir)
        if path is None:
            return
        restored = load_checkpoint(path)
        self.state = self.state.replace(
            params=restored["params"],
            batch_stats=restored.get("batch_stats", self.state.batch_stats),
            step=jnp.asarray(restored["meta"].get("step", 0), jnp.int32),
        )
        if restored.get("opt_state") is not None:
            self.state = self.state.replace(opt_state=restored["opt_state"])
        self.epoch = restored["meta"].get("epoch", 0)
        self.logger.log(f"resumed from {path} (epoch {self.epoch})")

    # -- factory ----------------------------------------------------------

    @staticmethod
    def from_cfg(cfg) -> "Runner":
        if not isinstance(cfg, Config):
            cfg = Config.fromdict(dict(cfg))
        return Runner(cfg, work_dir=cfg.get("work_dir"))


def attach_edpose_predictions(preds: Dict[str, np.ndarray], data_samples: List, model) -> None:
    """Decode DETR-family (EDPose) predict outputs per sample with the
    model's EDPoseLabel codec (reference ``edpose_head.py:predict`` ->
    ``data_decoder.decode``) and restore to original-image coordinates."""
    for i, sample in enumerate(data_samples):
        w_h = np.asarray(sample.metainfo.get("input_size", model.input_size), dtype=np.float32)
        bboxes, kpts, scores = model.decoder.decode(
            (w_h[1], w_h[0]),  # codec follows the reference's (h, w) convention
            preds["pred_logits"][i], preds["pred_boxes"][i], preds["pred_keypoints"][i],
        )
        input_center = np.asarray(sample.metainfo["input_center"], dtype=np.float32)
        input_scale = np.asarray(sample.metainfo["input_scale"], dtype=np.float32)

        def to_image(coords):
            return coords / w_h * input_scale + input_center - 0.5 * input_scale

        inst = InstanceData()
        inst.set_field(to_image(kpts.astype(np.float32)), "keypoints")
        inst.set_field(scores.astype(np.float32), "keypoint_scores")
        if bboxes.size:
            bboxes = np.concatenate(
                [to_image(bboxes[:, :2].astype(np.float32)), to_image(bboxes[:, 2:4].astype(np.float32))],
                axis=1,
            )
        inst.set_field(bboxes.astype(np.float32), "bboxes")
        inst.set_field(scores[:, 0].astype(np.float32), "bbox_scores")
        sample.pred_instances = inst


def attach_predictions(preds: Dict[str, np.ndarray], data_samples: List, input_size) -> None:
    """Attach batched predict-program outputs to data samples, restoring
    coordinates from model-input space to original image space (reference
    ``topdown.py:add_pred_to_datasample:128-167``)."""
    B = preds["keypoints"].shape[0]
    for i in range(B):
        sample = data_samples[i]
        input_center = np.asarray(sample.metainfo["input_center"])
        input_scale = np.asarray(sample.metainfo["input_scale"])
        w_h = np.asarray(sample.metainfo.get("input_size", input_size), dtype=np.float32)

        kpts = preds["keypoints"][i].copy()
        if kpts.shape[-1] == 3:  # 3D hand volume: x/y restore, z stays in bins
            kpts[..., :2] = kpts[..., :2] / w_h * input_scale + input_center - 0.5 * input_scale
        else:
            kpts = kpts / w_h * input_scale + input_center - 0.5 * input_scale

        inst = InstanceData()
        inst.set_field(kpts[None], "keypoints")
        inst.set_field(preds["keypoint_scores"][i][None], "keypoint_scores")
        for name in ("keypoints_probs", "keypoints_visible", "keypoints_oks", "keypoints_error",
                     "keypoints_conf", "rel_root_depth", "hand_type"):
            if name in preds:
                inst.set_field(preds[name][i][None], name)
        gt = sample.gt_instances
        if "bboxes" in gt:
            inst.set_field(np.asarray(gt.bboxes), "bboxes")
        if "bbox_scores" in gt:
            inst.set_field(np.asarray(gt.bbox_scores), "bbox_scores")
        sample.pred_instances = inst


def _input_to_image(coords: np.ndarray, sample, default_input_size) -> np.ndarray:
    """Model-input space -> original image space (reference bottomup
    ``add_pred_to_datasample``, same formula as the topdown path)."""
    in_wh = np.asarray(sample.metainfo.get("input_size", default_input_size), np.float32)
    center = np.asarray(sample.metainfo["input_center"], np.float32)
    scale = np.asarray(sample.metainfo["input_scale"], np.float32)
    return coords / in_wh * scale + center - 0.5 * scale


def _set_bottomup_instances(sample, keypoints, keypoint_scores) -> None:
    inst = InstanceData()
    inst.set_field(np.asarray(keypoints, np.float32), "keypoints")
    inst.set_field(np.asarray(keypoint_scores, np.float32), "keypoint_scores")
    inst.set_field(np.asarray(keypoint_scores, np.float32), "keypoints_visible")
    sample.pred_instances = inst


def attach_bottomup_predictions(preds: Dict[str, np.ndarray], data_samples: List, model,
                                variables: Optional[dict] = None) -> None:
    """Host tail for dense bottomup heads: codec grouping/decoding, DEKR
    rescoring + nearby-joints NMS, coordinate restore. Mirrors reference
    ``dekr_head.predict`` (:440-492), ``ae_head.predict`` and
    ``cid_head.predict`` host sections. ``variables`` must be the tree the
    predict program ran with (the runner's live train state during val —
    the model's init tree may have been donated to the train step)."""
    test_cfg = model.aux["test_cfg"]
    metainfo = model.metainfo or {}
    if variables is None:
        variables = model.variables

    if "displacements" in preds:  # DEKR: SPR decode per sample
        from probpose_code_tpu.evaluation.functional.nms import nearby_joints_nms
        from probpose_code_tpu.models.pose_estimators.bottomup import rescore_dekr_instances

        rcfg = model.aux["head_cfg"].get("rescore_cfg")
        rescore_params = None
        if rcfg is not None:
            rescore_params = variables["params"].get("head", {}).get("rescore")
            if rescore_params is not None and not np.any(np.asarray(rescore_params["l1"]["kernel"])):
                # zero-init sentinel: no pretrained rescore weights were
                # loaded (RescoreMLP docstring) — skip rescoring rather than
                # multiply scores by an untrained net
                rescore_params = None
        skeleton = metainfo.get("skeleton_links")
        for i, sample in enumerate(data_samples):
            kpts, (root_scores, kpt_scores) = model.decoder.decode(
                preds["heatmaps"][i], preds["displacements"][i]
            )
            if kpt_scores is None:
                kpt_scores = np.ones(kpts.shape[:2], np.float32)
            if rescore_params is not None and skeleton and len(kpts) > 0:
                inst_scores = rescore_dekr_instances(
                    kpts, kpt_scores, skeleton,
                    tuple(rcfg.get("norm_indexes", (5, 6))), rescore_params,
                )
                root_scores = root_scores * np.nan_to_num(inst_scores, nan=0.0)
            scores = root_scores[..., None] * kpt_scores
            nms_dist_thr = float(test_cfg.get("nms_dist_thr", 0) or 0)
            if len(kpts) and nms_dist_thr > 0:
                kpts_db = [dict(keypoints=kpts[j], score=kpt_scores[j]) for j in range(len(kpts))]
                keep = nearby_joints_nms(
                    kpts_db, nms_dist_thr, test_cfg.get("nms_joints_thr"),
                    score_per_joint=True, max_dets=int(test_cfg.get("max_num_people", 30)),
                )
                kpts, scores = kpts[keep], scores[keep]
            if len(kpts):
                kpts = _input_to_image(kpts, sample, model.input_size)
            _set_bottomup_instances(sample, kpts, scores)
        return

    if "tags" in preds:  # AE: tag grouping per batch
        batch_kpts, batch_scores, _ = model.decoder.batch_decode(preds["heatmaps"], preds["tags"])
        for sample, kpts, scores in zip(data_samples, batch_kpts, batch_scores):
            if len(kpts):
                kpts = _input_to_image(kpts, sample, model.input_size)
            _set_bottomup_instances(sample, kpts, scores)
        return

    # CID: instances decoded on device, padded to max_instances
    for i, sample in enumerate(data_samples):
        valid = preds["scores"][i] > 0
        kpts = preds["keypoints"][i][valid]
        scores = preds["keypoint_scores"][i][valid]
        if len(kpts):
            kpts = _input_to_image(kpts, sample, model.input_size)
        _set_bottomup_instances(sample, kpts, scores)


def attach_lifting_predictions(preds: Dict[str, np.ndarray], data_samples: List, model) -> None:
    """Host tail for PoseLifter val: lifting-codec decode (denormalize, add
    the root back — reference ``temporal_regression_head.predict`` ->
    ``codec.decode(encoded, target_root)``)."""
    kpts3d = preds["keypoints_3d"]
    for i, sample in enumerate(data_samples):
        pred = np.asarray(kpts3d[i], np.float32)
        if pred.ndim == 2:
            pred = pred[None]  # (T=1, K, 3)
        target_root = sample.metainfo.get("target_root")
        if target_root is not None:
            target_root = np.asarray(target_root, np.float32)
        if model.decoder is not None:
            kpts, scores = model.decoder.decode(pred, target_root)
        else:
            kpts, scores = pred, np.ones(pred.shape[:-1], np.float32)
        inst = InstanceData()
        inst.set_field(kpts.astype(np.float32), "keypoints")
        inst.set_field(scores.astype(np.float32), "keypoint_scores")
        sample.pred_instances = inst


def attach_onestage_predictions(preds: Dict[str, np.ndarray], data_samples: List, model) -> None:
    """Host tail for one-stage heads (YOLOX-Pose / RTMO) in the val loop:
    threshold + bbox NMS (``postprocess_onestage``) then coordinate restore,
    the same tail ``apis.inference_bottomup`` drives for demos."""
    from probpose_code_tpu.models.heads.yoloxpose_head import postprocess_onestage

    test_cfg = model.aux["test_cfg"]
    # DETR-family heads are one-to-one matched: NMS is architecturally wrong
    # for them (the reference EDPose predict selects top-k by score with no
    # NMS, edpose_head.py:predict) and suppresses genuinely overlapping
    # instances — default it off unless the config explicitly asks
    default_nms = 1.0 if getattr(model, "head_type", None) == "EDPoseTPUHead" else 0.65
    results = postprocess_onestage(
        preds,
        score_thr=float(test_cfg.get("score_thr", 0.1)),
        nms_thr=float(test_cfg.get("nms_thr", default_nms)),
        input_size=tuple(model.input_size),
    )
    for sample, r in zip(data_samples, results):
        inst = InstanceData()
        kpts = np.asarray(r["keypoints"], np.float32)
        bboxes = np.asarray(r["bboxes"], np.float32)
        if len(kpts):
            kpts = _input_to_image(kpts, sample, model.input_size)
        if bboxes.size:
            bboxes = np.concatenate(
                [
                    _input_to_image(bboxes[:, :2], sample, model.input_size),
                    _input_to_image(bboxes[:, 2:4], sample, model.input_size),
                ],
                axis=1,
            )
        inst.set_field(kpts, "keypoints")
        inst.set_field(np.asarray(r["keypoint_scores"], np.float32), "keypoint_scores")
        inst.set_field(np.asarray(r["keypoints_visible"], np.float32), "keypoints_visible")
        inst.set_field(bboxes, "bboxes")
        inst.set_field(np.asarray(r["scores"], np.float32), "bbox_scores")
        sample.pred_instances = inst


class _SimpleLogger:
    def __init__(self, logfile: Optional[str] = None):
        self.logfile = logfile

    def log(self, msg: str):
        line = f"[{time.strftime('%Y-%m-%d %H:%M:%S')}] {msg}"
        print(line, flush=True)
        if self.logfile:
            with open(self.logfile, "a") as f:
                f.write(line + "\n")
