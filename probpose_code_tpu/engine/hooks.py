"""Training hooks (EMA, mode switching, bad-case analysis, visualization).

Parity targets in reference ``mmpose/engine/hooks/``:
- ``ExpMomentumEMA`` (``ema_hook.py:14``): exponential-moving-average of the
  parameters with momentum warmup; here a pure-pytree EMA the runner keeps
  next to the train state (TPU-friendly: one fused tree-map per step).
- ``YOLOXPoseModeSwitchHook`` / ``RTMOModeSwitchHook``
  (``mode_switch_hooks.py:14,69``): switch augmentation pipeline / loss
  weights at a given epoch.
- ``BadCaseAnalysisHook`` (``badcase_hook.py:23``): collect the worst-N val
  samples by a metric and dump them for inspection.
- ``PoseVisualizationHook`` (``visualization_hook.py:20``): render val
  predictions at an interval.

Hooks implement any of: before_run, before_train_epoch, after_train_iter,
after_val_epoch, after_run (called by the Runner when registered).
"""

from __future__ import annotations

import math
import os
import os.path as osp
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from probpose_code_tpu.registry import HOOKS


class Hook:
    def before_run(self, runner):  # noqa: D102
        pass

    def before_train_epoch(self, runner, epoch: int):
        pass

    def after_train_iter(self, runner, step: int, metrics: Dict[str, Any]):
        pass

    def after_val_epoch(self, runner, metrics: Dict[str, float]):
        pass

    def before_eval(self, runner):
        """Called before validation / checkpoint save — lets weight-averaging
        hooks swap their averaged params into the live train state (reference
        mmengine EMAHook swaps EMA in for val and stores EMA weights in the
        checkpoint's ``state_dict``)."""

    def after_eval(self, runner):
        """Restore the live training params after ``before_eval``."""

    def after_run(self, runner):
        pass


@HOOKS.register_module()
class ExpMomentumEMA(Hook):
    """EMA of params with exponentially-warmed momentum
    ``m_t = m * (1 - e^{-t/gamma})`` (reference ema_hook semantics).
    ``gamma=None`` keeps the momentum constant (plain
    ExponentialMovingAverage). ``update_buffers`` also tracks batch_stats."""

    def __init__(self, momentum: float = 0.0002, gamma: Optional[int] = 2000,
                 update_buffers: bool = False, begin_iter: int = 0,
                 begin_epoch: int = 0):
        self.momentum = momentum
        self.gamma = gamma
        self.update_buffers = update_buffers
        self.begin_iter = begin_iter
        self.begin_epoch = begin_epoch
        self.ema_params = None
        self.ema_buffers = None
        self._backup = None  # (params, batch_stats) while EMA is swapped in

    def _tracked(self, runner):
        bufs = runner.state.batch_stats if self.update_buffers else None
        return runner.state.params, bufs

    def after_train_iter(self, runner, step: int, metrics):
        params, bufs = self._tracked(runner)
        # mmengine EMAHook begin_iter/begin_epoch semantics: until the begin
        # point the EMA is re-seeded from the live weights every step (so at
        # the start point EMA == current weights); blending starts after it.
        before_begin = (step < self.begin_iter
                        or getattr(runner, "epoch", 0) < self.begin_epoch)
        if self.ema_params is None or before_begin:
            # deep-copy: the live state buffers are DONATED to the next jitted
            # train step (train_step.py donate_argnums) and would be deleted
            # under our feet if we kept references
            copy = lambda t: jax.tree_util.tree_map(jnp.array, t)  # noqa: E731
            self.ema_params = copy(params)
            self.ema_buffers = copy(bufs) if bufs is not None else None
            return
        m = self.momentum
        if self.gamma:
            m = (1 - self.momentum) * math.exp(-(1 + step) / self.gamma) + self.momentum
        blend = lambda e, p: e * (1 - m) + p * m  # noqa: E731
        self.ema_params = jax.tree_util.tree_map(blend, self.ema_params, params)
        if bufs is not None and self.ema_buffers is not None:
            self.ema_buffers = jax.tree_util.tree_map(blend, self.ema_buffers, bufs)

    def swap_into(self, runner):
        """Replace the live params with the EMA copy (for eval/export)."""
        if self.ema_params is not None:
            runner.state = runner.state.replace(params=self.ema_params)
        if self.ema_buffers is not None:
            runner.state = runner.state.replace(batch_stats=self.ema_buffers)

    # Runner protocol: validation metrics, best-checkpoint selection and saved
    # checkpoints all read the EMA weights, like the reference mmengine
    # EMAHook (before_val_epoch/before_save_checkpoint swap semantics).
    def before_eval(self, runner):
        if self.ema_params is None or self._backup is not None:
            return
        self._backup = (runner.state.params, runner.state.batch_stats)
        self.swap_into(runner)

    def after_eval(self, runner):
        if self._backup is None:
            return
        params, bufs = self._backup
        self._backup = None
        runner.state = runner.state.replace(params=params)
        if bufs is not None:
            runner.state = runner.state.replace(batch_stats=bufs)


@HOOKS.register_module()
class EMAHook(ExpMomentumEMA):
    """mmengine-schema front for the EMA hook, as written by the reference
    recipes (e.g. ``rtmo-l_16xb16-600e_coco-640x640.py``:
    ``dict(type='EMAHook', ema_type='ExpMomentumEMA', momentum=0.0002,
    update_buffers=True, priority=49)``). ``ema_type`` selects the averaging
    rule: 'ExpMomentumEMA' (exp-warmed momentum) or
    'ExponentialMovingAverage' / 'StochasticWeightAverage'-style constant
    momentum."""

    def __init__(self, ema_type: str = "ExpMomentumEMA", momentum: float = 0.0002,
                 gamma: int = 2000, update_buffers: bool = False,
                 priority: int = 49, strict_load: bool = False, begin_iter: int = 0,
                 begin_epoch: int = 0, **_ignored):
        super().__init__(momentum=momentum,
                         gamma=gamma if ema_type == "ExpMomentumEMA" else None,
                         update_buffers=update_buffers,
                         begin_iter=begin_iter, begin_epoch=begin_epoch)
        self.priority = priority


@HOOKS.register_module()
class YOLOXPoseModeSwitchHook(Hook):
    """Disable strong augmentations for the last N epochs
    (reference mode_switch_hooks.py:14)."""

    def __init__(self, num_last_epochs: int = 20, new_train_pipeline: Optional[list] = None,
                 new_train_dataset: Optional[dict] = None, priority: int = 48):
        self.num_last_epochs = num_last_epochs
        self.new_train_pipeline = new_train_pipeline
        self.new_train_dataset = new_train_dataset
        self.priority = priority
        self._switched = False

    def before_train_epoch(self, runner, epoch: int):
        if self._switched or epoch < runner.max_epochs - self.num_last_epochs:
            return
        self._switched = True
        if runner.train_loader is None:
            return
        from probpose_code_tpu.datasets.base_dataset import Compose
        from probpose_code_tpu.registry import DATASETS

        if self.new_train_dataset is not None:
            # reference mode_switch_hooks.py:14 also swaps the dataset (e.g.
            # RTMO body7 drops the mosaic CombinedDataset for plain COCO)
            cfg = dict(self.new_train_dataset)
            if self.new_train_pipeline is not None:
                cfg["pipeline"] = self.new_train_pipeline
            runner.train_loader.dataset = DATASETS.build(cfg)
            runner.logger.log(f"mode switch at epoch {epoch}: train dataset replaced")
        elif self.new_train_pipeline:
            runner.train_loader.dataset.pipeline = Compose(self.new_train_pipeline)
            runner.logger.log(f"mode switch at epoch {epoch}: train pipeline replaced")


@HOOKS.register_module()
class PipelineSwitchHook(Hook):
    """Swap the train dataset's pipeline at ``switch_epoch`` — the
    mmdet.PipelineSwitchHook schema every reference RTMPose-style recipe
    writes (``custom_hooks=[..., dict(type='PipelineSwitchHook',
    switch_epoch=max_epochs-stage2, switch_pipeline=train_pipeline_stage2)]``)."""

    def __init__(self, switch_epoch: int, switch_pipeline: Optional[list] = None):
        self.switch_epoch = int(switch_epoch)
        self.switch_pipeline = switch_pipeline
        self._switched = False

    def before_train_epoch(self, runner, epoch: int):
        if self._switched or epoch < self.switch_epoch:
            return
        self._switched = True
        if self.switch_pipeline and runner.train_loader is not None:
            from probpose_code_tpu.datasets.base_dataset import Compose

            runner.train_loader.dataset.pipeline = Compose(self.switch_pipeline)
            runner.logger.log(f"pipeline switch at epoch {epoch}: stage2 train pipeline active")


@HOOKS.register_module()
class RTMOModeSwitchHook(Hook):
    """Change head attribute values at scheduled epochs
    (reference mode_switch_hooks.py:69): ``epoch_attributes`` maps epoch ->
    {attr: value} applied to the runner's head config (consumed by losses)."""

    def __init__(self, epoch_attributes: Dict[int, Dict[str, Any]], priority: int = 48):
        self.epoch_attributes = {int(k): v for k, v in epoch_attributes.items()}
        self.priority = priority

    def before_train_epoch(self, runner, epoch: int):
        if epoch in self.epoch_attributes:
            for attr, value in self.epoch_attributes[epoch].items():
                runner.model.aux["head_cfg"][attr] = value
            runner.logger.log(f"RTMO mode switch at epoch {epoch}: {self.epoch_attributes[epoch]}")


@HOOKS.register_module()
class BadCaseAnalysisHook(Hook):
    """Collect the worst-N validation samples by keypoint error."""

    def __init__(self, enable: bool = True, out_dir: str = "badcase", max_cases: int = 20, metric: str = "error"):
        self.enable = enable
        self.out_dir = out_dir
        self.max_cases = max_cases
        self.cases: List[dict] = []

    def observe(self, data_sample, error: float):
        if not self.enable:
            return
        self.cases.append(dict(id=data_sample.metainfo.get("id"), error=float(error)))
        self.cases.sort(key=lambda c: -c["error"])
        del self.cases[self.max_cases:]

    def after_run(self, runner):
        if not self.enable or not self.cases:
            return
        import json

        os.makedirs(osp.join(runner.work_dir, self.out_dir), exist_ok=True)
        with open(osp.join(runner.work_dir, self.out_dir, "badcases.json"), "w") as f:
            json.dump(self.cases, f, indent=2)


@HOOKS.register_module()
class PoseVisualizationHook(Hook):
    """Render every Nth validation sample's prediction."""

    def __init__(self, enable: bool = False, interval: int = 50, out_dir: Optional[str] = None, kpt_thr: float = 0.3):
        self.enable = enable
        self.interval = interval
        self.out_dir = out_dir
        self.kpt_thr = kpt_thr
        self._count = 0

    def visualize(self, runner, image: np.ndarray, data_sample):
        if not self.enable:
            return
        self._count += 1
        if self._count % self.interval:
            return
        from probpose_code_tpu.visualization import PoseLocalVisualizer

        vis = PoseLocalVisualizer()
        vis.set_dataset_meta(runner.metainfo)
        out_dir = self.out_dir or osp.join(runner.work_dir, "vis")
        vis.add_datasample(
            f"val_{self._count}", image, data_sample, kpt_thr=self.kpt_thr,
            out_file=osp.join(out_dir, f"val_{self._count}.jpg"),
        )


@HOOKS.register_module()
class ProfilerHook(Hook):
    """Capture a ``jax.profiler`` device trace over a window of train iters.

    The reference has no tracer (SURVEY §5: only mmengine ``IterTimerHook``
    timing); the TPU-native counterpart records an XLA/TPU trace viewable in
    TensorBoard / Perfetto. The window is ``[begin_iter, begin_iter + num_iters)``
    on global step counts; the trace lands in ``<work_dir>/profiler_trace``
    (override with ``trace_dir``). One window per run — profiling every step
    would serialize dispatch and distort the numbers it measures.
    """

    def __init__(self, begin_iter: int = 10, num_iters: int = 5,
                 trace_dir: Optional[str] = None):
        self.begin_iter = int(begin_iter)
        self.num_iters = int(num_iters)
        self.trace_dir = trace_dir
        self._active = False
        self._done = False

    def after_train_iter(self, runner, step: int, metrics: Dict[str, Any]):
        if self._done:
            return
        if not self._active and step >= self.begin_iter:
            path = self.trace_dir or osp.join(runner.work_dir, "profiler_trace")
            os.makedirs(path, exist_ok=True)
            jax.profiler.start_trace(path)
            self._active = True
            self._stop_at = step + self.num_iters
        elif self._active and step >= self._stop_at:
            self._finish()

    def _finish(self):
        # block on the last dispatched step so its device activity is captured
        jax.effects_barrier()
        jax.profiler.stop_trace()
        self._active = False
        self._done = True

    def after_run(self, runner):
        if self._active:  # run ended inside the window
            self._finish()


@HOOKS.register_module()
class SyncBuffersHook(Hook):
    """No-op on TPU: buffers (BN stats) are computed over the global batch
    inside the jitted step, so there is nothing to synchronize
    (reference sync-buffer semantics are subsumed — see parallel/train_step)."""


@HOOKS.register_module()
class SyncNormHook(Hook):
    """No-op on TPU (reference ``engine/hooks/sync_norm_hook.py:22`` all-reduces
    norm-layer states across ranks before val; jit's global-view BN makes the
    states identical on every device by construction)."""

    def __init__(self, priority: int = 48, **_ignored):
        self.priority = priority
