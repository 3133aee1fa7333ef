"""Visualization/metric logging backends (mmengine vis_backends parity).

The reference configures pluggable backends on the visualizer
(``configs/_base_/default_runtime.py:28-33`` — LocalVisBackend enabled,
Tensorboard/Wandb as commented stubs). Here the same config surface drives
scalar logging from the Runner:

    visualizer = dict(vis_backends=[
        dict(type="LocalVisBackend"),
        dict(type="TensorboardVisBackend"),
    ])

``TensorboardVisBackend`` uses ``torch.utils.tensorboard`` (torch is part
of the environment); wandb is not installed, so ``WandbVisBackend`` raises
with guidance, like the other gated integrations.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional

from probpose_code_tpu.registry import VISUALIZERS


class BaseVisBackend:
    def __init__(self, save_dir: Optional[str] = None):
        self.save_dir = save_dir

    def add_scalars(self, scalars: Dict[str, float], step: int) -> None:
        raise NotImplementedError

    def close(self) -> None:
        pass


@VISUALIZERS.register_module()
class LocalVisBackend(BaseVisBackend):
    """Append scalar dicts to ``<save_dir>/scalars.json`` (one json/line,
    the mmengine local-backend format)."""

    def __init__(self, save_dir: Optional[str] = None):
        super().__init__(save_dir)
        self._file = None

    def add_scalars(self, scalars: Dict[str, float], step: int) -> None:
        if self._file is None:
            os.makedirs(self.save_dir or ".", exist_ok=True)
            self._file = open(os.path.join(self.save_dir or ".", "scalars.json"), "a")
        rec = {k: float(v) for k, v in scalars.items()}
        rec["step"] = int(step)
        self._file.write(json.dumps(rec) + "\n")
        self._file.flush()

    def close(self) -> None:
        if self._file is not None:
            self._file.close()
            self._file = None


@VISUALIZERS.register_module()
class TensorboardVisBackend(BaseVisBackend):
    """TensorBoard event files via ``torch.utils.tensorboard``."""

    def __init__(self, save_dir: Optional[str] = None):
        super().__init__(save_dir)
        self._writer = None

    def add_scalars(self, scalars: Dict[str, float], step: int) -> None:
        if self._writer is None:
            from torch.utils.tensorboard import SummaryWriter

            self._writer = SummaryWriter(log_dir=self.save_dir)
        for k, v in scalars.items():
            self._writer.add_scalar(k, float(v), global_step=int(step))

    def close(self) -> None:
        if self._writer is not None:
            self._writer.close()
            self._writer = None


@VISUALIZERS.register_module()
class WandbVisBackend(BaseVisBackend):
    """Weights & Biases backend — the package is not installed here."""

    def __init__(self, *args, **kwargs):
        try:
            import wandb  # noqa: F401
        except ImportError as e:
            raise ImportError(
                "WandbVisBackend requires the 'wandb' package, which is not "
                "installed in this environment; use LocalVisBackend or "
                "TensorboardVisBackend instead"
            ) from e


def build_vis_backends(cfg, work_dir: str):
    """Build the runner's scalar-logging backends from ``cfg.visualizer``."""
    vis_cfg = (cfg.get("visualizer") or {}) if hasattr(cfg, "get") else {}
    backends = []
    for b in vis_cfg.get("vis_backends", []) or []:
        b = dict(b)
        b.setdefault("save_dir", os.path.join(work_dir, "vis_data"))
        backends.append(VISUALIZERS.build(b))
    return backends
