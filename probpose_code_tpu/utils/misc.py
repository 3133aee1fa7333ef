"""Small runtime utilities: timers, env collection, module registration,
distributed helpers, tensor conversion.

Behavioral parity targets (reference ``mmpose/utils/``): timer.py
(StopWatch :24, RunningAverage :8), collect_env.py, setup_env.py
(register_all_modules :55), dist_utils.py (reduce_mean :5),
tensor_utils.py (to_numpy).
"""

from __future__ import annotations

import time
from collections import defaultdict
from contextlib import contextmanager
from typing import Any, Dict, List

import numpy as np


class RunningAverage:
    """Fixed-window running average (reference ``timer.py:8-21``)."""

    def __init__(self, window: int = 10):
        self.window = window
        self._data: List[float] = []

    def update(self, value: float) -> None:
        self._data.append(value)
        self._data = self._data[-self.window:]

    def average(self) -> float:
        return float(np.mean(self._data)) if self._data else 0.0


class StopWatch:
    """Named-scope wall-clock profiler (reference ``timer.py:24-103``)."""

    def __init__(self, window: int = 1):
        self.window = window
        self._record: Dict[str, RunningAverage] = defaultdict(lambda: RunningAverage(self.window))
        self._timer_stack: List = []

    @contextmanager
    def timeit(self, timer_name: str = "_FPS_"):
        t0 = time.time()
        try:
            yield
        finally:
            self._record[timer_name].update(time.time() - t0)

    def report(self, key: str = None) -> Dict[str, float]:
        result = {name: r.average() * 1000.0 for name, r in self._record.items()}
        if "_FPS_" in result:
            result["_FPS_"] = 1000.0 / result.pop("_FPS_") if result["_FPS_"] else 0.0
        if key is not None:
            return result.get(key)
        return result

    def report_strings(self) -> List[str]:
        items = self.report()
        strings = []
        if "_FPS_" in items:
            strings.append(f"FPS: {items.pop('_FPS_'):>5.1f}")
        strings += [f"{name}: {val:>3.0f}ms" for name, val in items.items()]
        return strings

    def reset(self) -> None:
        self._record = defaultdict(lambda: RunningAverage(self.window))


def collect_env() -> Dict[str, Any]:
    """Environment fingerprint (reference ``collect_env.py``)."""
    import platform
    import sys

    import jax

    env: Dict[str, Any] = {
        "sys.platform": sys.platform,
        "Python": sys.version.replace("\n", ""),
        "platform": platform.platform(),
        "JAX": jax.__version__,
        "jax_backend": jax.default_backend(),
        "devices": [str(d) for d in jax.devices()],
    }
    try:
        import flax

        env["flax"] = flax.__version__
    except Exception:
        pass
    try:
        import cv2

        env["OpenCV"] = cv2.__version__
    except Exception:
        pass
    env["NumPy"] = np.__version__
    import probpose_code_tpu

    env["probpose_code_tpu"] = getattr(probpose_code_tpu, "__version__", "0.1.0")
    return env


def register_all_modules(init_default_scope: bool = True) -> None:
    """Import every subpackage so all registry entries exist (reference
    ``setup_env.py:55``)."""
    import probpose_code_tpu.apis  # noqa: F401  (inferencers)
    import probpose_code_tpu.codecs  # noqa: F401
    import probpose_code_tpu.datasets  # noqa: F401
    import probpose_code_tpu.engine  # noqa: F401
    import probpose_code_tpu.evaluation  # noqa: F401
    import probpose_code_tpu.models  # noqa: F401
    import probpose_code_tpu.visualization  # noqa: F401


def reduce_mean(value):
    """Cross-device mean (reference ``dist_utils.py:5-11``).

    Inside a jitted program use ``jax.lax.pmean``; at the host level the
    global batch already spans all devices under pjit, so this is the
    identity unless running under ``jax.distributed`` with host-local data.
    """
    import jax
    import jax.numpy as jnp

    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        return multihost_utils.process_allgather(jnp.asarray(value)).mean()
    return value


def all_gather_object(obj):
    """Gather an arbitrary picklable object from every process.

    Returns ``[obj_rank0, obj_rank1, ...]`` on every process (the reference
    gathers metric results across ranks the same way — mmengine
    ``collect_results`` over torch.distributed, consumed at
    ``coco_metric.py:118`` via ``collect_device``). Implemented as pickled
    bytes padded to the global max and exchanged with
    ``multihost_utils.process_allgather``; single-process returns ``[obj]``.
    """
    import jax

    if jax.process_count() == 1:
        return [obj]
    import pickle

    from jax.experimental import multihost_utils

    payload = np.frombuffer(pickle.dumps(obj), dtype=np.uint8)
    sizes = np.asarray(
        multihost_utils.process_allgather(np.asarray([payload.size], np.int64))
    ).reshape(-1)
    buf = np.zeros(int(sizes.max()), np.uint8)
    buf[: payload.size] = payload
    gathered = np.asarray(multihost_utils.process_allgather(buf)).reshape(len(sizes), -1)
    return [pickle.loads(gathered[i, : int(sizes[i])].tobytes()) for i in range(len(sizes))]


def to_numpy(x, return_device: bool = False, unzip: bool = False):
    """Device/tracer-safe numpy conversion (reference ``tensor_utils.py``)."""
    arr = np.asarray(x)
    if unzip:
        return [np.asarray(v) for v in x]
    return (arr, "jax") if return_device else arr
