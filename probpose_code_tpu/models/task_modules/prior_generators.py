"""Multi-level point prior generator.

Behavioral parity with the reference
``mmpose/models/task_modules/prior_generators/mlvl_point_generator.py:29-140``:
per-level grids of point priors at ``(x + offset) * stride``, optionally with
the stride appended. TPU-native difference: priors are *static* NumPy
constants baked into the jitted program (featmap sizes are static under XLA),
so there is no per-step device work at all.
"""

from __future__ import annotations

from functools import lru_cache
from typing import List, Sequence, Tuple, Union

import numpy as np

from probpose_code_tpu.registry import TASK_UTILS


def _pair(v) -> Tuple[int, int]:
    return tuple(v) if isinstance(v, (tuple, list)) else (int(v), int(v))


@TASK_UTILS.register_module()
class MlvlPointGenerator:
    """Point priors for multi-level feature maps.

    Args:
        strides: per-level stride (int or (w, h) pair)
        offset: normalized offset of each point inside its cell
            (0.5 = cell center). ``centralize_points=True`` forces 0
            (reference ``mlvl_point_generator.py:33`` — RTMO uses this).
    """

    def __init__(
        self,
        strides: Union[List[int], List[Tuple[int, int]]],
        offset: float = 0.5,
        centralize_points: bool = False,
    ):
        self.strides = [_pair(s) for s in strides]
        self.centralize_points = centralize_points
        self.offset = offset if not centralize_points else 0.0

    @property
    def num_levels(self) -> int:
        return len(self.strides)

    def single_level_grid_priors(
        self, featmap_size: Tuple[int, int], level_idx: int, with_stride: bool = False
    ) -> np.ndarray:
        h, w = featmap_size
        stride_w, stride_h = self.strides[level_idx]
        shift_x = (np.arange(w, dtype=np.float32) + self.offset) * stride_w
        shift_y = (np.arange(h, dtype=np.float32) + self.offset) * stride_h
        xx, yy = np.meshgrid(shift_x, shift_y)  # row-major (y outer)
        pts = [xx.reshape(-1), yy.reshape(-1)]
        if with_stride:
            pts.append(np.full(h * w, stride_w, dtype=np.float32))
            pts.append(np.full(h * w, stride_h, dtype=np.float32))
        return np.stack(pts, axis=-1)

    def grid_priors(
        self, featmap_sizes: Sequence[Tuple[int, int]], with_stride: bool = False
    ) -> List[np.ndarray]:
        return [
            self.single_level_grid_priors(tuple(fs), i, with_stride)
            for i, fs in enumerate(featmap_sizes)
        ]

    @lru_cache(maxsize=16)
    def _flat_cached(self, featmap_sizes: tuple, with_stride: bool) -> np.ndarray:
        return np.concatenate(self.grid_priors(list(featmap_sizes), with_stride), axis=0)

    def flat_priors(
        self, featmap_sizes: Sequence[Tuple[int, int]], with_stride: bool = True
    ) -> np.ndarray:
        """All levels concatenated: (N_total, 2 or 4) float32 constant."""
        return self._flat_cached(tuple(tuple(fs) for fs in featmap_sizes), with_stride)
