"""Camera models for 3D pose projection.

Parity target: reference ``mmpose/utils/camera.py`` (SimpleCamera /
SimpleCameraTorch): world<->camera rigid transform and camera->pixel
projection with optional radial/tangential distortion.
"""

from __future__ import annotations

import numpy as np


class SimpleCamera:
    """Pinhole camera with COCO-style parameter dict.

    param keys: R (3x3), T (3x1), f (2x1), c (2x1), optionally k (radial)
    and p (tangential) distortion; or K (2x3 intrinsic matrix) instead of
    f/c. Coordinates are row vectors: X_cam = (X_world - T) @ R.T per the
    reference convention (R, T given world->camera).
    """

    def __init__(self, param: dict):
        self.param = {k: np.array(v) for k, v in param.items()}
        assert "R" in param and "T" in param
        self.R = np.array(param["R"]).reshape(3, 3)
        self.T = np.array(param["T"]).reshape(3, 1)
        if "K" in param:
            K = np.array(param["K"]).reshape(2, 3)
            self.f = np.array([K[0, 0], K[1, 1]]).reshape(2, 1)
            self.c = np.array([K[0, 2], K[1, 2]]).reshape(2, 1)
        else:
            assert "f" in param and "c" in param
            self.f = np.array(param["f"]).reshape(2, 1)
            self.c = np.array(param["c"]).reshape(2, 1)
        self.k = np.array(param["k"]).flatten() if "k" in param else None
        self.p = np.array(param["p"]).flatten() if "p" in param else None

    def world_to_camera(self, X: np.ndarray) -> np.ndarray:
        assert X.shape[-1] == 3
        return (X - self.T.T) @ self.R.T

    def camera_to_world(self, X: np.ndarray) -> np.ndarray:
        assert X.shape[-1] == 3
        return X @ self.R + self.T.T

    def camera_to_pixel(self, X: np.ndarray) -> np.ndarray:
        assert X.shape[-1] == 3
        _X = X[..., :2] / X[..., 2:]
        if self.k is not None and self.p is not None:
            r2 = (_X**2).sum(-1)
            radial = 1 + sum(ki * r2 ** (i + 1) for i, ki in enumerate(self.k[:3]))
            if self.k.size == 5:
                radial += self.k[3] * r2**4 + self.k[4] * r2**5
            tangential = 2 * (self.p[1] * _X[..., 0] + self.p[0] * _X[..., 1])
            _X = _X * (radial + tangential)[..., None] + np.outer(r2, self.p[::-1]).reshape(_X.shape)
        return _X * self.f.T + self.c.T

    def pixel_to_camera(self, X: np.ndarray) -> np.ndarray:
        """(N, 3) pixels with depth in the 3rd column -> camera frame."""
        assert X.shape[-1] == 3
        _X = X.copy()
        _X[..., :2] = (X[..., :2] - self.c.T) / self.f.T * X[..., 2:]
        return _X
