"""Keypoint codec base class (reference ``mmpose/codecs/base.py:14``).

A codec owns the keypoint <-> network-target transformation pair:
``encode`` maps ground-truth keypoints (input-image space) to dense/discrete
training targets; ``decode`` maps network outputs back to keypoints.

TPU extension: codecs may additionally expose ``decode_batch`` — a pure,
jit-compatible function over batched ``jnp`` arrays used inside the device
predict program (so decoding never leaves the chip). The NumPy ``decode``
remains the semantic ground truth.
"""

from __future__ import annotations

from abc import ABCMeta, abstractmethod
from typing import Any, List, Optional, Tuple

import numpy as np


class BaseKeypointCodec(metaclass=ABCMeta):
    """Abstract encode/decode interface."""

    # Keys in the data sample passed to encode() besides keypoints/visible
    auxiliary_encode_keys = set()

    # instance-label / dense-field mapping tables used by GenerateTarget &
    # PackPoseInputs to route encoded entries into the data sample. Empty
    # tables mean "use PackPoseInputs' defaults" (reference base.py:22-23).
    label_mapping_table = dict(keypoint_weights="keypoint_weights")
    field_mapping_table = dict(heatmaps="heatmaps")
    instance_mapping_table = dict()

    # whether decode() accepts batched (B, ...) arrays directly
    support_batch_decoding: bool = False

    @abstractmethod
    def encode(self, keypoints: np.ndarray, keypoints_visible: Optional[np.ndarray] = None) -> dict:
        """Encode keypoints (input-image space) into targets."""

    @abstractmethod
    def decode(self, encoded: Any) -> Tuple[np.ndarray, np.ndarray]:
        """Decode targets into (keypoints, scores) in input-image space."""

    def batch_decode(self, batch_encoded: Any) -> Tuple[List[np.ndarray], List[np.ndarray]]:
        """Decode a batch; default loops ``decode`` per sample."""
        raise NotImplementedError()
