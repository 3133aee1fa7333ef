"""Data containers: InstanceData / PixelData / PoseDataSample.

These replace the mmengine structures used by the reference
(``mmpose/structures/pose_data_sample.py:9``). They are deliberately simple
numpy-backed attribute dicts: on the TPU path, batched device arrays flow
through jitted programs, and these containers exist at the host boundary for
datasets, evaluation, and the user-facing API — same field names as the
reference so downstream code (CocoMetric, visualizers) reads identically:

- ``gt_instances``: bboxes, keypoints, keypoints_visible, keypoints_visibility
- ``gt_instance_labels``: encoded training targets (keypoint_weights, ...)
- ``gt_fields``: heatmaps
- ``pred_instances``: keypoints, keypoint_scores, keypoints_probs,
  keypoints_visible, keypoints_oks, keypoints_error
- ``pred_fields``: heatmaps
"""

from __future__ import annotations

from typing import Any, Dict, Iterator, List, Optional

import numpy as np


class ElementData:
    """Attribute-dict base with separate metainfo namespace."""

    def __init__(self, metainfo: Optional[Dict[str, Any]] = None, **fields):
        object.__setattr__(self, "_metainfo", dict(metainfo or {}))
        object.__setattr__(self, "_fields", {})
        for k, v in fields.items():
            setattr(self, k, v)

    # -- metainfo ---------------------------------------------------------
    @property
    def metainfo(self) -> Dict[str, Any]:
        return self._metainfo

    def set_metainfo(self, metainfo: Dict[str, Any]) -> None:
        self._metainfo.update(metainfo)

    # -- fields -----------------------------------------------------------
    def __getattr__(self, name: str) -> Any:
        fields = object.__getattribute__(self, "_fields")
        if name in fields:
            return fields[name]
        meta = object.__getattribute__(self, "_metainfo")
        if name in meta:
            return meta[name]
        raise AttributeError(f"{type(self).__name__} has no field '{name}'")

    def __setattr__(self, name: str, value: Any) -> None:
        if name.startswith("_"):
            object.__setattr__(self, name, value)
        else:
            self._fields[name] = value

    def __contains__(self, name: str) -> bool:
        return name in self._fields or name in self._metainfo

    def __getitem__(self, name: str):
        return getattr(self, name)

    def get(self, name: str, default: Any = None) -> Any:
        try:
            return getattr(self, name)
        except AttributeError:
            return default

    def set_field(self, value: Any, name: str) -> None:
        setattr(self, name, value)

    def keys(self):
        return self._fields.keys()

    def items(self):
        return self._fields.items()

    def all_items(self):
        yield from self._fields.items()
        yield from self._metainfo.items()

    def to_dict(self) -> Dict[str, Any]:
        return dict(self._fields)

    def __repr__(self) -> str:
        parts = []
        for k, v in self._fields.items():
            if isinstance(v, np.ndarray):
                parts.append(f"{k}: ndarray{v.shape}")
            else:
                parts.append(f"{k}: {type(v).__name__}")
        return f"{type(self).__name__}({', '.join(parts)})"


class InstanceData(ElementData):
    """Per-instance fields; first dim of every array is num_instances."""

    def __len__(self) -> int:
        for v in self._fields.values():
            if hasattr(v, "__len__"):
                return len(v)
        return 0

    def __getitem__(self, item):
        if isinstance(item, str):
            return getattr(self, item)
        out = InstanceData(metainfo=self._metainfo)
        for k, v in self._fields.items():
            if isinstance(v, np.ndarray):
                sliced = v[item]
                if np.isscalar(item) or (isinstance(item, (int, np.integer))):
                    sliced = sliced[None]
                out.set_field(sliced, k)
            elif isinstance(v, (list, tuple)):
                if isinstance(item, (int, np.integer)):
                    out.set_field([v[item]], k)
                else:
                    idx = np.arange(len(v))[item]
                    out.set_field([v[i] for i in idx], k)
            else:
                out.set_field(v, k)
        return out

    @staticmethod
    def cat(items: List["InstanceData"]) -> "InstanceData":
        out = InstanceData()
        if not items:
            return out
        keys = set(items[0].keys())
        for it in items[1:]:
            keys &= set(it.keys())
        for k in keys:
            vals = [it[k] for it in items]
            if isinstance(vals[0], np.ndarray):
                out.set_field(np.concatenate(vals, axis=0), k)
            elif isinstance(vals[0], (list, tuple)):
                merged: List[Any] = []
                for v in vals:
                    merged.extend(v)
                out.set_field(merged, k)
        return out


class PixelData(ElementData):
    """Dense per-pixel fields, e.g. heatmaps in (C, H, W)."""


class MultilevelPixelData(ElementData):
    """A list of PixelData-style arrays at multiple resolutions."""

    def __init__(self, metainfo=None, **fields):
        super().__init__(metainfo=metainfo, **fields)

    def nlevels(self) -> int:
        for v in self._fields.values():
            if isinstance(v, (list, tuple)):
                return len(v)
        return 0


class PoseDataSample(ElementData):
    """The per-sample data contract flowing through the framework.

    Same composition as reference ``pose_data_sample.py:9``: properties
    ``gt_instances``, ``gt_instance_labels``, ``gt_fields``, ``pred_instances``,
    ``pred_fields`` plus free-form metainfo (img_shape, input_size,
    input_center, input_scale, flip_indices, id, img_id, ...).
    """

    @property
    def gt_instances(self) -> InstanceData:
        return self._fields.setdefault("gt_instances", InstanceData())

    @gt_instances.setter
    def gt_instances(self, value: InstanceData) -> None:
        self._fields["gt_instances"] = value

    @property
    def gt_instance_labels(self) -> InstanceData:
        return self._fields.setdefault("gt_instance_labels", InstanceData())

    @gt_instance_labels.setter
    def gt_instance_labels(self, value: InstanceData) -> None:
        self._fields["gt_instance_labels"] = value

    @property
    def gt_fields(self) -> PixelData:
        return self._fields.setdefault("gt_fields", PixelData())

    @gt_fields.setter
    def gt_fields(self, value) -> None:
        self._fields["gt_fields"] = value

    @property
    def pred_instances(self) -> InstanceData:
        return self._fields.setdefault("pred_instances", InstanceData())

    @pred_instances.setter
    def pred_instances(self, value: InstanceData) -> None:
        self._fields["pred_instances"] = value

    @property
    def pred_fields(self) -> PixelData:
        return self._fields.setdefault("pred_fields", PixelData())

    @pred_fields.setter
    def pred_fields(self, value: PixelData) -> None:
        self._fields["pred_fields"] = value


def merge_data_samples(data_samples: List[PoseDataSample]) -> PoseDataSample:
    """Merge per-instance data samples of one image into a single sample
    (reference ``structures/utils.py:16``)."""
    if not isinstance(data_samples, (list, tuple)) or not data_samples:
        raise ValueError("Invalid input type, should be a non-empty list of PoseDataSample")
    if len(data_samples) == 1:
        return data_samples[0]
    merged = PoseDataSample(metainfo=data_samples[0].metainfo)
    if all("pred_instances" in d._fields for d in data_samples):
        merged.pred_instances = InstanceData.cat([d.pred_instances for d in data_samples])
    if all("gt_instances" in d._fields for d in data_samples):
        merged.gt_instances = InstanceData.cat([d.gt_instances for d in data_samples])
    # merge heatmap fields by pixelwise max over instances, like the reference
    if all("pred_fields" in d._fields and "heatmaps" in d.pred_fields for d in data_samples):
        hms = [np.asarray(d.pred_fields.heatmaps) for d in data_samples]
        merged.pred_fields = PixelData(heatmaps=np.maximum.reduce(hms))
    return merged
