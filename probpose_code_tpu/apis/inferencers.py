"""High-level inferencers: file/folder/video/array inputs -> predictions.

Parity targets: reference ``mmpose/apis/inferencers/`` —
``BaseMMPoseInferencer`` (input enumeration, chunked inference, visualization
+ json dump), ``Pose2DInferencer:125`` (optional detector -> per-bbox
pipeline -> batched forward -> pose NMS), ``MMPoseInferencer`` facade.

Detector integration: the reference uses an mmdet model; here the detector
is pluggable — any callable ``img -> (N, 5) xyxy+score`` — with whole-image
fallback, and detection-bbox json files are supported via ``bboxes=``.
"""

from __future__ import annotations

import glob
import os
import os.path as osp
from typing import Any, Callable, Dict, Generator, List, Optional, Sequence, Union

import numpy as np

from probpose_code_tpu.evaluation.functional.nms import nearby_joints_nms
from probpose_code_tpu.registry import INFERENCERS
from probpose_code_tpu.structures import merge_data_samples

from .inference import inference_topdown, init_model

IMG_EXTS = (".jpg", ".jpeg", ".png", ".bmp", ".webp")


def _webcam_inputs(inputs: str) -> Generator:
    """Frame generator for ``"webcam"`` / ``"webcam:id"`` inputs.

    Parity: reference ``BaseMMPoseInferencer._get_webcam_inputs``
    (``base_mmpose_inferencer.py:216-276``) — camera id parsed from the
    spec, frames streamed until the capture ends or ESC is pressed (the
    key poll is skipped when no GUI backend is available).
    """
    import cv2

    spec = inputs.lower().split(":")
    if len(spec) == 1:
        camera_id = 0
    elif len(spec) == 2 and spec[1].isdigit():
        camera_id = int(spec[1])
    else:
        raise ValueError(f'Expected webcam input to have format "webcam:id", but got "{inputs}"')

    vcap = cv2.VideoCapture(camera_id)
    if not vcap.isOpened():
        import warnings

        warnings.warn(f"Cannot open camera (ID={camera_id})")
        return
    idx = 0
    try:
        while True:
            try:
                if cv2.waitKey(5) & 0xFF == 27:  # ESC closes the stream
                    break
            except cv2.error:
                pass  # headless build: no HighGUI event loop
            ok, frame = vcap.read()
            if not ok:
                break
            yield f"webcam_{idx:06d}", frame
            idx += 1
    finally:
        vcap.release()


def _enumerate_inputs(inputs) -> Generator:
    """Yield (name, BGR image) from path / folder / video / webcam / arrays."""
    import cv2

    if isinstance(inputs, np.ndarray):
        yield "array_0", inputs
        return
    if isinstance(inputs, str) and inputs.lower().startswith("webcam"):
        yield from _webcam_inputs(inputs)
        return
    if isinstance(inputs, (list, tuple)):
        for i, item in enumerate(inputs):
            if isinstance(item, np.ndarray):
                yield f"array_{i}", item
            else:
                yield osp.splitext(osp.basename(item))[0], cv2.imread(item)
        return
    if isinstance(inputs, str):
        if osp.isdir(inputs):
            for path in sorted(glob.glob(osp.join(inputs, "*"))):
                if path.lower().endswith(IMG_EXTS):
                    yield osp.splitext(osp.basename(path))[0], cv2.imread(path)
            return
        if inputs.lower().endswith(IMG_EXTS):
            yield osp.splitext(osp.basename(inputs))[0], cv2.imread(inputs)
            return
        # treat as video
        cap = cv2.VideoCapture(inputs)
        idx = 0
        while True:
            ok, frame = cap.read()
            if not ok:
                break
            yield f"frame_{idx:06d}", frame
            idx += 1
        cap.release()
        return
    raise ValueError(f"Unsupported inputs {type(inputs)}")


@INFERENCERS.register_module()
class Pose2DInferencer:
    def __init__(
        self,
        model: Union[str, dict],
        weights: Optional[str] = None,
        device: Optional[str] = None,
        detector: Optional[Callable] = None,
        det_cat_ids: Sequence[int] = (0,),
        **kwargs,
    ):
        self.model = init_model(model, weights, device)
        self.detector = detector
        self.det_cat_ids = det_cat_ids
        self.visualizer = None

    def _get_visualizer(self):
        if self.visualizer is None:
            from probpose_code_tpu.visualization import PoseLocalVisualizer

            self.visualizer = PoseLocalVisualizer()
            self.visualizer.set_dataset_meta(self.model.metainfo)
        return self.visualizer

    def __call__(
        self,
        inputs,
        bboxes: Optional[Dict[str, np.ndarray]] = None,
        bbox_thr: float = 0.3,
        nms_thr: float = 0.05,
        use_nms: bool = True,
        return_vis: bool = False,
        vis_out_dir: Optional[str] = None,
        pred_out_dir: Optional[str] = None,
        kpt_thr: float = 0.3,
    ) -> List[dict]:
        # whole-image models ignore detector boxes entirely (reference
        # pose2d_inferencer.py: data_mode == 'bottomup' branch) — decide
        # once, and never pay a detector forward for them
        bottomup = (
            getattr(self.model, "onestage", False)
            or getattr(self.model, "head_type", None)
            in ("DEKRHead", "AssociativeEmbeddingHead", "CIDHead", "EDPoseHead", "EDPoseTPUHead")
        )
        outputs = []
        for name, img in _enumerate_inputs(inputs):
            if img is None:
                continue
            if bottomup:
                from .inference import inference_bottomup

                results = inference_bottomup(self.model, img)
            else:
                img_bboxes = None
                if bboxes is not None:
                    img_bboxes = np.asarray(bboxes.get(name, bboxes.get("*", None)))
                elif self.detector is not None:
                    dets = np.asarray(self.detector(img))
                    if dets.size:
                        dets = dets[dets[:, 4] >= bbox_thr][:, :4]
                    img_bboxes = dets if dets is not None and len(dets) else None
                results = inference_topdown(self.model, img, img_bboxes)
            merged = merge_data_samples(results)

            if use_nms and len(results) > 1:
                inst = merged.pred_instances
                kpts_db = [
                    dict(keypoints=np.asarray(inst.keypoints)[i],
                         score=float(np.asarray(inst.keypoint_scores)[i].mean()))
                    for i in range(len(np.asarray(inst.keypoints)))
                ]
                keep = nearby_joints_nms(kpts_db, dist_thr=nms_thr, score_per_joint=False)
                merged.pred_instances = inst[np.asarray(keep, dtype=int)]

            record: Dict[str, Any] = dict(predictions=merged)
            if return_vis or vis_out_dir:
                vis = self._get_visualizer().add_datasample(
                    name, img, merged, kpt_thr=kpt_thr,
                    out_file=osp.join(vis_out_dir, f"{name}.jpg") if vis_out_dir else None,
                )
                if return_vis:
                    record["visualization"] = vis
            if pred_out_dir:
                os.makedirs(pred_out_dir, exist_ok=True)
                import json

                inst = merged.pred_instances
                preds = [
                    dict(
                        keypoints=np.asarray(inst.keypoints)[i].tolist(),
                        keypoint_scores=np.asarray(inst.keypoint_scores)[i].tolist(),
                    )
                    for i in range(len(np.asarray(inst.keypoints)))
                ]
                with open(osp.join(pred_out_dir, f"{name}.json"), "w") as f:
                    json.dump(preds, f)
            outputs.append(record)
        return outputs


@INFERENCERS.register_module()
class MMPoseInferencer:
    """Facade dispatching to 2D (and later 3D) inferencers
    (reference ``apis/inferencers/mmpose_inferencer.py``)."""

    def __init__(
        self,
        pose2d: Optional[Union[str, dict]] = None,
        pose2d_weights: Optional[str] = None,
        pose3d: Optional[Union[str, dict]] = None,
        device: Optional[str] = None,
        **kwargs,
    ):
        assert pose2d is not None, "pose2d config is required"
        self.inferencer = Pose2DInferencer(pose2d, pose2d_weights, device, **kwargs)

    def __call__(self, inputs, **kwargs):
        return self.inferencer(inputs, **kwargs)


@INFERENCERS.register_module()
class Pose3DInferencer:
    """2D-to-3D lifting inferencer (reference
    ``apis/inferencers/pose3d_inferencer.py``): runs a 2D pose model per
    frame, buffers keypoint sequences per track, and lifts them with a
    PoseLifter model.
    """

    def __init__(
        self,
        model: Union[str, dict],
        weights: Optional[str] = None,
        pose2d_model: Union[str, dict, None] = None,
        pose2d_weights: Optional[str] = None,
        device: Optional[str] = None,
        seq_len: int = 27,
        **kwargs,
    ):
        self.lifter = init_model(model, weights, device)
        self.pose2d = (
            Pose2DInferencer(pose2d_model, pose2d_weights, device) if pose2d_model is not None else None
        )
        self.seq_len = seq_len
        self._buffer: List[np.ndarray] = []

    def _lift(self, seq: np.ndarray) -> np.ndarray:
        """(T, K, 2) keypoint sequence -> (K, 3)."""
        import jax.numpy as jnp

        T, K, _ = seq.shape
        inputs = jnp.asarray(seq.reshape(1, T, K * 2), jnp.float32)
        out = self.lifter.forward(self.lifter.variables, inputs)
        return np.asarray(out)[0]

    def __call__(self, inputs, bboxes=None, **kwargs) -> List[dict]:
        outputs = []
        for item in inputs if isinstance(inputs, (list, tuple)) else [inputs]:
            if self.pose2d is not None:
                res2d = self.pose2d(item, bboxes=bboxes, **kwargs)
                kpts2d = np.asarray(res2d[0]["predictions"][0]["keypoints"]) if res2d else None
            else:
                kpts2d = np.asarray(item, np.float32)  # direct (K, 2) keypoints
            if kpts2d is None:
                continue
            kpts2d = kpts2d.reshape(-1, kpts2d.shape[-1])[:, :2]
            self._buffer.append(kpts2d)
            self._buffer = self._buffer[-self.seq_len:]
            seq = np.stack(
                [self._buffer[0]] * (self.seq_len - len(self._buffer)) + self._buffer
            )
            kpts3d = self._lift(seq)
            outputs.append(dict(keypoints_3d=kpts3d, keypoints_2d=kpts2d))
        return outputs


@INFERENCERS.register_module()
class Hand3DInferencer:
    """3D interacting-hand inferencer (reference
    ``apis/inferencers/hand3d_inferencer.py``): runs an InternetHead model on
    hand crops and decodes the 3D heatmap volume + root depth + handedness.
    """

    def __init__(self, model: Union[str, dict], weights: Optional[str] = None,
                 device: Optional[str] = None, **kwargs):
        self.model = init_model(model, weights, device)
        self.decoder = self.model.decoder

    def __call__(self, inputs, **kwargs) -> List[dict]:
        import jax.numpy as jnp

        outputs = []
        for name, img in _enumerate_inputs(inputs):
            if img is None:
                continue
            w, h = self.model.input_size
            import cv2

            crop = cv2.resize(np.asarray(img), (w, h)).astype(np.float32)[None]
            out = self.model.forward(self.model.variables, jnp.asarray(crop))
            hm = np.asarray(out["heatmaps"][0])  # (K, D, Hh, Ww)
            K, D, Hh, Ww = hm.shape
            flat = hm.reshape(K, -1)
            idx = flat.argmax(-1)
            scores = flat[np.arange(K), idx]
            z = idx // (Hh * Ww)
            y = (idx % (Hh * Ww)) // Ww
            x = idx % Ww
            kpts = np.stack([x / Ww * w, y / Hh * h, z.astype(np.float32)], -1)
            outputs.append(dict(
                keypoints=kpts[None],
                keypoint_scores=scores[None],
                rel_root_depth=float(np.asarray(out["root_depth"])[0, 0]),
                hand_type=np.asarray(out["hand_type"])[0],
            ))
        return outputs
