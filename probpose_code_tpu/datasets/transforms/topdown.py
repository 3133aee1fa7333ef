"""TopdownAffine: crop the bbox region into the model input frame.

Parity target: reference ``datasets/transforms/topdown_transforms.py:14``
(the ProbPose fork variant which re-derives center/scale from the padded
``bbox_xyxy_wrt_input``, builds a bbox coverage mask, and records
input_center/input_scale/input_size).

Host path uses cv2.warpAffine for training-pipeline parity; the device path
(ops.warp.warp_affine_batch) performs the same warp inside the serving
program.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import cv2
import numpy as np

from probpose_code_tpu.registry import TRANSFORMS
from probpose_code_tpu.structures.bbox import (
    bbox_xyxy2cs,
    get_udp_warp_matrix,
    get_warp_matrix,
)


@TRANSFORMS.register_module()
class TopdownAffine:
    """``device_warp=True`` defers the image warp to the device program:
    instead of ``cv2.warpAffine`` (the hottest host op, reference
    ``topdown_transforms.py:126``), the transform pastes the warp's source
    region-of-interest into a fixed-size uint8 ``canvas`` and emits the
    composed ``warp_mat`` (canvas -> crop); the jitted train step then runs
    ``ops.warp.warp_affine_batch`` fused with the model forward. The ROI is
    pasted 1:1 whenever it fits ``canvas_size`` (numerically equivalent
    sampling), and only downscaled — with the scale folded into the warp
    matrix — when it does not. ``bbox_mask`` is not produced in this mode.
    """

    def __init__(
        self,
        input_size: Tuple[int, int],
        input_padding: float = 1.25,
        use_udp: bool = False,
        device_warp: bool = False,
        canvas_size: Tuple[int, int] = (640, 640),
        with_bbox_mask: bool = True,
        fast_decode: bool = False,
    ):
        assert len(input_size) == 2
        self.input_size = input_size
        self.use_udp = use_udp
        self.input_padding = input_padding
        self.device_warp = device_warp
        self.canvas_size = tuple(canvas_size)
        # the warped bbox coverage mask costs a second cv2.warpAffine per
        # sample but is only consumed by the DoubleProbMap family; pipelines
        # that don't need it can switch it off
        self.with_bbox_mask = with_bbox_mask
        # lazy-loaded samples (LoadImage(lazy=True)) may additionally decode
        # at a DCT-domain 1/2..1/8 scale when the warp downsamples >= 2x —
        # a training-quality approximation (off = bit-parity with cv2)
        self.fast_decode = fast_decode

    def _make_canvas(self, img: np.ndarray, warp_mat: np.ndarray, dst_size: Tuple[int, int]):
        """Extract the warp's source ROI into the fixed canvas and compose
        the canvas -> crop affine. Returns (canvas uint8 (Hc, Wc, 3),
        mat (2, 3) float32)."""
        cw, ch = self.canvas_size
        img_h, img_w = img.shape[:2]
        w, h = dst_size

        inv = cv2.invertAffineTransform(warp_mat.astype(np.float64))
        corners = np.array(
            [[-0.5, -0.5], [w - 0.5, -0.5], [w - 0.5, h - 0.5], [-0.5, h - 0.5]], np.float64
        )
        src = corners @ inv[:, :2].T + inv[:, 2]
        x0 = int(np.clip(np.floor(src[:, 0].min()) - 1, 0, img_w))
        y0 = int(np.clip(np.floor(src[:, 1].min()) - 1, 0, img_h))
        x1 = int(np.clip(np.ceil(src[:, 0].max()) + 2, 0, img_w))
        y1 = int(np.clip(np.ceil(src[:, 1].max()) + 2, 0, img_h))

        roi = img[y0:y1, x0:x1]
        rh, rw = roi.shape[:2]
        canvas = np.zeros((ch, cw, 3), np.uint8)
        f = 1.0
        if rh > 0 and rw > 0:
            if rh > ch or rw > cw:
                f = min(ch / rh, cw / rw)
                roi = cv2.resize(roi, (max(1, int(rw * f)), max(1, int(rh * f))), interpolation=cv2.INTER_LINEAR)
                # the actual integer resize target defines the true scale
                f_x = roi.shape[1] / rw
                f_y = roi.shape[0] / rh
            else:
                f_x = f_y = 1.0
            canvas[: roi.shape[0], : roi.shape[1]] = roi
        else:
            f_x = f_y = 1.0

        # src <- canvas with cv2.resize pixel-center alignment:
        # x_src = (x_c + 0.5) / f_x - 0.5 + x0 ; compose with warp (src -> dst)
        A = np.array(
            [
                [1.0 / f_x, 0.0, x0 + 0.5 / f_x - 0.5],
                [0.0, 1.0 / f_y, y0 + 0.5 / f_y - 0.5],
            ],
            np.float64,
        )
        R = warp_mat[:, :2].astype(np.float64) @ A[:, :2]
        t = warp_mat[:, :2].astype(np.float64) @ A[:, 2] + warp_mat[:, 2]
        mat = np.concatenate([R, t[:, None]], axis=1).astype(np.float32)
        return canvas, mat

    @staticmethod
    def _fix_aspect_ratio(bbox_scale: np.ndarray, aspect_ratio: float) -> np.ndarray:
        w, h = np.hsplit(bbox_scale, [1])
        return np.where(w > h * aspect_ratio, np.hstack([w, w / aspect_ratio]), np.hstack([h * aspect_ratio, h]))

    def __call__(self, results: Dict) -> Optional[dict]:
        w, h = self.input_size
        warp_size = (int(w), int(h))

        # lazy-loaded JPEG (LoadImage(lazy=True)): the native kernel fuses
        # region decode + flip + warp (+ bbox mask); incompatible cases
        # (vertical/diagonal flips, multi-frame, device_warp) materialize
        use_native = (
            "img_bytes" in results
            and not self.device_warp
            and not isinstance(results["img"], list)
            and (not results.get("flip", False) or results.get("flip_direction") == "horizontal")
        )
        if "img_bytes" in results and not use_native:
            from probpose_code_tpu.datasets.transforms.loading import materialize_image

            materialize_image(results)

        first_img = results["img"][0] if isinstance(results["img"], list) else results["img"]
        img_h, img_w = first_img.shape[:2]

        # re-derive center/scale from the (possibly cropped) activation bbox
        _c, _s = bbox_xyxy2cs(np.asarray(results["bbox_xyxy_wrt_input"]), padding=self.input_padding)
        results["bbox_center"] = np.asarray(_c).reshape(1, 2)
        results["bbox_scale"] = np.asarray(_s).reshape(1, 2)

        results["bbox_scale"] = self._fix_aspect_ratio(results["bbox_scale"], aspect_ratio=w / h)

        assert results["bbox_center"].shape[0] == 1, "top-down affine supports single instance only"
        center = results["bbox_center"][0]
        scale = results["bbox_scale"][0]
        rot = results["bbox_rotation"][0] if "bbox_rotation" in results else 0.0

        if self.use_udp:
            warp_mat = get_udp_warp_matrix(center, scale, rot, output_size=(w, h))
        else:
            warp_mat = get_warp_matrix(center, scale, rot, output_size=(w, h))
        warp_mat = warp_mat.astype(np.float32)

        if use_native:
            from probpose_code_tpu.datasets import native_decode
            from probpose_code_tpu.datasets.transforms.loading import materialize_image

            rect = (
                np.asarray(results["bbox_xyxy_wrt_input"], np.float64).flatten()[:4]
                if self.with_bbox_mask
                else None
            )
            out = native_decode.decode_warp(
                results["img_bytes"],
                warp_mat,
                (warp_size[0], warp_size[1]),
                flip_h=bool(results.get("flip", False)),
                fast_scale=self.fast_decode,
                mask_rect=rect,
                img_size=(img_w, img_h),  # probed by LoadImage(lazy=True)
            )
            if out is None:  # native lib unavailable / corrupt stream
                materialize_image(results)
                use_native = False
            else:
                results.pop("img_bytes", None)
                if self.with_bbox_mask:
                    crop, native_mask = out
                    results["bbox_mask"] = native_mask.reshape(1, h, w)
                else:
                    crop = out
                results["img"] = crop

        if use_native:
            pass  # warped above
        elif self.device_warp:
            assert not isinstance(results["img"], list), "device_warp does not support multi-frame inputs"
            canvas, canvas_mat = self._make_canvas(results.pop("img"), warp_mat, (w, h))
            results["canvas"] = canvas
            results["warp_mat"] = canvas_mat
            # rotation-free warps run as MXU matmuls on device (ops.warp.
            # warp_affine_separable); rotated ones need the gather path
            results["warp_separable"] = bool(rot == 0)
        elif isinstance(results["img"], list):
            results["img"] = [
                cv2.warpAffine(img, warp_mat, warp_size, flags=cv2.INTER_LINEAR) for img in results["img"]
            ]
        else:
            if self.with_bbox_mask:
                img_h, img_w = results["img"].shape[:2]
                bbox_xyxy = np.asarray(results["bbox_xyxy_wrt_input"], dtype=np.float64).flatten().copy()
                bbox_xyxy[:2] = np.maximum(bbox_xyxy[:2], 0)
                bbox_xyxy[2:4] = np.minimum(bbox_xyxy[2:4], [img_w, img_h])
                x0, y0, x1, y1 = bbox_xyxy[:4].astype(int)
                bbox_mask = np.zeros((img_h, img_w), dtype=np.uint8)
                bbox_mask[y0:y1, x0:x1] = 1
            results["img"] = cv2.warpAffine(results["img"], warp_mat, warp_size, flags=cv2.INTER_LINEAR)
            if self.with_bbox_mask:
                bbox_mask = cv2.warpAffine(bbox_mask, warp_mat, warp_size, flags=cv2.INTER_LINEAR)
                results["bbox_mask"] = bbox_mask.reshape(1, h, w)

        if results.get("keypoints", None) is not None:
            if results.get("transformed_keypoints", None) is not None:
                transformed_keypoints = results["transformed_keypoints"].copy()
            else:
                transformed_keypoints = results["keypoints"].copy()
            kpts = transformed_keypoints[..., :2]
            transformed_keypoints[..., :2] = kpts @ warp_mat[:, :2].T + warp_mat[:, 2]
            results["transformed_keypoints"] = transformed_keypoints

        if results.get("bbox_xyxy_wrt_input", None) is not None:
            corners = np.asarray(results["bbox_xyxy_wrt_input"], dtype=np.float64).reshape(2, 2)
            corners = corners @ warp_mat[:, :2].T.astype(np.float64) + warp_mat[:, 2]
            results["bbox_xyxy_wrt_input"] = corners.reshape(1, 4)

        results["input_size"] = (w, h)
        results["input_center"] = center
        results["input_scale"] = scale
        return results
