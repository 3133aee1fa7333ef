"""Image loading transform (reference ``datasets/transforms/loading.py:12``).

Loads BGR uint8 via OpenCV (same convention as the reference's mmcv backend);
optional ``pad_to_aspect_ratio`` zero... white-pads the image so the
ProbPose activation window (3/4 aspect, 1.25 padding) is never cut off.

``lazy=True`` defers JPEG decoding to the native fused decode+warp kernel in
``TopdownAffine`` (csrc/image_pipeline.cpp): only the header is parsed here,
``results["img"]`` becomes a zero-stride dummy of the right shape, and the
raw bytes travel in ``results["img_bytes"]``. Pixel-touching transforms call
:func:`materialize_image` first, so lazy mode composes safely with any
pipeline (it just loses the fusion win when materialized early).
"""

from __future__ import annotations

from typing import Optional

import cv2
import numpy as np

from probpose_code_tpu.datasets import native_decode
from probpose_code_tpu.registry import TRANSFORMS
from probpose_code_tpu.structures.keypoint import fix_bbox_aspect_ratio


def materialize_image(results: dict) -> dict:
    """Decode a lazily-loaded image in place, re-applying any flip recorded
    since loading (RandomFlip only flips the zero-stride dummy). No-op when
    the image is already real."""
    data = results.pop("img_bytes", None)
    if data is None:
        return results
    img = cv2.imdecode(np.frombuffer(data, np.uint8), cv2.IMREAD_COLOR)
    if img is None:
        raise ValueError(f"failed to decode lazily-loaded image {results.get('img_path')}")
    if results.get("flip", False):
        direction = results.get("flip_direction", "horizontal")
        axis = {"horizontal": 1, "vertical": 0}.get(direction, (0, 1))
        img = np.flip(img, axis=axis)
    results["img"] = np.ascontiguousarray(img)
    return results


@TRANSFORMS.register_module()
class LoadImage:
    def __init__(
        self,
        to_float32: bool = False,
        color_type: str = "color",
        pad_to_aspect_ratio: bool = False,
        lazy: bool = False,
        **kwargs,
    ):
        self.to_float32 = to_float32
        self.color_type = color_type
        self.pad_to_aspect_ratio = pad_to_aspect_ratio
        self.lazy = lazy

    def _try_lazy(self, results: dict) -> bool:
        """Header-only JPEG probe; stores bytes + a zero-stride dummy image.
        Returns False when the lazy fast path does not apply (non-JPEG,
        EXIF-rotated, grayscale mode, float mode, aspect padding); in that
        case the already-read bytes are left in ``results["_img_data"]`` so
        the eager path decodes them without a second disk read."""
        if (
            self.to_float32
            or self.color_type != "color"
            or self.pad_to_aspect_ratio
            or not isinstance(results.get("img_path"), str)
        ):
            return False
        try:
            with open(results["img_path"], "rb") as f:
                data = f.read()
        except OSError:
            return False
        info = native_decode.probe(data)
        if info is None or info[2] not in (0, 1):
            # not a decodable JPEG, or EXIF-rotated (cv2.imread applies the
            # rotation; the native kernel does not) -> eager path
            results["_img_data"] = data
            return False
        w, h, _ = info
        results["img_bytes"] = data
        results["img"] = np.broadcast_to(np.zeros(3, np.uint8), (h, w, 3))
        results["img_shape"] = (h, w)
        results["ori_shape"] = (h, w)
        return True

    def __call__(self, results: dict) -> Optional[dict]:
        try:
            if "img" not in results and self.lazy and self._try_lazy(results):
                return results
            if "img" not in results and "_img_data" in results:
                # lazy probe rejected the stream: decode the bytes we already
                # read. cv2.imdecode does NOT apply EXIF rotation, so
                # EXIF-rotated files still go through cv2.imread below.
                data = results.pop("_img_data")
                info = native_decode.probe(data)
                if info is None or info[2] in (0, 1):
                    flag = cv2.IMREAD_COLOR if self.color_type == "color" else cv2.IMREAD_GRAYSCALE
                    img = cv2.imdecode(np.frombuffer(data, np.uint8), flag)
                    if img is not None:
                        results["img"] = img
            if "img" not in results:
                flag = cv2.IMREAD_COLOR if self.color_type == "color" else cv2.IMREAD_GRAYSCALE
                path = results["img_path"]
                if isinstance(path, (list, tuple)):
                    # multi-frame sample (PoseTrack18VideoDataset): center
                    # frame first, supporting frames after
                    imgs = []
                    for p in path:
                        im = cv2.imread(p, flag)
                        if im is None:
                            raise FileNotFoundError(p)
                        imgs.append(im.astype(np.float32) if self.to_float32 else im)
                    results["img"] = imgs
                    results["img_shape"] = imgs[0].shape[:2]
                    results["ori_shape"] = imgs[0].shape[:2]
                    return results
                img = cv2.imread(path, flag)
                if img is None:
                    raise FileNotFoundError(path)
                if self.to_float32:
                    img = img.astype(np.float32)
                results["img"] = img
            else:
                img = results["img"]
                assert isinstance(img, np.ndarray)
                if self.to_float32:
                    img = img.astype(np.float32)
                    results["img"] = img
                results.setdefault("img_path", None)
            results["img_shape"] = results["img"].shape[:2]
            results["ori_shape"] = results["img"].shape[:2]

            if self.pad_to_aspect_ratio:
                abox_xyxy = fix_bbox_aspect_ratio(
                    results["bbox"], aspect_ratio=3 / 4, padding=1.25, bbox_format="xyxy"
                ).flatten()
                x_pad = np.array(
                    [max(0, -abox_xyxy[0]), max(0, abox_xyxy[2] - results["img_shape"][1])], dtype=int
                )
                y_pad = np.array(
                    [max(0, -abox_xyxy[1]), max(0, abox_xyxy[3] - results["img_shape"][0])], dtype=int
                )
                img = np.pad(
                    results["img"],
                    ((y_pad[0], y_pad[1]), (x_pad[0], x_pad[1]), (0, 0)),
                    mode="constant",
                    constant_values=255,
                )
                results["img"] = img

                bbox = np.array(results["bbox"]).flatten()
                bbox[:2] += np.array([x_pad[0], y_pad[0]])
                bbox[2:] += np.array([x_pad[0], y_pad[0]])
                results["bbox"] = bbox.reshape(np.array(results["bbox"]).shape)

                kpts = np.array(results["keypoints"]).reshape(-1, 2)
                kpts[:, :2] += np.array([x_pad[0], y_pad[0]])
                results["keypoints"] = kpts.reshape(np.array(results["keypoints"]).shape)

                results["img_shape"] = img.shape[:2]
                results["ori_shape"] = img.shape[:2]
        except Exception as e:
            raise type(e)(f"{e} occurs when loading {results.get('img_path')}")
        return results
