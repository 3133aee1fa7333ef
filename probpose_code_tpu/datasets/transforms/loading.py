"""Image loading transform (reference ``datasets/transforms/loading.py:12``).

Loads BGR uint8 via OpenCV (same convention as the reference's mmcv backend);
optional ``pad_to_aspect_ratio`` zero... white-pads the image so the
ProbPose activation window (3/4 aspect, 1.25 padding) is never cut off.
"""

from __future__ import annotations

from typing import Optional

import cv2
import numpy as np

from probpose_code_tpu.registry import TRANSFORMS
from probpose_code_tpu.structures.keypoint import fix_bbox_aspect_ratio


@TRANSFORMS.register_module()
class LoadImage:
    def __init__(
        self,
        to_float32: bool = False,
        color_type: str = "color",
        pad_to_aspect_ratio: bool = False,
        **kwargs,
    ):
        self.to_float32 = to_float32
        self.color_type = color_type
        self.pad_to_aspect_ratio = pad_to_aspect_ratio

    def __call__(self, results: dict) -> Optional[dict]:
        try:
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
