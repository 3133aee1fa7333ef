"""Dataset zoo: COCO-style dataset classes across body / face / hand /
animal / wholebody / fashion tasks.

Parity target: the reference's ~45 dataset classes under
``mmpose/datasets/datasets/``. Most reference classes differ from
BaseCocoStyleDataset only by their METAINFO table (loaded here from the
extracted metainfo JSONs); datasets with distinct annotation layouts get
explicit parse logic (CocoWholeBody-style merged keypoint blocks; MPII-style
center/scale; CrowdPose crowd index is handled by the base parser).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from probpose_code_tpu.registry import DATASETS
from probpose_code_tpu.structures.keypoint import find_min_padding_exact

from .base_dataset import BaseCocoStyleDataset

# class name -> metainfo table name
_SIMPLE_DATASETS = {
    # body
    "MpiiDataset": "mpii",
    "MpiiTrbDataset": "mpii_trb",
    "AicDataset": "aic",
    "CrowdPoseDataset": "crowdpose",
    "OCHumanDataset": "ochuman",
    "JhmdbDataset": "jhmdb",
    "PoseTrack18Dataset": "posetrack18",
    "HumanArtDataset": "humanart",
    "HumanArt21Dataset": "humanart21",
    "ExlposeDataset": "exlpose",
    "MhpDataset": "mhp",
    # face
    "Face300WDataset": "300w",
    "Face300WLPDataset": "300wlp",
    "WFLWDataset": "wflw",
    "AFLWDataset": "aflw",
    "COFWDataset": "cofw",
    "LapaDataset": "lapa",
    "CocoWholeBodyFaceDataset": "coco_wholebody_face",
    # hand
    "OneHand10KDataset": "onehand10k",
    "FreiHandDataset": "freihand2d",
    "Rhd2DDataset": "rhd2d",
    "PanopticHand2DDataset": "panoptic_hand2d",
    "CocoWholeBodyHandDataset": "coco_wholebody_hand",
    # hand-21 subset of Halpe full-body annotations (reference hand5 recipes)
    "HalpeHandDataset": "coco_wholebody_hand",
    "InterHand2DDoubleDataset": "interhand2d",
    # animal
    "AP10KDataset": "ap10k",
    "AnimalPoseDataset": "animalpose",
    "Horse10Dataset": "horse10",
    "MacaqueDataset": "macaque",
    "FlyDataset": "fly",
    "LocustDataset": "locust",
    "ZebraDataset": "zebra",
    "ATRWDataset": "atrw",
    "AnimalKingdomDataset": "ak",
    # wholebody-adjacent
    "HalpeDataset": "halpe",
    "UBody2dDataset": "ubody2d",
    # fashion
    "DeepFashionDataset": "deepfashion_full",
    "DeepFashion2Dataset": "deepfashion2",
}


def _make_dataset_class(class_name: str, metainfo_name: str):
    cls = type(
        class_name,
        (BaseCocoStyleDataset,),
        {
            "METAINFO": dict(dataset_name=metainfo_name),
            "__doc__": f"COCO-style dataset with '{metainfo_name}' metainfo "
                       f"(reference mmpose/datasets/datasets counterpart).",
        },
    )
    return DATASETS.register_module(module=cls, force=True)


_GENERATED = {name: _make_dataset_class(name, meta) for name, meta in _SIMPLE_DATASETS.items()}
globals().update(_GENERATED)


@DATASETS.register_module()
class CocoWholeBodyDataset(BaseCocoStyleDataset):
    """COCO-WholeBody: 133 keypoints merged from body / foot / face / hands
    (reference ``datasets/wholebody/coco_wholebody_dataset.py``)."""

    METAINFO: dict = dict(dataset_name="coco_wholebody")

    def parse_data_info(self, raw_data_info: dict) -> Optional[dict]:
        ann = raw_data_info["raw_ann_info"]
        img = raw_data_info["raw_img_info"]
        if "bbox" not in ann or "keypoints" not in ann:
            return None

        img_w, img_h = img["width"], img["height"]
        x, y, w, h = ann["bbox"]
        x1 = np.clip(x, 0, img_w - 1)
        y1 = np.clip(y, 0, img_h - 1)
        x2 = np.clip(x + w, 0, img_w - 1)
        y2 = np.clip(y + h, 0, img_h - 1)
        bbox = np.array([x1, y1, x2, y2], dtype=np.float32).reshape(1, 4)

        _keypoints = np.array(
            ann["keypoints"] + ann.get("foot_kpts", []) + ann.get("face_kpts", [])
            + ann.get("lefthand_kpts", []) + ann.get("righthand_kpts", []),
            dtype=np.float32,
        ).reshape(1, -1, 3)
        keypoints = _keypoints[..., :2]
        keypoints_visible = np.minimum(1, _keypoints[..., 2])
        keypoints_visibility = (_keypoints[..., 2] == 2).astype(np.float32)

        num_keypoints = int(np.count_nonzero(keypoints_visible))
        area = np.array(ann.get("area", np.clip((x2 - x1) * (y2 - y1) * 0.53, 1.0, None)), dtype=np.float32)
        pad_to_contain = ann.get("pad_to_contain")
        if pad_to_contain is None:
            pad_to_contain = find_min_padding_exact(bbox, _keypoints.reshape(-1, 3))

        return {
            "img_id": ann["image_id"],
            "img_path": img["img_path"],
            "bbox": bbox,
            "bbox_score": np.ones(1, dtype=np.float32),
            "num_keypoints": num_keypoints,
            "keypoints": keypoints,
            "keypoints_visible": keypoints_visible,
            "keypoints_visibility": keypoints_visibility,
            "pad_to_contain": pad_to_contain,
            "area": area,
            "iscrowd": ann.get("iscrowd", 0),
            "segmentation": ann.get("segmentation", None),
            "id": ann["id"],
            "category_id": np.array(ann["category_id"]),
            "raw_ann_info": ann.copy(),
            "source_dataset": self._metainfo["dataset_name"],
        }
