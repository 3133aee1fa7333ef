"""Dataset meta-information: keypoint definitions, skeletons, OKS sigmas.

Equivalent of the reference's ``configs/_base_/datasets/*.py`` metainfo files
plus the parser ``mmpose/datasets/datasets/utils.py:9`` (parse_pose_metainfo).
Metainfo lives as plain dicts in this package (registered by name) and can
also be loaded from config files via ``{"from_file": path}``.
"""

from __future__ import annotations

import os.path as osp
from typing import Dict, Optional

import numpy as np

from .coco import COCO_METAINFO
from .coco_crop import COCO_CROP_METAINFO

DATASET_METAINFO: Dict[str, dict] = {
    "coco": COCO_METAINFO,
    "coco_crop": COCO_CROP_METAINFO,
}

_DATA_DIR = osp.join(osp.dirname(osp.abspath(__file__)), "data")


def available_metainfo() -> list:
    """All dataset metainfo names (built-in + extracted JSON tables)."""
    names = set(DATASET_METAINFO)
    if osp.isdir(_DATA_DIR):
        names.update(f[:-5] for f in __import__("os").listdir(_DATA_DIR) if f.endswith(".json"))
    return sorted(names)


def _load_json_metainfo(name: str) -> Optional[dict]:
    path = osp.join(_DATA_DIR, f"{name}.json")
    if not osp.isfile(path):
        return None
    import json

    with open(path) as f:
        info = json.load(f)
    # JSON round-trip stringifies int keys of keypoint_info/skeleton_info
    for key in ("keypoint_info", "skeleton_info"):
        if key in info:
            info[key] = {int(k): v for k, v in info[key].items()}
    return info


def get_metainfo(name: str) -> dict:
    """Raw metainfo dict by dataset name (JSON tables loaded lazily)."""
    if name in DATASET_METAINFO:
        return DATASET_METAINFO[name]
    info = _load_json_metainfo(name)
    if info is None:
        raise KeyError(f"no metainfo table for dataset '{name}'")
    DATASET_METAINFO[name] = info
    return info


def register_metainfo(name: str, metainfo: dict) -> None:
    DATASET_METAINFO[name] = metainfo


def parse_pose_metainfo(metainfo: dict) -> dict:
    """Normalize raw dataset metainfo into the framework's parsed form.

    Accepts ``{"from_file": <config path>}`` (loads ``dataset_info`` from the
    file), ``{"dataset_name": <registered name>}`` shortcuts, or a full raw
    metainfo dict with keypoint_info/skeleton_info/joint_weights/sigmas.
    """
    if "from_file" in metainfo:
        cfg_file = metainfo["from_file"]
        if not osp.isfile(cfg_file):
            # fall back to a registered metainfo matching the file stem
            stem = osp.splitext(osp.basename(cfg_file))[0]
            metainfo = get_metainfo(stem)
        else:
            from probpose_code_tpu.config import Config

            metainfo = Config.fromfile(cfg_file)["dataset_info"]
    elif set(metainfo.keys()) == {"dataset_name"}:
        metainfo = get_metainfo(metainfo["dataset_name"])

    for key in ("dataset_name", "keypoint_info", "skeleton_info", "joint_weights", "sigmas"):
        assert key in metainfo, f"metainfo missing required key {key}"

    parsed: dict = dict(
        dataset_name=metainfo["dataset_name"],
        num_keypoints=len(metainfo["keypoint_info"]),
        keypoint_id2name={},
        keypoint_name2id={},
        upper_body_ids=[],
        lower_body_ids=[],
        flip_indices=[],
        flip_pairs=[],
        keypoint_colors=[],
        num_skeleton_links=len(metainfo["skeleton_info"]),
        skeleton_links=[],
        skeleton_link_colors=[],
    )

    for kpt_id, kpt in metainfo["keypoint_info"].items():
        name = kpt["name"]
        parsed["keypoint_id2name"][kpt_id] = name
        parsed["keypoint_name2id"][name] = kpt_id
        parsed["keypoint_colors"].append(kpt.get("color", [255, 128, 0]))
        kpt_type = kpt.get("type", "")
        if kpt_type == "upper":
            parsed["upper_body_ids"].append(kpt_id)
        elif kpt_type == "lower":
            parsed["lower_body_ids"].append(kpt_id)
        swap = kpt.get("swap", "")
        if swap in ("", name):
            parsed["flip_indices"].append(name)
        else:
            parsed["flip_indices"].append(swap)
            pair = (swap, name)
            if pair not in parsed["flip_pairs"]:
                parsed["flip_pairs"].append(pair)

    for _, sk in metainfo["skeleton_info"].items():
        parsed["skeleton_links"].append(sk["link"])
        parsed["skeleton_link_colors"].append(sk.get("color", [96, 96, 255]))

    parsed["dataset_keypoint_weights"] = np.array(metainfo["joint_weights"], dtype=np.float32)
    parsed["sigmas"] = np.array(metainfo["sigmas"], dtype=np.float32)
    if "stats_info" in metainfo:
        parsed["stats_info"] = {k: np.array(v, dtype=np.float32) for k, v in metainfo["stats_info"].items()}

    name2id = parsed["keypoint_name2id"]
    parsed["flip_pairs"] = [(name2id[a], name2id[b]) for a, b in parsed["flip_pairs"]]
    parsed["flip_indices"] = [name2id[n] for n in parsed["flip_indices"]]
    parsed["skeleton_links"] = [(name2id[a], name2id[b]) for a, b in parsed["skeleton_links"]]
    parsed["keypoint_colors"] = np.array(parsed["keypoint_colors"], dtype=np.uint8)
    parsed["skeleton_link_colors"] = np.array(parsed["skeleton_link_colors"], dtype=np.uint8)
    return parsed
