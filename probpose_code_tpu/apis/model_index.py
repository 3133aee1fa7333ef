"""Model index + alias resolution (metafile machinery parity).

The reference resolves short model aliases ("human", "vitpose", "wholebody",
...) through per-config metafiles indexed by ``model-index.yml``
(``apis/inferencers/utils/get_model_alias.py``: every metafile entry with an
``Alias`` field maps alias -> config Name). This module provides the same
surface over the in-repo config zoo:

- ``MODEL_INDEX``: curated name -> (config path, aliases) entries mirroring
  the reference's aliased metafile entries (the reference's downloadable
  checkpoint URLs are torch releases; load them with
  ``engine.checkpoint.load_torch_checkpoint`` after downloading);
- ``get_model_aliases()``: alias -> config name, reference contract;
- ``resolve_model_cfg(name_or_path)``: alias / config-name / path -> path.
"""

from __future__ import annotations

import os.path as osp
from typing import Dict, Optional

_REPO = osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__))))
_CFG = osp.join(_REPO, "configs")

# name -> dict(config=relative path under configs/, aliases=[...])
# Alias names follow the reference metafiles (rtmpose_body8-coco.yml:44,
# vitpose_coco.yml:82-140, rtmpose_coco-wholebody.yml:4, rtmo_body7.yml:60,
# rtmpose_lapa.yml:4, rtmpose_hand5.yml:10, rtmpose_ap10k.yml:4,
# motionbert_h36m.yml:29, internet_interhand3d.yml:11).
MODEL_INDEX: Dict[str, dict] = {
    "rtmpose-m_8xb256-420e_body8-256x192": dict(
        config="body_2d_keypoint/rtmpose/body8/rtmpose-m_8xb256-420e_body8-256x192.py",
        aliases=["human", "body", "body17"],
    ),
    "rtmpose-m_8xb256-420e_coco-256x192": dict(
        config="body_2d_keypoint/rtmpose/coco/rtmpose-m_8xb256-420e_coco-256x192.py",
        aliases=["rtmpose-m"],
    ),
    "rtmpose-t_8xb256-420e_coco-256x192": dict(
        config="body_2d_keypoint/rtmpose/coco/rtmpose-t_8xb256-420e_coco-256x192.py",
        aliases=["rtmpose-t"],
    ),
    "rtmpose-s_8xb256-420e_coco-256x192": dict(
        config="body_2d_keypoint/rtmpose/coco/rtmpose-s_8xb256-420e_coco-256x192.py",
        aliases=["rtmpose-s"],
    ),
    "rtmpose-l_8xb256-420e_coco-256x192": dict(
        config="body_2d_keypoint/rtmpose/coco/rtmpose-l_8xb256-420e_coco-256x192.py",
        aliases=["rtmpose-l"],
    ),
    "td-pm_ProbPose-small_8xb64-210e_coco-256x192": dict(
        config="body_2d_keypoint/topdown_probmap/coco/td-pm_ProbPose-small_8xb64-210e_coco-256x192.py",
        aliases=["probpose", "probpose-s"],
    ),
    "td-hm_ViTPose-small_8xb64-210e_coco-256x192": dict(
        config="body_2d_keypoint/topdown_heatmap/coco/td-hm_ViTPose-small_8xb64-210e_coco-256x192.py",
        aliases=["vitpose", "vitpose-s"],
    ),
    "td-hm_ViTPose-base_8xb64-210e_coco-256x192": dict(
        config="body_2d_keypoint/topdown_heatmap/coco/td-hm_ViTPose-base_8xb64-210e_coco-256x192.py",
        aliases=["vitpose-b"],
    ),
    "td-hm_ViTPose-large_8xb32-210e_coco-192x256": dict(
        config="body_2d_keypoint/topdown_heatmap/coco/td-hm_ViTPose-large_8xb32-210e_coco-192x256.py",
        aliases=["vitpose-l"],
    ),
    "td-hm_ViTPose-huge_8xb32-210e_coco-192x256": dict(
        config="body_2d_keypoint/topdown_heatmap/coco/td-hm_ViTPose-huge_8xb32-210e_coco-192x256.py",
        aliases=["vitpose-h"],
    ),
    "td-hm_hrnet-w32_8xb64-210e_coco-256x192": dict(
        config="body_2d_keypoint/topdown_heatmap/coco/td-hm_hrnet-w32_8xb64-210e_coco-256x192.py",
        aliases=["hrnet", "hrnet-w32"],
    ),
    "rtmo-l_16xb16-600e_coco-640x640": dict(
        config="body_2d_keypoint/rtmo/coco/rtmo-l_16xb16-600e_coco-640x640.py",
        aliases=["rtmo"],
    ),
    "rtmpose-m_8xb64-270e_coco-wholebody-256x192": dict(
        config="wholebody_2d_keypoint/rtmpose/coco-wholebody/rtmpose-m_8xb64-270e_coco-wholebody-256x192.py",
        aliases=["wholebody"],
    ),
    "rtmw-x_8xb704-270e_cocktail14-256x192": dict(
        config="wholebody_2d_keypoint/rtmpose/cocktail14/rtmw-x_8xb704-270e_cocktail14-256x192.py",
        aliases=["wholebody-x", "rtmw"],
    ),
    "rtmpose-m_8xb64-120e_lapa-256x256": dict(
        config="face_2d_keypoint/rtmpose/lapa/rtmpose-m_8xb64-120e_lapa-256x256.py",
        aliases=["face"],
    ),
    "rtmpose-m_8xb32-210e_coco-wholebody-hand-256x256": dict(
        config="hand_2d_keypoint/rtmpose/coco_wholebody_hand/rtmpose-m_8xb32-210e_coco-wholebody-hand-256x256.py",
        aliases=["hand"],
    ),
    "td-hm_hrnet-w32_8xb64-210e_ap10k-256x256": dict(
        config="animal_2d_keypoint/topdown_heatmap/ap10k/td-hm_hrnet-w32_8xb64-210e_ap10k-256x256.py",
        aliases=["animal"],
    ),
    "motionbert-243frm_8xb32-120e_h36m": dict(
        config="body_3d_keypoint/motionbert/h36m/motionbert-243frm_8xb32-120e_h36m.py",
        aliases=["human3d"],
    ),
    "internet_res50_4xb16-20e_interhand3d-256x256": dict(
        config="hand_3d_keypoint/internet/interhand3d/internet_res50_4xb16-20e_interhand3d-256x256.py",
        aliases=["hand3d"],
    ),
}


def get_model_aliases() -> Dict[str, str]:
    """alias -> config Name (reference ``get_model_aliases`` contract)."""
    out = {}
    for name, entry in MODEL_INDEX.items():
        for alias in entry.get("aliases", []):
            out[alias] = name
    return out


def resolve_model_cfg(name_or_path: str) -> Optional[str]:
    """Resolve an alias / metafile name / path to a config file path.

    Returns None when the input is not an index entry (callers then treat
    it as a literal path)."""
    if osp.exists(name_or_path):
        return name_or_path
    if name_or_path in MODEL_INDEX:
        return osp.join(_CFG, MODEL_INDEX[name_or_path]["config"])
    aliases = get_model_aliases()
    if name_or_path in aliases:
        return osp.join(_CFG, MODEL_INDEX[aliases[name_or_path]]["config"])
    return None
