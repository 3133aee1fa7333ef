"""Guards for the generated docs/en/dataset_zoo pages
(tools/misc/gen_dataset_zoo_docs.py — reference docs/en/dataset_zoo/*.md)."""

import os.path as osp
import os
import subprocess
import sys

import pytest

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
ZOO = osp.join(REPO, "docs", "en", "dataset_zoo")

PAGES = [
    "2d_body_keypoint", "2d_wholebody_keypoint", "2d_face_keypoint",
    "2d_hand_keypoint", "2d_fashion_landmark", "2d_animal_keypoint",
    "3d_body_keypoint", "3d_hand_keypoint", "3d_wholebody_keypoint",
    "3d_body_mesh",
]


def test_all_area_pages_exist_with_layouts():
    for stem in PAGES:
        path = osp.join(ZOO, stem + ".md")
        assert osp.exists(path), f"missing dataset_zoo page {stem}.md"
    body = open(osp.join(ZOO, "2d_body_keypoint.md")).read()
    # the core body datasets must be documented with a derived layout tree
    for name in ("## COCO", "## MPII", "## CrowdPose", "## PoseTrack18", "## CropCOCO"):
        assert name in body, name
    assert "person_keypoints_val2017.json" in body
    assert "```text" in body


def test_every_info_entry_converter_exists():
    """Converter pointers in the generator table must reference real tools."""
    sys.path.insert(0, osp.join(REPO, "tools", "misc"))
    import gen_dataset_zoo_docs as gen

    for name, _, _, converter in gen.INFO.values():
        if converter:
            tool = converter.split()[0]
            assert osp.exists(osp.join(REPO, tool)), f"{name}: {tool} missing"


@pytest.mark.slow
def test_pages_not_stale():
    r = subprocess.run(
        [sys.executable, "tools/misc/gen_dataset_zoo_docs.py", "--check"],
        cwd=REPO, capture_output=True, text=True, timeout=900,
    )
    assert r.returncode == 0, r.stderr[-1500:]


def test_api_reference_exists():
    path = osp.join(REPO, "docs", "en", "api.md")
    assert osp.exists(path)
    body = open(path).read()
    for section in ("## probpose_code_tpu.apis", "## probpose_code_tpu.codecs",
                    "## Registry hubs", "### MODELS", "### KEYPOINT_CODECS"):
        assert section in body, section


@pytest.mark.slow
def test_api_reference_not_stale():
    r = subprocess.run(
        [sys.executable, "tools/misc/gen_api_docs.py", "--check"],
        cwd=REPO, capture_output=True, text=True, timeout=600,
        env=dict(os.environ, JAX_PLATFORMS="cpu"),
    )
    assert r.returncode == 0, r.stderr[-1500:]
