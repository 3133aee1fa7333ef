"""Every dataset metainfo table matches the reference `_base_/datasets`
file of the same name (sigmas, joint weights, keypoint count/order, flip
pairs). The reference files are pure `dataset_info = dict(...)` literals,
exec'd directly — no mmpose import needed."""

import os
import pathlib

import numpy as np
import pytest

REF_DIR = pathlib.Path("/root/reference/configs/_base_/datasets")
OUR_DIR = pathlib.Path(__file__).parent.parent.parent / "probpose_code_tpu/datasets/metainfo/data"

pytestmark = pytest.mark.skipif(not REF_DIR.is_dir(), reason="reference checkout not available")

NAMES = sorted(p.stem for p in OUR_DIR.glob("*.json")) if OUR_DIR.is_dir() else []


def _load_ref(name):
    ns = {}
    exec(compile((REF_DIR / f"{name}.py").read_text(), name, "exec"), ns)
    return ns["dataset_info"]


@pytest.mark.parametrize("name", NAMES)
def test_metainfo_matches_reference(name):
    if not (REF_DIR / f"{name}.py").exists():
        pytest.skip(f"no reference file {name}.py")
    import json

    ref = _load_ref(name)
    ours = json.load(open(OUR_DIR / f"{name}.json"))

    ref_kpts = ref.get("keypoint_info", {})
    our_kpts = ours.get("keypoint_info", {})
    assert len(our_kpts) == len(ref_kpts), "keypoint count"

    # order + names + swap pairs
    for i in range(len(ref_kpts)):
        rk = ref_kpts[i]
        ok = our_kpts.get(str(i), our_kpts.get(i))
        assert ok is not None, f"keypoint {i} missing"
        assert ok["name"] == rk["name"], f"keypoint {i} name"
        assert ok.get("swap", "") == rk.get("swap", ""), f"keypoint {i} swap"

    if "sigmas" in ref:
        np.testing.assert_allclose(ours["sigmas"], ref["sigmas"], atol=1e-8,
                                   err_msg="sigmas")
    if "joint_weights" in ref:
        np.testing.assert_allclose(ours["joint_weights"], ref["joint_weights"],
                                   atol=1e-8, err_msg="joint_weights")
    if "skeleton_info" in ref:
        assert len(ours.get("skeleton_info", {})) == len(ref["skeleton_info"]), "skeleton size"
