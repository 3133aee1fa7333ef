"""Metafile / model-index machinery (reference ``model-index.yml`` +
``configs/**/*.yml`` + ``apis/inferencers/utils/get_model_alias.py``).

The shipped metafile tree is generated from the reference zoo's published
data by ``tools/misc/generate_metafiles.py`` (benchmark Results, paper
links, torch Weights URLs, inferencer aliases), filtered to recipes that
exist in our config tree.
"""

import os.path as osp

import pytest
import yaml

from probpose_code_tpu.apis.model_index import (
    get_model_aliases,
    load_metafile_index,
    resolve_model_cfg,
)

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))


def _index_imports():
    with open(osp.join(REPO, "model-index.yml")) as f:
        return (yaml.safe_load(f) or {})["Import"]


def test_model_index_imports_exist_and_parse():
    imports = _index_imports()
    assert len(imports) >= 140  # reference ships 147 metafiles
    for rel in imports:
        path = osp.join(REPO, rel)
        assert osp.isfile(path), rel
        with open(path) as f:
            meta = yaml.safe_load(f)
        assert meta.get("Models"), rel


def test_every_metafile_config_exists():
    for rel in _index_imports():
        with open(osp.join(REPO, rel)) as f:
            meta = yaml.safe_load(f)
        for m in meta["Models"]:
            assert osp.isfile(osp.join(REPO, m["Config"])), (rel, m["Config"])
            assert m.get("Name")


def test_metafile_results_cover_baseline_numbers():
    """Spot-check BASELINE.md rows survive in the shipped metafile data."""
    entries = load_metafile_index()
    hrnet_udp = entries["td-hm_hrnet-w32_udp-8xb64-210e_coco-256x192"]
    ap = hrnet_udp["results"][0]["Metrics"]["AP"]
    assert ap == pytest.approx(0.762, abs=1e-6)
    rtmpose_m = entries["rtmpose-m_8xb256-420e_coco-256x192"]
    assert rtmpose_m["results"][0]["Metrics"]["AP"] == pytest.approx(0.746, abs=1e-6)
    assert hrnet_udp["weights"].startswith("https://")


def test_alias_resolution_via_metafiles():
    aliases = get_model_aliases()
    # reference metafile aliases (vitpose_coco.yml, rtmpose_body8-coco.yml...)
    for alias in ("human", "vitpose", "wholebody", "face", "hand", "animal", "rtmo"):
        assert alias in aliases, alias
        path = resolve_model_cfg(alias)
        assert path and osp.isfile(path), alias
    # curated supplement: the flagship has no reference metafile
    assert osp.isfile(resolve_model_cfg("probpose"))
    # metafile entry names resolve directly
    assert osp.isfile(resolve_model_cfg("td-hm_hrnet-w32_8xb64-210e_coco-256x192"))
    assert resolve_model_cfg("not-a-model") is None


def test_generator_tree_is_current():
    """The committed metafile tree matches a fresh generation (when the
    reference checkout is available)."""
    if not osp.isdir("/root/reference/configs"):
        pytest.skip("reference checkout unavailable")
    import subprocess
    import sys

    proc = subprocess.run(
        [sys.executable, osp.join(REPO, "tools/misc/generate_metafiles.py"), "--check"],
        capture_output=True,
        text=True,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
