"""Generate the per-config metafile tree + root model-index.yml.

The reference zoo ships one ``*.yml`` metafile per recipe group
(``/root/reference/configs/**/*.yml``, indexed by
``/root/reference/model-index.yml``) carrying pure DATA: the published
benchmark results, paper links, torch checkpoint URLs, and the short model
aliases the inferencers resolve (reference
``mmpose/apis/inferencers/utils/get_model_alias.py``). This tool imports
that data for every recipe that exists in OUR config tree and writes the
same-schema metafiles beside our configs, plus the root ``model-index.yml``.

The Weights URLs stay the reference's torch releases on purpose: our
``engine.checkpoint.load_torch_checkpoint`` converts them at load time, so a
metafile entry is directly loadable.

Usage:  python tools/misc/generate_metafiles.py [--ref /root/reference] [--check]

``--check`` regenerates in memory and exits nonzero if the committed tree
drifted (used by the test suite).
"""

from __future__ import annotations

import argparse
import os
import os.path as osp
import sys

import yaml

REPO = osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__))))


def load_reference_metafiles(ref_root: str):
    """(relpath -> parsed yaml) for every metafile under the reference configs."""
    out = {}
    cfg_root = osp.join(ref_root, "configs")
    for dirpath, _, files in os.walk(cfg_root):
        for f in sorted(files):
            if not f.endswith(".yml"):
                continue
            p = osp.join(dirpath, f)
            rel = osp.relpath(p, ref_root)
            with open(p) as fh:
                try:
                    out[rel] = yaml.safe_load(fh)
                except yaml.YAMLError as e:  # pragma: no cover - reference data
                    print(f"skip unparseable {rel}: {e}", file=sys.stderr)
    return out


def _repair_config_path(cfg: str, metafile_rel: str, repo_root: str):
    """Fix known upstream metafile path defects; None when unresolvable.

    - ``resnet_debias_coco.yml`` has a ``--`` filename typo,
    - ``cpm_jhmdb.yml`` still lists pre-1.x tree paths
      (``configs/body/2d_kpt_sview_rgb_img/...``) — remap by basename into
      the metafile's own directory.
    """
    if osp.isfile(osp.join(repo_root, cfg)):
        return cfg
    fixed = cfg.replace("--", "-")
    if osp.isfile(osp.join(repo_root, fixed)):
        return fixed
    sibling = osp.join(osp.dirname(metafile_rel), osp.basename(cfg))
    if osp.isfile(osp.join(repo_root, sibling)):
        return sibling
    return None


def filter_to_local_zoo(meta: dict, repo_root: str, metafile_rel: str = ""):
    """Keep Models entries resolvable in our tree (paths repaired, deduped)."""
    if not isinstance(meta, dict):
        return None
    models = []
    seen = set()
    for m in meta.get("Models") or []:
        if not isinstance(m, dict):
            continue
        cfg = _repair_config_path(m.get("Config", ""), metafile_rel, repo_root)
        key = (m.get("Name"), cfg)
        if cfg is None or key in seen:
            continue
        seen.add(key)
        if cfg != m.get("Config"):
            m = dict(m, Config=cfg)
        models.append(m)
    if not models:
        return None
    out = {k: v for k, v in meta.items() if k != "Models"}
    out["Models"] = models
    return out


def generate(ref_root: str, repo_root: str):
    """relpath -> yaml text for every metafile we should ship + the index."""
    files = {}
    imports = []
    for rel, meta in sorted(load_reference_metafiles(ref_root).items()):
        local = filter_to_local_zoo(meta, repo_root, metafile_rel=rel)
        if local is None:
            continue
        files[rel] = yaml.safe_dump(local, sort_keys=False, default_flow_style=False)
        imports.append(rel)
    files["model-index.yml"] = yaml.safe_dump({"Import": imports}, default_flow_style=False)
    return files


def render_model_zoo_doc(files: dict) -> str:
    """docs/en/model_zoo.md: one browsable table per metafile, grouped by
    task tree — generated from the shipped metafile data (the reference
    spreads the same tables over per-recipe ``*.md`` files)."""
    by_tree = {}
    for rel, text in sorted(files.items()):
        if rel == "model-index.yml":
            continue
        meta = yaml.safe_load(text)
        tree = rel.split("/")[1] if rel.count("/") >= 2 else "misc"
        by_tree.setdefault(tree, []).append((rel, meta))

    lines = [
        "# Model Zoo",
        "",
        "Generated from the shipped metafile tree (`model-index.yml` + "
        "`configs/**/*.yml`) by `tools/misc/generate_metafiles.py` — do not "
        "edit by hand. Results are the reference zoo's published numbers; "
        "Weights are torch releases that `init_model` converts on load. "
        "Aliased entries resolve by short name, e.g. `init_model(\"human\")`.",
        "",
    ]
    for tree, metas in sorted(by_tree.items()):
        lines += [f"## {tree}", ""]
        for rel, meta in metas:
            title = osp.splitext(osp.basename(rel))[0]
            lines += [f"### {title}", ""]
            papers = [c.get("Paper", {}).get("Title") for c in meta.get("Collections") or [] if isinstance(c, dict)]
            papers = [p for p in papers if p]
            if papers:
                lines += ["Paper: " + "; ".join(papers), ""]
            lines += ["| Model | Results | Weights |", "|---|---|---|"]
            for m in meta.get("Models") or []:
                name = m.get("Name", "")
                alias = m.get("Alias")
                if alias:
                    alias = [alias] if isinstance(alias, str) else list(alias)
                    name += " (alias: " + ", ".join(alias) + ")"
                results = m.get("Results") or []
                if isinstance(results, dict):
                    results = [results]
                cells = []
                for r in results:
                    metrics = r.get("Metrics") or {}
                    cells.append(
                        r.get("Dataset", "") + ": " + ", ".join(f"{k} {v}" for k, v in list(metrics.items())[:3])
                    )
                weights = m.get("Weights") or ""
                wlink = f"[ckpt]({weights})" if weights else ""
                # the doc lives in docs/en/; config paths are repo-relative
                lines.append(f"| [{name}](../../{m.get('Config', '')}) | {'; '.join(cells)} | {wlink} |")
            lines.append("")
    return "\n".join(lines) + "\n"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref", default="/root/reference")
    ap.add_argument("--check", action="store_true", help="verify the committed tree matches")
    args = ap.parse_args()

    files = generate(args.ref, REPO)
    files["docs/en/model_zoo.md"] = render_model_zoo_doc(files)
    stale = []
    for rel, text in files.items():
        path = osp.join(REPO, rel)
        if args.check:
            if not osp.isfile(path) or open(path).read() != text:
                stale.append(rel)
            continue
        os.makedirs(osp.dirname(path) or ".", exist_ok=True)
        with open(path, "w") as f:
            f.write(text)
    if args.check:
        if stale:
            print(f"{len(stale)} metafiles drifted: {stale[:10]}", file=sys.stderr)
            sys.exit(1)
        print(f"{len(files) - 1} metafiles + model-index.yml up to date")
        return
    print(f"wrote {len(files) - 1} metafiles + model-index.yml")


if __name__ == "__main__":
    main()
