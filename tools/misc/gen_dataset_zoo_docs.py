"""Generate docs/en/dataset_zoo/*.md — per-area dataset preparation pages.

Counterpart of the reference ``docs/en/dataset_zoo/`` tree (10 area pages:
2d_body/face/hand/wholebody/fashion/animal, 3d_body/hand/wholebody, mesh).
Instead of hand-maintaining directory layouts, this generator DERIVES each
dataset's expected on-disk tree from the shipped configs (data_root +
ann_file + data_prefix + bbox_file of every recipe that uses it), so the
docs can never drift from what the code actually reads. Dataset homepages /
download pointers / converter notes live in the table below.

Usage:
    python tools/misc/gen_dataset_zoo_docs.py          # (re)write the pages
    python tools/misc/gen_dataset_zoo_docs.py --check  # fail if stale
"""

import argparse
import os
import os.path as osp
import sys

REPO = osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__))))
sys.path.insert(0, REPO)

OUT_DIR = osp.join(REPO, "docs", "en", "dataset_zoo")

# page stem -> (title, config subtrees scanned)
AREAS = {
    "2d_body_keypoint": ("2D Body Keypoint Datasets", ["body_2d_keypoint"]),
    "2d_wholebody_keypoint": ("2D Wholebody Keypoint Datasets", ["wholebody_2d_keypoint"]),
    "2d_face_keypoint": ("2D Face Keypoint Datasets", ["face_2d_keypoint"]),
    "2d_hand_keypoint": ("2D Hand Keypoint Datasets", ["hand_2d_keypoint"]),
    "2d_fashion_landmark": ("2D Fashion Landmark Datasets", ["fashion_2d_keypoint"]),
    "2d_animal_keypoint": ("2D Animal Keypoint Datasets", ["animal_2d_keypoint"]),
    "3d_body_keypoint": ("3D Body Keypoint Datasets", ["body_3d_keypoint"]),
    "3d_hand_keypoint": ("3D Hand Keypoint Datasets", ["hand_3d_keypoint"]),
    "3d_wholebody_keypoint": ("3D Wholebody Keypoint Datasets", []),
    "3d_body_mesh": ("3D Body Mesh Recovery Datasets", []),
}

# dataset class -> (display name, homepage, prep notes [may be ""], converter)
INFO = {
    "CocoDataset": ("COCO", "http://cocodataset.org/",
                    "Download 2017 Train/Val images + person keypoint annotations from the COCO "
                    "download page. Top-down eval with detector boxes additionally needs "
                    "`COCO_val2017_detections_AP_H_56_person.json` (the standard person detection "
                    "results used across the model zoo; any detector output converted with "
                    "`tools/misc/generate_bbox_file.py` works too).", None),
    "CocoCropDataset": ("CropCOCO", "https://huggingface.co/datasets/vrg-prague/CropCOCO",
                        "ProbPose's out-of-image evaluation set — COCO val2017 crops with keypoints "
                        "annotated outside the crop. Download from the VRG Hugging Face page.", None),
    "MpiiDataset": ("MPII", "http://human-pose.mpi-inf.mpg.de/",
                    "Images from the MPII site; json annotations converted from the original mats "
                    "(the widely used mmpose-format `mpii_{train,val,test}.json` + `mpii_gt_val.mat` "
                    "for PCKh eval).", None),
    "MpiiTrbDataset": ("MPII-TRB", "https://github.com/kennymckormick/Triplet-Representation-of-human-Body",
                       "Uses MPII images with TRB annotation jsons from the project page.", None),
    "AicDataset": ("AI Challenger", "https://github.com/AIChallenger/AI_Challenger_2017",
                   "AIC keypoint train/val images + converted COCO-style jsons.", None),
    "CrowdPoseDataset": ("CrowdPose", "https://github.com/Jeff-sjtu/CrowdPose",
                         "Images + mmpose-format jsons; top-down eval uses YOLOv3 detections "
                         "(`det_for_crowd_test_0.1_0.5.json`).", None),
    "OCHumanDataset": ("OCHuman", "https://github.com/liruilong940607/OCHumanApi",
                       "Val/test images + `ochuman_coco_format_{val,test}_range_0.00_1.00.json`.", None),
    "MhpDataset": ("MHP", "https://lv-mhp.github.io/dataset",
                   "LV-MHP v2 images with converted COCO-style keypoint jsons.", None),
    "HumanArtDataset": ("Human-Art", "https://idea-research.github.io/HumanArt/",
                        "Request/download images per the project page; jsons ship with the dataset.", None),
    "ExlposeDataset": ("ExLPose", "http://cg.postech.ac.kr/research/ExLPose/",
                       "Low-light/well-lit image pairs + ExLPose annotation jsons.", None),
    "PoseTrack18Dataset": ("PoseTrack18", "https://posetrack.net/users/download.php",
                           "Images + per-video mmpose-format jsons (converted from the official "
                           "release); mask files for train. The PoseTrack18 metric evaluates with "
                           "the native poseval-protocol implementation.", None),
    "PoseTrack18VideoDataset": ("PoseTrack18 (video)", "https://posetrack.net/users/download.php",
                                "Same data as PoseTrack18; the video dataset samples multi-frame "
                                "inputs for PoseWarper-style models.", None),
    "JhmdbDataset": ("sub-JHMDB", "http://jhmdb.is.tue.mpg.de/dataset",
                     "Rename_Images + converted sub-split jsons.", None),
    "CocoWholeBodyDataset": ("COCO-WholeBody", "https://github.com/jin-s13/COCO-WholeBody/",
                             "COCO 2017 images + COCO-WholeBody annotation jsons from the project page.", None),
    "HalpeDataset": ("Halpe", "https://github.com/Fang-Haoshu/Halpe-FullBody/",
                     "HICO-DET train images + COCO val2017 images; Halpe 136-keypoint jsons.", None),
    "UBody2dDataset": ("UBody", "https://github.com/IDEA-Research/OSX",
                       "Download UBody videos + SMPLX annotations, then run the converters.",
                       "tools/dataset_converters/ubody_kpts_to_coco.py (and ubody_smplx_to_coco.py "
                       "for the 3D variant) after extracting frames"),
    "Face300WDataset": ("300W", "https://ibug.doc.ic.ac.uk/resources/300-W/",
                        "ibug 300W images; mmpose-format jsons (converted from the official pts).", None),
    "Face300WLPDataset": ("300W-LP", "http://www.cbsr.ia.ac.cn/users/xiangyuzhu/projects/3DDFA/main.htm",
                          "300W-LP synthesized large-pose faces.",
                          "tools/dataset_converters/300wlp2coco.py"),
    "WFLWDataset": ("WFLW", "https://wywu.github.io/projects/LAB/WFLW.html",
                    "WFLW images + converted jsons.", None),
    "AFLWDataset": ("AFLW", "https://www.tugraz.at/institute/icg/research/team-bischof/lrs/downloads/aflw/",
                    "AFLW images; annotations converted from the sqlite/mat release.",
                    "tools/dataset_converters/mat2json.py"),
    "COFWDataset": ("COFW", "http://www.vision.caltech.edu/xpburgos/ICCV13/",
                    "COFW color mats converted to images + jsons.",
                    "tools/dataset_converters/parse_cofw_dataset.py"),
    "LapaDataset": ("LaPa", "https://github.com/JDAI-CV/lapa-dataset",
                    "LaPa 106-landmark release.",
                    "tools/dataset_converters/lapa2coco.py"),
    "CocoWholeBodyFaceDataset": ("COCO-WholeBody-Face", "https://github.com/jin-s13/COCO-WholeBody/",
                                 "Face subset of COCO-WholeBody (same downloads).", None),
    "OneHand10KDataset": ("OneHand10K", "https://www.yangangwang.com/papers/WANG-MCC-2018-10.html",
                          "OneHand10K images + converted jsons.", None),
    "FreiHandDataset": ("FreiHand", "https://lmb.informatik.uni-freiburg.de/projects/freihand/",
                        "FreiHand v2 training set (the eval split has no public keypoints; "
                        "train/val/test are resplit 8:1:1 as in the reference).", None),
    "Rhd2DDataset": ("RHD", "https://lmb.informatik.uni-freiburg.de/resources/datasets/RenderedHandposeDataset.en.html",
                     "Rendered Handpose Dataset v1.1 + converted jsons.", None),
    "Panoptic2DDataset": ("CMU Panoptic HandDB", "http://domedb.perception.cs.cmu.edu/handdb.html",
                          "Hand143_panopticdb (synth) + MPII+NZSL hand subsets.", None),
    "CocoWholeBodyHandDataset": ("COCO-WholeBody-Hand", "https://github.com/jin-s13/COCO-WholeBody/",
                                 "Hand subset of COCO-WholeBody (same downloads).", None),
    "InterHand2DDoubleDataset": ("InterHand2.6M (2D double)", "https://mks0601.github.io/InterHand2.6M/",
                                 "InterHand2.6M v1.0 images + camera/joint/data jsons.", None),
    "DeepFashionDataset": ("DeepFashion", "http://mmlab.ie.cuhk.edu.hk/projects/DeepFashion/LandmarkDetection.html",
                           "Fashion Landmark Detection Benchmark images + converted jsons "
                           "(upper/lower/full splits).", None),
    "DeepFashion2Dataset": ("DeepFashion2", "https://github.com/switchablenorms/DeepFashion2",
                            "DeepFashion2 landmark release; per-category jsons from the project's "
                            "conversion scripts.", None),
    "Ap10kDataset": ("AP-10K", "https://github.com/AlexTheBad/AP-10K",
                     "AP-10K images + official split jsons.", None),
    "AnimalPoseDataset": ("Animal-Pose", "https://sites.google.com/view/animal-pose/",
                          "VOC2012 + project images.",
                          "tools/dataset_converters/parse_animalpose_dataset.py"),
    "ATRWDataset": ("ATRW", "https://cvwc2019.github.io/challenge.html",
                    "Amur tiger keypoint train/val images + jsons.", None),
    "Horse10Dataset": ("Horse-10", "http://www.mackenziemathislab.org/horse10",
                       "Horse-10 frames + the three official shuffles.", None),
    "LocustDataset": ("Desert Locust", "https://github.com/jgraving/DeepPoseKit-Data",
                      "DeepPoseKit locust release.",
                      "tools/dataset_converters/parse_deepposekit_dataset.py"),
    "ZebraDataset": ("Grévy's Zebra", "https://github.com/jgraving/DeepPoseKit-Data",
                     "DeepPoseKit zebra release.",
                     "tools/dataset_converters/parse_deepposekit_dataset.py"),
    "FlyDataset": ("Vinegar Fly", "https://github.com/jgraving/DeepPoseKit-Data",
                   "DeepPoseKit fly release.",
                   "tools/dataset_converters/parse_deepposekit_dataset.py"),
    "MacaqueDataset": ("MacaquePose", "http://www.pri.kyoto-u.ac.jp/datasets/macaquepose/index.html",
                       "MacaquePose v1 images + csv.",
                       "tools/dataset_converters/parse_macaquepose_dataset.py"),
    "AnimalKingdomDataset": ("Animal Kingdom", "https://github.com/sutdcv/Animal-Kingdom",
                             "Animal Kingdom pose estimation split.", None),
    "Human36mDataset": ("Human3.6M", "http://vision.imar.ro/human3.6m/",
                        "Register on the H36M site, download videos/annotations, then extract "
                        "frames + npz annotations.",
                        "tools/dataset_converters/preprocess_h36m.py (then h36m_to_coco.py for 2D use)"),
    "MpiInf3dhpDataset": ("MPI-INF-3DHP", "https://vcai.mpi-inf.mpg.de/3dhp-dataset/",
                          "Official release preprocessed into npz + camera params.",
                          "tools/dataset_converters/preprocess_mpi_inf_3dhp.py"),
    "UBody3dDataset": ("UBody (3D)", "https://github.com/IDEA-Research/OSX",
                       "Same UBody download as the 2D variant.",
                       "tools/dataset_converters/ubody_smplx_to_coco.py"),
    "H36MWholeBodyDataset": ("H3WB (H36M wholebody)", "https://github.com/wholebody3d/wholebody3d",
                             "H3WB wholebody annotations over Human3.6M images.", None),
    "InterHand3DDataset": ("InterHand2.6M", "https://mks0601.github.io/InterHand2.6M/",
                           "InterHand2.6M v1.0 5fps images + camera/joint/rootnet jsons.", None),
}


def _scan_area(subtrees):
    """Collect {dataset_type: {data_root: set(relative paths)}} plus a recipe
    count, from every config under the given subtrees."""
    from probpose_code_tpu.config import Config

    found = {}
    n_cfgs = {}

    def visit(ds):
        if not isinstance(ds, dict):
            return
        if ds.get("type") == "CombinedDataset":
            for sub in ds.get("datasets", []):
                visit(sub)
            return
        dtype = ds.get("type")
        if not isinstance(dtype, str) or "data_root" not in ds:
            return
        root = ds.get("data_root", "")
        paths = found.setdefault(dtype, {}).setdefault(root, set())
        for key in ("ann_file", "bbox_file", "seq_file", "camera_param_file"):
            if ds.get(key):
                p = ds[key]
                # bbox_file in some recipes is absolute-from-data/
                paths.add(p[len(root):] if p.startswith(root) else p)
        for prefix in (ds.get("data_prefix") or {}).values():
            if prefix:
                paths.add(prefix.rstrip("/") + "/")
        n_cfgs[dtype] = n_cfgs.get(dtype, 0) + 1

    for sub in subtrees:
        base = osp.join(REPO, "configs", sub)
        for dirpath, _, files in os.walk(base):
            for f in sorted(files):
                if not f.endswith(".py") or f.startswith("_"):
                    continue
                try:
                    cfg = Config.fromfile(osp.join(dirpath, f))
                except Exception:
                    continue
                for loader in ("train_dataloader", "val_dataloader", "test_dataloader"):
                    if loader in cfg:
                        visit(cfg[loader].get("dataset", {}))
    return found, n_cfgs


def _render_tree(root, paths):
    """Render a data layout tree for one data_root."""
    tree = {}
    for p in sorted(paths):
        parts = [x for x in p.split("/") if x]
        node = tree
        for i, part in enumerate(parts):
            is_dir = i < len(parts) - 1 or p.endswith("/")
            node = node.setdefault(part + ("/" if is_dir else ""), {})

    lines = [root.rstrip("/") + "/"]

    def walk(node, indent):
        items = sorted(node.items())
        for i, (name, child) in enumerate(items):
            tee = "└── " if i == len(items) - 1 else "├── "
            lines.append(indent + tee + name)
            walk(child, indent + ("    " if i == len(items) - 1 else "│   "))

    walk(tree, "")
    return "```text\n" + "\n".join(lines) + "\n```"


def _render_area(stem, title, subtrees):
    lines = [
        f"# {title}",
        "",
        "<!-- generated by tools/misc/gen_dataset_zoo_docs.py; layouts are derived",
        "     from the shipped configs — regenerate instead of editing. -->",
        "",
        "Place (or symlink) datasets under `data/` in the repo root; every layout",
        "below is exactly what the shipped configs read. General notes live in",
        "[prepare_datasets](../user_guides/prepare_datasets.md).",
        "",
    ]
    if not subtrees:
        if stem == "3d_body_mesh":
            lines += [
                "This fork of the reference ships **no body-mesh recovery recipes**",
                "(`configs/` has no mesh configs upstream either); the page exists for",
                "doc-tree parity. For SMPL-based mesh recovery use a dedicated mesh",
                "framework — the pose estimators here predict keypoints only.",
            ]
        else:
            lines += [
                "The reference fork ships **no dedicated 3D wholebody recipes**;",
                "UBody/H3WB-style 3D wholebody data is consumed through the",
                "`body_3d_keypoint` configs — see",
                "[3d_body_keypoint](3d_body_keypoint.md).",
            ]
        return "\n".join(lines) + "\n"

    found, n_cfgs = _scan_area(subtrees)
    order = sorted(found, key=lambda t: -n_cfgs.get(t, 0))
    lines.append("Datasets used by the recipes in " + ", ".join(f"`configs/{s}/`" for s in subtrees) + ":")
    lines.append("")
    for dtype in order:
        name, home, _, _ = INFO.get(dtype, (dtype, None, "", None))
        link = f" \\[ [homepage]({home}) \\]" if home else ""
        lines.append(f"- [{name}](#{name.lower().replace(' ', '-').replace('.', '').replace('(', '').replace(')', '').replace(chr(39), '')}){link}")
    lines.append("")
    for dtype in order:
        name, home, note, converter = INFO.get(dtype, (dtype, None, "", None))
        lines.append(f"## {name}")
        lines.append("")
        meta = [f"dataset class `{dtype}`", f"used by {n_cfgs[dtype]} recipe(s)"]
        if home:
            meta.append(f"[homepage]({home})")
        lines.append(" · ".join(meta))
        lines.append("")
        if note:
            lines.append(note)
            lines.append("")
        if converter:
            lines.append(f"Convert with `{converter}`.")
            lines.append("")
        for root, paths in sorted(found[dtype].items()):
            lines.append(_render_tree(root, paths))
            lines.append("")
    return "\n".join(lines) + "\n"


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--check", action="store_true", help="verify pages are up to date")
    args = parser.parse_args()

    os.makedirs(OUT_DIR, exist_ok=True)
    stale = []
    for stem, (title, subtrees) in AREAS.items():
        content = _render_area(stem, title, subtrees)
        path = osp.join(OUT_DIR, stem + ".md")
        if args.check:
            old = open(path).read() if osp.exists(path) else None
            if old != content:
                stale.append(stem)
        else:
            with open(path, "w") as f:
                f.write(content)
            print(f"wrote {osp.relpath(path, REPO)}")
    if stale:
        print(f"STALE dataset_zoo pages: {stale} — rerun tools/misc/gen_dataset_zoo_docs.py", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
