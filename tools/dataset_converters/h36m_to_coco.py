"""Convert preprocessed Human3.6M annotations (.npz) to COCO keypoint format.

Counterpart of reference ``tools/dataset_converters/h36m_to_coco.py``. The
preprocessed npz (see ``preprocess_h36m`` in the reference toolchain) holds
``imgname`` / ``center`` / ``scale`` / ``part`` (2D kpts) / ``S`` (3D kpts
in camera space); 3D keypoints are lifted back to world space through the
per-(subject, camera) parameters before writing ``keypoints_3d``.

    python tools/dataset_converters/h36m_to_coco.py \
        --ann-file data/h36m/annotation_body3d/fps50/h36m_test.npz \
        --camera-param-file data/h36m/annotation_body3d/cameras.pkl \
        --img-root data/h36m/images --out-file data/h36m/h36m_coco.json
"""

import argparse
import json
import os.path as osp
import pickle

import numpy as np

import os.path as _osp
import sys as _sys

_sys.path.insert(0, _osp.dirname(_osp.dirname(_osp.dirname(_osp.abspath(__file__)))))

from probpose_code_tpu.utils.camera import SimpleCamera  # noqa: E402

H36M_KEYPOINTS = [
    "root (pelvis)", "left_hip", "left_knee", "left_foot", "right_hip",
    "right_knee", "right_foot", "spine", "thorax", "neck_base", "head",
    "left_shoulder", "left_elbow", "left_wrist", "right_shoulder",
    "right_elbow", "right_wrist",
]
H36M_SKELETON = [
    [0, 1], [1, 2], [2, 3], [0, 4], [4, 5], [5, 6], [0, 7], [7, 8],
    [8, 9], [9, 10], [8, 11], [11, 12], [12, 13], [8, 14], [14, 15], [15, 16],
]


def _camera_key(image_name: str):
    """'S1_Directions_1.54138969_000001.jpg' -> ('S1', '54138969')."""
    base = osp.basename(image_name)
    subj, rest = base.split("_", 1)
    _, rest = rest.split(".", 1)
    camera, _ = rest.split("_", 1)
    return subj, camera


def _bbox_from_center_scale(center, scale, pixel_std: float = 200.0):
    w = h = float(scale) * pixel_std
    return [float(center[0]) - w / 2, float(center[1]) - h / 2, w, h]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--ann-file", required=True)
    parser.add_argument("--camera-param-file", required=True)
    parser.add_argument("--img-root", required=True)
    parser.add_argument("--out-file", required=True)
    parser.add_argument("--full-img-name", action="store_true")
    args = parser.parse_args()

    data = np.load(args.ann_file)
    with open(args.camera_param_file, "rb") as f:
        camera_params = pickle.load(f)

    imgnames = [fn if args.full_img_name else osp.basename(fn) for fn in data["imgname"]]
    centers = np.asarray(data["center"], dtype=np.float32)
    scales = np.asarray(data["scale"], dtype=np.float32).reshape(-1)
    kpts_2d = np.asarray(data["part"], dtype=np.float32)  # (N, 17, 2|3)
    kpts_3d = np.asarray(data["S"], dtype=np.float32)  # (N, 17, 3|4) camera space

    images, annotations = [], []
    cameras = {}
    for idx, name in enumerate(imgnames):
        img_path = osp.join(args.img_root, name)
        import cv2

        img = cv2.imread(img_path)
        if img is None:
            continue
        images.append(dict(id=idx + 1, file_name=name, height=int(img.shape[0]), width=int(img.shape[1])))

        k2d = kpts_2d[idx]
        if k2d.shape[-1] == 2:
            k2d = np.concatenate([k2d, np.full((len(k2d), 1), 2, np.float32)], axis=1)
        k3d = kpts_3d[idx].copy()
        cam_key = _camera_key(name)
        if cam_key not in cameras:
            cameras[cam_key] = SimpleCamera(camera_params[cam_key])
        k3d[..., :3] = cameras[cam_key].camera_to_world(k3d[..., :3])

        bbox = _bbox_from_center_scale(centers[idx], scales[idx])
        annotations.append(dict(
            id=idx + 1, image_id=idx + 1, category_id=1, iscrowd=0,
            bbox=bbox, area=bbox[2] * bbox[3], num_keypoints=17,
            keypoints=np.asarray(k2d).reshape(-1).tolist(),
            keypoints_3d=np.asarray(k3d).reshape(-1).tolist(),
        ))

    coco = dict(
        images=images,
        annotations=annotations,
        categories=[dict(supercategory="person", id=1, name="person",
                         keypoints=H36M_KEYPOINTS, skeleton=H36M_SKELETON)],
    )
    with open(args.out_file, "w") as f:
        json.dump(coco, f)
    print(f"wrote {len(images)} images / {len(annotations)} annotations to {args.out_file}")


if __name__ == "__main__":
    main()
