#!/usr/bin/env python
"""Preprocess the Human3.6M download into the framework's npz annotations.

Behavioral parity target: reference
``tools/dataset_converters/preprocess_h36m.py:1-352`` (itself adapted from
anibali/h36m-fetch): extract the per-subject tgz archives, decode camera
parameters from ``metadata.xml``'s ``w0`` vector, sample video frames at
``50 / sample_rate`` fps, and write

- ``annotation_body3d/cameras.pkl`` — (subject, camera_id) -> R/T/c/f/k/p
- ``annotation_body3d/fps{N}/h36m_{train,test}.npz`` — imgname/center/
  scale/part (2D kpts+vis) /S (3D kpts+vis), the layout
  ``datasets/mocap.py:BaseMocapDataset`` loads
- ``joint{2,3}d[_rel]_stats.pkl`` — train-set mean/std pose statistics

CDF reading uses ``spacepy.pycdf`` when installed; otherwise a sibling
``<name>.npy`` per ``.cdf`` file is accepted (pre-extract once on any
machine with spacepy and rsync the arrays).
"""

from __future__ import annotations

import argparse
import os
import pickle
import tarfile
import xml.etree.ElementTree as ET
from os.path import dirname, exists, join

import cv2
import numpy as np

MOVABLE_JOINTS = [0, 1, 2, 3, 6, 7, 8, 12, 13, 14, 15, 17, 18, 19, 25, 26, 27]
IMAGE_SIZES = {
    "54138969": {"width": 1000, "height": 1002},
    "55011271": {"width": 1000, "height": 1000},
    "58860488": {"width": 1000, "height": 1000},
    "60457274": {"width": 1000, "height": 1002},
}


def read_pose_cdf(path: str) -> np.ndarray:
    """Read a `Pose` array from a .cdf file (spacepy) or a sibling .npy."""
    npy = os.path.splitext(path)[0] + ".npy"
    if exists(npy):
        return np.load(npy)
    try:
        from spacepy import pycdf  # noqa: WPS433
    except ImportError as e:
        raise ImportError(
            f"reading {path} needs 'spacepy' (not installed); pre-extract the "
            f"Pose array to {npy} on a machine that has it") from e
    with pycdf.CDF(path) as cdf:
        return np.array(cdf["Pose"])


def get_pose_stats(kps: np.ndarray):
    """Mean/std over all samples for [..., K, D] keypoints
    (reference :159-175)."""
    assert kps.ndim > 2
    K, D = kps.shape[-2:]
    kps = kps.reshape(-1, K, D)
    return kps.mean(axis=0), kps.std(axis=0)


def camera_params_from_w0(cameras_raw, camera: int, subject: int, camera_ids):
    """Decode one camera's parameters from the metadata w0 vector
    (reference ``_get_camera_params``, :206-253)."""
    m = np.zeros(15)
    start = 6 * (camera * 11 + (subject - 1))
    m[:6] = cameras_raw[start:start + 6]
    m[6:] = cameras_raw[265 + camera * 9 - 1:265 + (camera + 1) * 9 - 1]

    x, y, z = -m[0], m[1], -m[2]
    R_x = np.array([[1, 0, 0], [0, np.cos(x), np.sin(x)], [0, -np.sin(x), np.cos(x)]])
    R_y = np.array([[np.cos(y), 0, np.sin(y)], [0, 1, 0], [-np.sin(y), 0, np.cos(y)]])
    R_z = np.array([[np.cos(z), np.sin(z), 0], [-np.sin(z), np.cos(z), 0], [0, 0, 1]])
    R = (R_x @ R_y @ R_z).T
    T = m[3:6].reshape(-1, 1) * 0.001  # mm -> m

    return {
        "R": R,
        "T": T,
        "c": m[8:10, None],
        "f": m[6:8, None],
        "k": m[10:13, None],
        "p": m[13:15, None],
        "w": IMAGE_SIZES[camera_ids[camera]]["width"],
        "h": IMAGE_SIZES[camera_ids[camera]]["height"],
        "name": f"camera{camera + 1}",
        "id": camera_ids[camera],
    }


class PreprocessH36m:
    """Orchestrates extraction + annotation generation (reference :18-311)."""

    def __init__(self, metadata, original_dir, extracted_dir=None,
                 processed_dir=None, sample_rate=5):
        self.metadata = metadata
        self.original_dir = original_dir
        self.sample_rate = sample_rate
        parent = dirname(os.path.abspath(original_dir))
        self.extracted_dir = extracted_dir or join(parent, "extracted")
        self.processed_dir = processed_dir or join(parent, "processed")

        self.subjects = []
        self.sequence_mappings = {}
        self.action_names = {}
        self.camera_ids = []
        self._load_metadata()

        self.subjects_annot = ["S1", "S5", "S6", "S7", "S8", "S9", "S11"]
        self.subjects_splits = {"train": ["S1", "S5", "S6", "S7", "S8"],
                                "test": ["S9", "S11"]}
        self.extract_files = ["Videos", "D2_Positions", "D3_Positions_mono"]
        self.scale_factor = 1.2

    # -- metadata ---------------------------------------------------------

    def _load_metadata(self):
        assert exists(self.metadata), self.metadata
        root = ET.parse(self.metadata).getroot()
        for i, tr in enumerate(root.find("mapping")):
            if i == 0:
                _, _, *self.subjects = [td.text for td in tr]
                self.sequence_mappings = {s: {} for s in self.subjects}
            elif i < 33:
                action_id, subaction_id, *prefixes = [td.text for td in tr]
                for subject, prefix in zip(self.subjects, prefixes):
                    self.sequence_mappings[subject][(action_id, subaction_id)] = prefix
        for i, elem in enumerate(root.find("actionnames")):
            self.action_names[str(i + 1)] = elem.text
        self.camera_ids = [e.text for e in root.find("dbcameras/index2id")]
        w0 = root.find("w0")
        self.cameras_raw = [float(num) for num in w0.text[1:-1].split()]

    def _base_filename(self, subject, action, subaction, camera):
        return f"{self.sequence_mappings[subject][(action, subaction)]}.{camera}"

    # -- stages -----------------------------------------------------------

    def extract_tgz(self):
        os.makedirs(self.extracted_dir, exist_ok=True)
        for subject in self.subjects_annot:
            cur = join(self.original_dir, subject.lower())
            for file in self.extract_files:
                filename = join(cur, file + ".tgz")
                print(f"Extracting {filename} ...")
                with tarfile.open(filename) as tar:
                    tar.extractall(self.extracted_dir)

    def generate_cameras_file(self):
        cameras = {}
        for subject in range(1, 12):
            for camera in range(4):
                cameras[(f"S{subject}", self.camera_ids[camera])] = \
                    camera_params_from_w0(self.cameras_raw, camera, subject, self.camera_ids)
        out = join(self.processed_dir, "annotation_body3d", "cameras.pkl")
        os.makedirs(dirname(out), exist_ok=True)
        with open(out, "wb") as f:
            pickle.dump(cameras, f)
        print(f'cameras -> "{out}"')

    def _load_annotations(self, subject, action, subaction, camera):
        subj_dir = join(self.extracted_dir, subject)
        basename = self._base_filename(subject, action, subaction, camera)

        kps_2d = read_pose_cdf(join(subj_dir, "MyPoseFeatures", "D2_Positions", basename + ".cdf"))
        num_frames = kps_2d.shape[1]
        kps_2d = kps_2d.reshape((num_frames, 32, 2))[::self.sample_rate, MOVABLE_JOINTS]
        kps_2d = np.concatenate([kps_2d, np.ones((len(kps_2d), 17, 1))], axis=2)

        kps_3d = read_pose_cdf(join(subj_dir, "MyPoseFeatures", "D3_Positions_mono", basename + ".cdf"))
        kps_3d = kps_3d.reshape((num_frames, 32, 3))[::self.sample_rate, MOVABLE_JOINTS] / 1000.0
        kps_3d = np.concatenate([kps_3d, np.ones((len(kps_3d), 17, 1))], axis=2)

        bboxes = np.stack([kps_2d[:, :, 0].min(1), kps_2d[:, :, 1].min(1),
                           kps_2d[:, :, 0].max(1), kps_2d[:, :, 1].max(1)], axis=1)
        centers = np.stack([(bboxes[:, 0] + bboxes[:, 2]) / 2,
                            (bboxes[:, 1] + bboxes[:, 3]) / 2], axis=1)
        scales = self.scale_factor * np.max(bboxes[:, 2:] - bboxes[:, :2], axis=1) / 200

        # frame extraction
        imgnames = []
        video_path = join(subj_dir, "Videos", basename + ".mp4")
        sub_base = subject + "_" + basename.replace(" ", "_")
        os.makedirs(join(self.processed_dir, "images", subject, sub_base), exist_ok=True)
        prefix = join(subject, sub_base, sub_base)
        cap = cv2.VideoCapture(video_path)
        i = 0
        while True:
            ok, img = cap.read()
            if not ok:
                break
            if i % self.sample_rate == 0:
                imgname = f"{prefix}_{i + 1:06d}.jpg"
                imgnames.append(imgname)
                dest = join(self.processed_dir, "images", imgname)
                if not exists(dest):
                    cv2.imwrite(dest, img)
                if len(imgnames) == len(centers):
                    break
            i += 1
        cap.release()
        print(f"{subject} {basename}: {len(imgnames)} samples")
        return np.array(imgnames), centers, scales, kps_2d, kps_3d

    def generate_annotations(self):
        out_dir = join(self.processed_dir, "annotation_body3d", f"fps{50 // self.sample_rate}")
        os.makedirs(out_dir, exist_ok=True)
        for split in ("train", "test"):
            packs = [[] for _ in range(5)]
            for subject in self.subjects_splits[split]:
                for (action, subaction) in self.sequence_mappings[subject]:
                    if action == "1":  # "_ALL"
                        continue
                    for camera in self.camera_ids:
                        for pack, item in zip(packs, self._load_annotations(subject, action, subaction, camera)):
                            pack.append(item)
            imgname, center, scale, part, S = (np.concatenate(p) for p in packs)
            out = join(out_dir, f"h36m_{split}.npz")
            np.savez(out, imgname=imgname, center=center, scale=scale, part=part, S=S)
            print(f'{split}: {len(imgname)} samples -> "{out}"')

            if split == "train":
                k3 = S[..., :3]
                k2 = part[..., :2]
                stats = {
                    "joint3d_stats": get_pose_stats(k3),
                    "joint2d_stats": get_pose_stats(k2),
                    "joint3d_rel_stats": get_pose_stats(k3[..., 1:, :] - k3[..., :1, :]),
                    "joint2d_rel_stats": get_pose_stats(k2[..., 1:, :] - k2[..., :1, :]),
                }
                for name, (mean, std) in stats.items():
                    with open(join(out_dir, f"{name}.pkl"), "wb") as f:
                        pickle.dump({"mean": mean, "std": std}, f)


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--metadata", required=True, help="path to metadata.xml")
    p.add_argument("--original", required=True,
                   help="dir of the original download (s1/..s11 subdirs of .tgz)")
    p.add_argument("--extracted", default=None)
    p.add_argument("--processed", default=None)
    p.add_argument("--sample-rate", type=int, default=5,
                   help="downsample fps to 50/sample_rate (default 5 -> 10fps)")
    return p.parse_args()


if __name__ == "__main__":
    args = parse_args()
    h36m = PreprocessH36m(metadata=args.metadata, original_dir=args.original,
                          extracted_dir=args.extracted, processed_dir=args.processed,
                          sample_rate=args.sample_rate)
    h36m.extract_tgz()
    h36m.generate_cameras_file()
    h36m.generate_annotations()
