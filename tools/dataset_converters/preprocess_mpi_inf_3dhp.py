"""Preprocess MPI-INF-3DHP into the framework's 3D-lifting annotation format.

Counterpart of reference ``tools/dataset_converters/preprocess_mpi_inf_3dhp.py``
(cv2.VideoCapture replaces the mmcv video reader):
- train split: per (subject, sequence) read ``camera.calibration`` + the
  28-joint ``annot.mat``, select the canonical 17 joints, mm -> m, extract
  frames from every camera video, and write ``mpi_inf_3dhp_train.npz``
  (imgname/center/scale/part/S) + ``cameras_train.pkl`` + pose statistics;
- test split: per TS subject read ``annot_data.mat`` (17 joints + valid
  flags), least-squares-estimate the intrinsics, copy valid frames, write
  ``mpi_inf_3dhp_test_valid.npz`` + ``cameras_test.pkl``.

    python tools/dataset_converters/preprocess_mpi_inf_3dhp.py DATA_ROOT OUT_DIR
"""

import argparse
import os
import pickle
import shutil
from os.path import join

import cv2
import numpy as np

TRAIN_FRAME_NUMS = {
    (1, 1): 6416, (1, 2): 12430, (2, 1): 6502, (2, 2): 6081,
    (3, 1): 12488, (3, 2): 12283, (4, 1): 6171, (4, 2): 6675,
    (5, 1): 12820, (5, 2): 12312, (6, 1): 6188, (6, 2): 6145,
    (7, 1): 6239, (7, 2): 6320, (8, 1): 6468, (8, 2): 6054,
}
TEST_FRAME_NUMS = {1: 6151, 2: 6080, 3: 5838, 4: 6007, 5: 320, 6: 492}
TRAIN_IMG_SIZE = (2048, 2048)
ROOT_INDEX = 14
JOINTS_17 = [7, 5, 14, 15, 16, 9, 10, 11, 23, 24, 25, 18, 19, 20, 4, 3, 6]
TRAIN_CAMS = [0, 1, 2, 4, 5, 6, 7, 8]


def get_pose_stats(kps):
    K, D = kps.shape[-2:]
    kps = kps.reshape(-1, K, D)
    return kps.mean(axis=0), kps.std(axis=0)


def get_annotations(joints_2d, joints_3d, scale_factor=1.2):
    """Visibility from in-image 2D joints, tight bbox -> center/scale."""
    visibility = (
        (joints_2d[:, :, 0] >= 0) * (joints_2d[:, :, 0] < TRAIN_IMG_SIZE[0])
        * (joints_2d[:, :, 1] >= 0) * (joints_2d[:, :, 1] < TRAIN_IMG_SIZE[1])
    ).astype(np.float32)[:, :, None]
    joints_2d = np.concatenate([joints_2d, visibility], axis=-1)
    joints_3d = np.concatenate([joints_3d, visibility], axis=-1)

    bboxes = np.stack([
        joints_2d[:, :, 0].min(1), joints_2d[:, :, 1].min(1),
        joints_2d[:, :, 0].max(1), joints_2d[:, :, 1].max(1),
    ], axis=1)
    centers = np.stack([(bboxes[:, 0] + bboxes[:, 2]) / 2, (bboxes[:, 1] + bboxes[:, 3]) / 2], axis=1)
    scales = scale_factor * np.max(bboxes[:, 2:] - bboxes[:, :2], axis=1) / 200
    return centers, scales, joints_2d, joints_3d


def parse_camera_calibration(path, cams):
    """``camera.calibration``: 7 lines per camera (name/sensor/size/
    animated/intrinsic/extrinsic); returns per-camera param dicts."""
    with open(path) as fin:
        lines = fin.readlines()
    out = {}
    for cam in cams:
        K = [float(s) for s in lines[cam * 7 + 5][11:-2].split()]
        f = np.array([[K[0]], [K[5]]])
        c = np.array([[K[2]], [K[6]]])
        RT = np.reshape(np.array([float(s) for s in lines[cam * 7 + 6][11:-2].split()]), (4, 4))
        w, h = (int(s) for s in lines[cam * 7 + 3][14:].split())
        out[cam] = dict(R=RT[:3, :3], T=RT[:3, 3:] * 0.001, c=c, f=f, w=w, h=h)
    return out


def extract_video_frames(video_path, img_dir, prefix, num_frames):
    names = []
    cap = cv2.VideoCapture(video_path)
    for i in range(num_frames):
        ok, img = cap.read()
        if not ok or img is None:
            break
        name = f"{prefix}_{i + 1:06d}.jpg"
        cv2.imwrite(join(img_dir, name), img)
        names.append(name)
    cap.release()
    return names


def load_trainset(data_root, out_dir, subjects=range(1, 9), seqs=(1, 2), cams=TRAIN_CAMS):
    from scipy.io import loadmat

    _imgnames, _centers, _scales, _joints_2d, _joints_3d = [], [], [], [], []
    cameras = {}
    img_dir = join(out_dir, "images")
    annot_dir = join(out_dir, "annotations")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(annot_dir, exist_ok=True)

    for subj in subjects:
        for seq in seqs:
            seq_path = join(data_root, "train", f"S{subj}", f"Seq{seq}")
            if not os.path.isdir(seq_path):
                continue
            num_frames = TRAIN_FRAME_NUMS.get((subj, seq), 10**9)
            for cam, cam_param in parse_camera_calibration(join(seq_path, "camera.calibration"), cams).items():
                cameras[f"S{subj}_Seq{seq}_Cam{cam}"] = dict(cam_param, name=f"train_cam_{cam}")

            annot = loadmat(join(seq_path, "annot.mat"))
            annot2, annot3 = annot["annot2"], annot["annot3"]
            for cam in cams:
                imgnames = extract_video_frames(
                    join(seq_path, "imageSequence", f"video_{cam}.avi"),
                    img_dir, f"S{subj}_Seq{seq}_Cam{cam}", num_frames,
                )
                n = len(imgnames)
                if n == 0:
                    continue
                joints_2d = np.reshape(annot2[cam][0][:n], (n, -1, 2))[:, JOINTS_17]
                joints_3d = np.reshape(annot3[cam][0][:n], (n, -1, 3))[:, JOINTS_17] * 0.001
                centers, scales, joints_2d, joints_3d = get_annotations(joints_2d, joints_3d)
                _imgnames.extend(imgnames)
                _centers.append(centers)
                _scales.append(scales)
                _joints_2d.append(joints_2d)
                _joints_3d.append(joints_3d)

    _imgnames = np.array(_imgnames)
    _centers = np.concatenate(_centers)
    _scales = np.concatenate(_scales)
    _joints_2d = np.concatenate(_joints_2d)
    _joints_3d = np.concatenate(_joints_3d)
    np.savez(join(annot_dir, "mpi_inf_3dhp_train.npz"),
             imgname=_imgnames, center=_centers, scale=_scales, part=_joints_2d, S=_joints_3d)
    with open(join(annot_dir, "cameras_train.pkl"), "wb") as fout:
        pickle.dump(cameras, fout)
    print(f"trainset: {len(_imgnames)} samples")

    # pose statistics (absolute + root-relative, root stats kept absolute)
    j3, j2 = _joints_3d[..., :3], _joints_2d[..., :2]
    stats = {}
    stats["joint3d_stats"] = dict(zip(("mean", "std"), get_pose_stats(j3)))
    stats["joint2d_stats"] = dict(zip(("mean", "std"), get_pose_stats(j2)))
    for name, arr, absolute in (("joint3d_rel_stats", j3, stats["joint3d_stats"]),
                                ("joint2d_rel_stats", j2, stats["joint2d_stats"])):
        rel = arr - arr[..., ROOT_INDEX:ROOT_INDEX + 1, :]
        mean, std = get_pose_stats(rel)
        mean[ROOT_INDEX] = absolute["mean"][ROOT_INDEX]
        std[ROOT_INDEX] = absolute["std"][ROOT_INDEX]
        stats[name] = dict(mean=mean, std=std)
    for name, stat in stats.items():
        with open(join(annot_dir, f"{name}.pkl"), "wb") as f:
            pickle.dump(stat, f)
    print("wrote pose statistics")


def load_testset(data_root, out_dir, subjects=range(1, 7), valid_only=True):
    import h5py

    _imgnames, _centers, _scales, _joints_2d, _joints_3d = [], [], [], [], []
    cameras = {}
    img_dir = join(out_dir, "images")
    annot_dir = join(out_dir, "annotations")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(annot_dir, exist_ok=True)

    for subj in subjects:
        subj_path = join(data_root, "test", f"TS{subj}")
        if not os.path.isdir(subj_path):
            continue
        with h5py.File(join(subj_path, "annot_data.mat"), "r") as fin:
            annot2 = np.array(fin["annot2"]).reshape((-1, 17, 2))
            annot3 = np.array(fin["annot3"]).reshape((-1, 17, 3))
            valid = np.array(fin["valid_frame"]).reshape(-1)

        # least-squares intrinsics from the 2D-3D correspondences
        fx, cx = np.linalg.lstsq(
            annot3[:, :, [0, 2]].reshape((-1, 2)),
            (annot2[:, :, 0] * annot3[:, :, 2]).reshape(-1, 1), rcond=None)[0].flatten()
        fy, cy = np.linalg.lstsq(
            annot3[:, :, [1, 2]].reshape((-1, 2)),
            (annot2[:, :, 1] * annot3[:, :, 2]).reshape(-1, 1), rcond=None)[0].flatten()
        w, h = (2048, 2048) if subj <= 4 else (1920, 1080)
        cameras[f"TS{subj}"] = dict(c=np.array([[cx], [cy]]), f=np.array([[fx], [fy]]),
                                    w=w, h=h, name=f"test_cam_{subj}")

        num_frames = min(TEST_FRAME_NUMS.get(subj, len(annot2)), len(annot2))
        frames = np.nonzero(valid)[0] if valid_only else np.arange(num_frames)
        joints_2d = annot2[frames]
        joints_3d = annot3[frames] * 0.001
        centers, scales, joints_2d, joints_3d = get_annotations(joints_2d, joints_3d)
        _centers.append(centers)
        _scales.append(scales)
        _joints_2d.append(joints_2d)
        _joints_3d.append(joints_3d)
        for i in frames:
            imgname = f"TS{subj}_{i + 1:06d}.jpg"
            shutil.copyfile(join(subj_path, "imageSequence", f"img_{i + 1:06d}.jpg"), join(img_dir, imgname))
            _imgnames.append(imgname)

    _imgnames = np.array(_imgnames)
    suffix = "valid" if valid_only else "all"
    np.savez(join(annot_dir, f"mpi_inf_3dhp_test_{suffix}.npz"),
             imgname=_imgnames, center=np.concatenate(_centers), scale=np.concatenate(_scales),
             part=np.concatenate(_joints_2d), S=np.concatenate(_joints_3d))
    with open(join(annot_dir, "cameras_test.pkl"), "wb") as fout:
        pickle.dump(cameras, fout)
    print(f"testset: {len(_imgnames)} samples")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("data_root")
    parser.add_argument("out_dir")
    parser.add_argument("--skip-train", action="store_true")
    parser.add_argument("--skip-test", action="store_true")
    args = parser.parse_args()
    if not args.skip_train:
        load_trainset(args.data_root, args.out_dir)
    if not args.skip_test:
        load_testset(args.data_root, args.out_dir, valid_only=True)


if __name__ == "__main__":
    main()
