"""H36MWholeBodyDataset (H3WB) + UBody3dDataset on synthetic fixtures.

Mirrors the reference annotation layouts: H3WB's dict-of-dicts npz bundle
(reference ``h3wb_dataset.py:104-118``) and UBody3d's COCO json with
``keypoints_3d``/``keypoints_valid``/``camera_param`` per instance
(reference ``ubody3d_dataset.py:168-230``).
"""

import json
import os

import numpy as np

from probpose_code_tpu.datasets import H36MWholeBodyDataset, UBody3dDataset


def _make_h3wb_npz(tmp_path, n_frames=12, k=133):
    rng = np.random.RandomState(0)
    train_data = {}
    for subject in ("S1", "S7"):
        acts = {}
        for act in ("Walking", "Eating"):
            cams = {"frame_id": list(range(n_frames))}
            for cam in ("54138969", "55011271"):
                cams[cam] = dict(
                    pose_2d=rng.rand(n_frames, k, 2).astype(np.float32) * 400,
                    camera_3d=rng.rand(n_frames, k, 3).astype(np.float32) * 1000,
                )
            acts[act] = cams
        train_data[subject] = acts
    metadata = {
        subj: {cam: dict(K=rng.rand(1, 3, 3), R=rng.rand(1, 3, 3),
                         T=rng.rand(3), Distortion=rng.rand(1, 5))
               for cam in ("54138969", "55011271")}
        for subj in ("S1", "S7")
    }
    path = os.path.join(str(tmp_path), "h3wb.npz")
    np.savez(path, train_data=np.array(train_data, dtype=object),
             metadata=np.array(metadata, dtype=object))
    return path


def test_h3wb_train_test_split_and_shapes(tmp_path):
    path = _make_h3wb_npz(tmp_path)
    train = H36MWholeBodyDataset(ann_file=path, seq_len=1, pipeline=[])
    test = H36MWholeBodyDataset(ann_file=path, seq_len=1, test_mode=True, pipeline=[])
    # train = S1 only (2 acts x 2 cams x 12 frames), test = S7 only
    assert len(train) == 2 * 2 * 12
    assert len(test) == 2 * 2 * 12
    info = train.get_data_info(0)
    assert info["keypoints"].shape == (1, 133, 2)
    assert info["lifting_target"].shape == (1, 133, 3)
    # mm -> m conversion of 3D targets
    assert float(np.abs(info["lifting_target"]).max()) <= 1.0
    assert info["camera_param"]["K"].shape == (2, 3)
    assert train.metainfo["num_keypoints"] == 133


def test_h3wb_sequences_stay_in_one_video(tmp_path):
    path = _make_h3wb_npz(tmp_path)
    ds = H36MWholeBodyDataset(ann_file=path, seq_len=5, causal=True, pipeline=[])
    assert len(ds) == 2 * 2 * (12 - 5 + 1)
    for info in ds.data_list:
        videos = {p.rsplit("/", 1)[0] for p in info["img_paths"]}
        assert len(videos) == 1


def _make_ubody_json(tmp_path, n_frames=10, k=137):
    rng = np.random.RandomState(1)
    images, annotations = [], []
    aid = 0
    for trim in ("trim_A", "trim_B"):
        for f in range(n_frames):
            img_id = len(images) + 1
            images.append(dict(id=img_id, file_name=f"vid/{trim}/{f:06d}.png",
                               width=1000, height=1000))
            annotations.append(dict(
                id=aid, image_id=img_id, category_id=1,
                keypoints=(rng.rand(k, 3) * 500).astype(float).ravel().tolist(),
                keypoints_3d=(rng.rand(k, 3)).astype(float).ravel().tolist(),
                keypoints_valid=np.ones(k).tolist(),
                camera_param=dict(focal=[500.0, 500.0], princpt=[500.0, 500.0]),
            ))
            aid += 1
    path = os.path.join(str(tmp_path), "ubody3d.json")
    with open(path, "w") as fh:
        json.dump(dict(images=images, annotations=annotations,
                       categories=[dict(id=1, name="person")]), fh)
    return path


def test_ubody3d_sequences_and_targets(tmp_path):
    path = _make_ubody_json(tmp_path)
    ds = UBody3dDataset(ann_file=path, seq_len=3, causal=False, pipeline=[])
    # per trim: 10 - 3 + 1 = 8 sequences
    assert len(ds) == 2 * 8
    info = ds.get_data_info(0)
    assert info["keypoints"].shape == (3, 137, 2)
    assert info["lifting_target"].shape == (1, 137, 3)
    assert info["lifting_target_visible"].shape == (1, 137)
    # camera_param w/h defaults filled in like the reference (:205-208)
    assert info["camera_param"]["w"] == 1000 and info["camera_param"]["h"] == 1000
    assert len(info["target_img_paths"]) == 1
    videos = {p.rsplit("/", 2)[1] for p in info["img_paths"]}
    assert len(videos) == 1
    assert ds.metainfo["num_keypoints"] == 137


def test_ubody3d_multiple_target(tmp_path):
    path = _make_ubody_json(tmp_path)
    ds = UBody3dDataset(ann_file=path, seq_len=1, multiple_target=5, pipeline=[])
    assert len(ds) > 0
    info = ds.get_data_info(0)
    assert info["lifting_target"].shape == (5, 137, 3)
    assert info["keypoints"].shape == (5, 137, 2)
