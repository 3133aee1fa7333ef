"""Human36mDataset sequence construction on a synthetic npz bundle."""

import os

import numpy as np

from probpose_code_tpu.datasets import Human36mDataset


def _make_npz(tmp_path, n=40):
    rng = np.random.RandomState(0)
    imgname = np.array([f"S1_Walking_1.54138969_{i:06d}.jpg" for i in range(n // 2)] +
                       [f"S1_Eating_1.54138969_{i:06d}.jpg" for i in range(n // 2)])
    path = os.path.join(str(tmp_path), "h36m_test.npz")
    np.savez(path, imgname=imgname,
             S=rng.rand(n, 17, 4).astype(np.float32),
             part=rng.rand(n, 17, 3).astype(np.float32),
             center=rng.rand(n, 2).astype(np.float32) * 400,
             scale=rng.rand(n).astype(np.float32) * 3)
    return path


def test_h36m_padded_sequences(tmp_path):
    path = _make_npz(tmp_path)
    ds = Human36mDataset(ann_file=path, seq_len=27, causal=False, pad_video_seq=True, pipeline=[])
    assert len(ds) == 40  # one sequence per frame when padded
    s = ds.get_data_info(0)
    assert s["keypoints"].shape == (27, 17, 2)
    assert s["lifting_target"].shape == (17, 3)


def test_h36m_videos_not_mixed(tmp_path):
    path = _make_npz(tmp_path)
    ds = Human36mDataset(ann_file=path, seq_len=9, causal=True, pipeline=[])
    for info in ds.data_list:
        subjects = {p.split(".")[0] for p in info["img_paths"]}
        assert len(subjects) == 1  # never crosses video boundaries
