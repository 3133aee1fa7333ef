"""preprocess_h36m end-to-end on a synthetic miniature download
(reference ``tools/dataset_converters/preprocess_h36m.py``)."""

import importlib.util
import os
import pickle
import sys
from os.path import join

import cv2
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

spec = importlib.util.spec_from_file_location(
    "preprocess_h36m", join(REPO, "tools/dataset_converters/preprocess_h36m.py"))
pp = importlib.util.module_from_spec(spec)
spec.loader.exec_module(pp)


def _make_metadata(path, subjects, cameras):
    """Minimal metadata.xml with the fields the converter reads."""
    rows = []
    header = "<tr><td>a</td><td>s</td>" + "".join(f"<td>{s}</td>" for s in subjects) + "</tr>"
    rows.append(header)
    # action rows: (action_id, subaction_id, prefix per subject)
    for action, sub in [("1", "1"), ("2", "1"), ("2", "2")]:
        name = "_ALL" if action == "1" else f"Walking {sub}"
        rows.append(f"<tr><td>{action}</td><td>{sub}</td>"
                    + "".join(f"<td>{name}</td>" for _ in subjects) + "</tr>")
    # pad mapping to 33 rows like the real file (extra rows are ignored > idx 32)
    while len(rows) < 33:
        rows.append(f"<tr><td>1</td><td>{len(rows)}</td>" + "".join("<td>X</td>" for _ in subjects) + "</tr>")
    actionnames = "".join(f"<actionname>act{i}</actionname>" for i in range(3))
    index2id = "".join(f"<id>{c}</id>" for c in cameras)
    w0 = "[" + " ".join(f"{v:.6f}" for v in np.linspace(0.1, 2.0, 400)) + "]"
    xml = f"""<root>
<mapping>{''.join(rows)}</mapping>
<actionnames>{actionnames}</actionnames>
<dbcameras><index2id>{index2id}</index2id></dbcameras>
<w0>{w0}</w0>
</root>"""
    with open(path, "w") as f:
        f.write(xml)


@pytest.fixture()
def mini_h36m(tmp_path):
    subjects = ["S1", "S5", "S6", "S7", "S8", "S9", "S11"]
    cameras = ["54138969", "55011271", "58860488", "60457274"]
    meta = tmp_path / "metadata.xml"
    _make_metadata(str(meta), subjects, cameras)

    extracted = tmp_path / "extracted"
    n_frames, rate = 10, 5
    rng = np.random.RandomState(0)
    for s in subjects:
        for sub in ("1", "2"):
            base = f"Walking {sub}"
            for cam in cameras:
                d2 = extracted / s / "MyPoseFeatures" / "D2_Positions"
                d3 = extracted / s / "MyPoseFeatures" / "D3_Positions_mono"
                vids = extracted / s / "Videos"
                for d in (d2, d3, vids):
                    d.mkdir(parents=True, exist_ok=True)
                # CDF fallback: .npy with the raw (1, T, 32*D) layout
                np.save(d2 / f"{base}.{cam}.npy", rng.rand(1, n_frames, 64) * 800)
                np.save(d3 / f"{base}.{cam}.npy", rng.rand(1, n_frames, 96) * 2000)
                # 10-frame video
                vw = cv2.VideoWriter(str(vids / f"{base}.{cam}.mp4"),
                                     cv2.VideoWriter_fourcc(*"mp4v"), 50, (64, 48))
                for _ in range(n_frames):
                    vw.write((rng.rand(48, 64, 3) * 255).astype(np.uint8))
                vw.release()
    return dict(meta=str(meta), extracted=str(extracted),
                processed=str(tmp_path / "processed"), original=str(tmp_path / "orig"))


def test_preprocess_h36m_end_to_end(mini_h36m):
    h = pp.PreprocessH36m(metadata=mini_h36m["meta"], original_dir=mini_h36m["original"],
                          extracted_dir=mini_h36m["extracted"],
                          processed_dir=mini_h36m["processed"], sample_rate=5)
    h.generate_cameras_file()
    h.generate_annotations()

    cams = pickle.load(open(join(mini_h36m["processed"], "annotation_body3d", "cameras.pkl"), "rb"))
    assert len(cams) == 11 * 4
    cam = cams[("S1", "54138969")]
    assert cam["R"].shape == (3, 3) and cam["T"].shape == (3, 1)
    # rotation matrix is orthonormal
    np.testing.assert_allclose(cam["R"] @ cam["R"].T, np.eye(3), atol=1e-8)

    out_dir = join(mini_h36m["processed"], "annotation_body3d", "fps10")
    train = np.load(join(out_dir, "h36m_train.npz"))
    # 5 train subjects x 2 subactions x 4 cameras x 2 sampled frames
    assert train["part"].shape == (5 * 2 * 4 * 2, 17, 3)
    assert train["S"].shape == (5 * 2 * 4 * 2, 17, 4)
    assert train["imgname"].shape[0] == train["center"].shape[0] == train["scale"].shape[0]
    assert all(os.path.exists(join(out_dir, f"{n}.pkl"))
               for n in ("joint3d_stats", "joint2d_stats", "joint3d_rel_stats", "joint2d_rel_stats"))

    # the produced npz feeds Human36mDataset directly
    sys.path.insert(0, REPO)
    from probpose_code_tpu.datasets import Human36mDataset

    ds = Human36mDataset(ann_file=join(out_dir, "h36m_train.npz"), seq_len=1, pipeline=[])
    assert len(ds) == train["part"].shape[0]
    info = ds.get_data_info(0)
    assert info["lifting_target"].shape == (17, 3)
