"""Process-worker DataLoader (reference: torch DataLoader subprocess
num_workers, set in every shipped recipe's dataloader config)."""

import numpy as np
import pytest

# process forks / HTTP servers: slow tier (CONTRIBUTING.md)
pytestmark = pytest.mark.slow

from probpose_code_tpu.datasets import DataLoader
from probpose_code_tpu.registry import DATASETS
from probpose_code_tpu.testing import make_synthetic_coco


def _dataset(tmp_path, deterministic=True):
    root = str(tmp_path / "coco")
    make_synthetic_coco(root, num_images=12, instances_per_image=2, img_size=(160, 160))
    codec = dict(type="ProbMap", input_size=(192, 256), heatmap_size=(48, 64), sigma=-1)
    pipeline = [
        dict(type="LoadImage"),
        dict(type="GetBBoxCenterScale"),
        dict(type="TopdownAffine", input_size=(192, 256), use_udp=True, input_padding=1.25),
        dict(type="GenerateTarget", encoder=codec),
        dict(type="PackPoseInputs"),
    ]
    if not deterministic:
        pipeline.insert(2, dict(type="RandomFlip", direction="horizontal"))
        pipeline.insert(3, dict(type="RandomBBoxTransform"))
    return DATASETS.build(dict(
        type="CocoDataset", data_root=root, data_mode="topdown",
        ann_file="annotations.json", data_prefix=dict(img="images/"),
        pipeline=pipeline,
    ))


@pytest.mark.parametrize("deterministic", [True, False])
def test_process_workers_match_inprocess(tmp_path, deterministic):
    # the random-pipeline leg proves per-task seeding: augmentation draws
    # depend on (seed, epoch, batch id), so content is identical whether the
    # pipeline runs in-process or in N forked workers
    ds = _dataset(tmp_path, deterministic=deterministic)
    kw = dict(batch_size=4, shuffle=True, seed=3, prefetch=2)
    ref_batches = list(DataLoader(ds, num_workers=1, **kw))
    got_batches = list(DataLoader(ds, num_workers=2, **kw))
    assert len(ref_batches) == len(got_batches) >= 2
    for ref, got in zip(ref_batches, got_batches):
        assert set(ref) == set(got)
        for k in ref:
            if k == "data_samples":
                assert [d.img_id for d in ref[k]] == [d.img_id for d in got[k]]
                continue
            np.testing.assert_array_equal(np.asarray(ref[k]), np.asarray(got[k]), err_msg=k)


def test_inprocess_seeding_restores_ambient_rng(tmp_path):
    ds = _dataset(tmp_path, deterministic=False)
    np.random.seed(123)
    list(DataLoader(ds, batch_size=4, shuffle=True, seed=3, num_workers=1))
    after_loader = np.random.rand(4)
    np.random.seed(123)
    expected = np.random.rand(4)
    np.testing.assert_array_equal(after_loader, expected)


def test_process_workers_shuffle_epochs_differ(tmp_path):
    ds = _dataset(tmp_path)
    loader = DataLoader(ds, batch_size=4, shuffle=True, num_workers=2, seed=0)
    loader.set_epoch(0)
    ids0 = [d.img_id for b in loader for d in b["data_samples"]]
    loader.set_epoch(1)
    ids1 = [d.img_id for b in loader for d in b["data_samples"]]
    assert sorted(ids0) == sorted(ids1) and ids0 != ids1


def test_process_worker_exception_propagates(tmp_path):
    ds = _dataset(tmp_path)

    class Boom:
        def __len__(self):
            return len(ds)

        def __getitem__(self, i):
            if i == 5:
                raise ValueError("boom at 5")
            return ds[i]

    loader = DataLoader(Boom(), batch_size=4, shuffle=False, num_workers=2)
    with pytest.raises(RuntimeError, match="worker failed"):
        list(loader)
