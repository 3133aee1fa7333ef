"""Dataset + transform pipeline tests on a synthetic mini-COCO."""

import json
import os

import numpy as np
import pytest

from probpose_code_tpu.datasets import CocoDataset, CombinedDataset, DataLoader


@pytest.fixture(scope="module")
def mini_coco(tmp_path_factory):
    """Generate a tiny COCO-style dataset: 4 images, 6 person instances."""
    import cv2

    root = tmp_path_factory.mktemp("minicoco")
    img_dir = root / "images"
    img_dir.mkdir()
    rng = np.random.RandomState(0)

    images, annotations = [], []
    ann_id = 1
    for img_id in range(1, 5):
        h, w = 240 + 16 * img_id, 320
        img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        fname = f"{img_id:06d}.jpg"
        cv2.imwrite(str(img_dir / fname), img)
        images.append(dict(id=img_id, file_name=fname, width=w, height=h))

        for _ in range(1 + img_id % 2):
            x, y = rng.randint(10, w // 2), rng.randint(10, h // 2)
            bw, bh = rng.randint(60, 120), rng.randint(80, 140)
            kpts = []
            num_kpts = 0
            for k in range(17):
                kx = x + rng.rand() * bw
                ky = y + rng.rand() * bh
                v = int(rng.choice([0, 1, 2], p=[0.2, 0.3, 0.5]))
                if v > 0:
                    num_kpts += 1
                kpts.extend([float(kx), float(ky), v])
            annotations.append(
                dict(
                    id=ann_id,
                    image_id=img_id,
                    category_id=1,
                    bbox=[float(x), float(y), float(bw), float(bh)],
                    area=float(bw * bh),
                    iscrowd=0,
                    keypoints=kpts,
                    num_keypoints=num_kpts,
                )
            )
            ann_id += 1

    dataset = dict(
        images=images,
        annotations=annotations,
        categories=[dict(id=1, name="person", supercategory="person")],
    )
    ann_file = root / "annotations.json"
    ann_file.write_text(json.dumps(dataset))
    return dict(root=str(root), ann_file=str(ann_file), img_dir=str(img_dir))


CODEC = dict(type="ProbMap", input_size=(192, 256), heatmap_size=(48, 64), sigma=-1)

TRAIN_PIPELINE = [
    dict(type="LoadImage"),
    dict(type="GetBBoxCenterScale"),
    dict(type="RandomFlip", direction="horizontal"),
    dict(type="RandomHalfBody"),
    dict(type="RandomBBoxTransform"),
    dict(type="TopdownAffine", input_size=(192, 256), use_udp=True, input_padding=1.25),
    dict(type="GenerateTarget", encoder=CODEC),
    dict(type="PackPoseInputs"),
]

VAL_PIPELINE = [
    dict(type="LoadImage"),
    dict(type="GetBBoxCenterScale"),
    dict(type="TopdownAffine", input_size=(192, 256), use_udp=True, input_padding=1.25),
    dict(type="PackPoseInputs"),
]


def make_dataset(mini_coco, pipeline, test_mode=False):
    return CocoDataset(
        ann_file=mini_coco["ann_file"],
        data_mode="topdown",
        data_prefix=dict(img=mini_coco["img_dir"]),
        pipeline=pipeline,
        test_mode=test_mode,
    )


class TestCocoDataset:
    def test_parse(self, mini_coco):
        ds = make_dataset(mini_coco, [])
        assert len(ds) == 6
        info = ds.get_data_info(0)
        assert info["bbox"].shape == (1, 4)
        assert info["keypoints"].shape == (1, 17, 2)
        assert info["keypoints_visible"].shape == (1, 17)
        assert info["keypoints_visibility"].shape == (1, 17)
        # visibility implies annotated
        assert np.all(info["keypoints_visible"] >= info["keypoints_visibility"])
        assert info["pad_to_contain"].shape == (17,)
        assert info["flip_indices"][1] == 2  # left_eye <-> right_eye

    def test_train_pipeline(self, mini_coco):
        np.random.seed(0)
        ds = make_dataset(mini_coco, TRAIN_PIPELINE)
        sample = ds[0]
        assert sample["inputs"].shape == (256, 192, 3)
        d = sample["data_samples"]
        assert np.asarray(d.gt_fields.heatmaps).shape == (17, 64, 48)
        assert np.asarray(d.gt_instance_labels.keypoint_weights).shape == (1, 17)
        assert "in_image" in d.gt_instances
        assert d.metainfo["input_size"] == (192, 256)

    def test_val_pipeline_and_loader(self, mini_coco):
        ds = make_dataset(mini_coco, VAL_PIPELINE, test_mode=True)
        loader = DataLoader(ds, batch_size=3, shuffle=False, drop_last=True, num_workers=2)
        batches = list(loader)
        assert len(batches) == 2
        b = batches[0]
        assert b["inputs"].shape == (3, 256, 192, 3)
        assert len(b["data_samples"]) == 3
        assert "input_center" in b["data_samples"][0].metainfo

    def test_train_loader_collate(self, mini_coco):
        np.random.seed(1)
        ds = make_dataset(mini_coco, TRAIN_PIPELINE)
        loader = DataLoader(ds, batch_size=4, shuffle=True, num_workers=2)
        b = next(iter(loader))
        assert b["inputs"].shape == (4, 256, 192, 3)
        assert b["heatmaps"].shape == (4, 17, 64, 48)
        assert b["keypoint_weights"].shape == (4, 17)
        assert b["in_image"].shape == (4, 17)
        assert b["annotated"].shape == (4, 17)
        assert b["keypoints_visibility"].shape == (4, 17)

    def test_combined_dataset(self, mini_coco):
        combined = CombinedDataset(
            metainfo=dict(dataset_name="coco"),
            datasets=[
                dict(
                    type="CocoDataset",
                    ann_file=mini_coco["ann_file"],
                    data_mode="topdown",
                    data_prefix=dict(img=mini_coco["img_dir"]),
                    pipeline=[],
                    test_mode=True,
                ),
                dict(
                    type="CocoCropDataset",
                    ann_file=mini_coco["ann_file"],
                    data_mode="topdown",
                    data_prefix=dict(img=mini_coco["img_dir"]),
                    pipeline=[],
                    test_mode=True,
                ),
            ],
            pipeline=VAL_PIPELINE,
            test_mode=True,
        )
        assert len(combined) == 12
        s = combined[0]
        assert s["inputs"].shape == (256, 192, 3)
        s2 = combined[7]
        assert s2["inputs"].shape == (256, 192, 3)

    def test_blackout_transforms(self, mini_coco):
        np.random.seed(2)
        pipeline = [
            dict(type="LoadImage"),
            dict(type="GetBBoxCenterScale"),
            dict(type="TopdownAffine", input_size=(192, 256), use_udp=True, input_padding=1.25),
            dict(type="RandomPatchesBlackout", prob=1.0, mask_ratio=0.5),
            dict(type="RandomEdgesBlackout", prob=1.0),
            dict(type="GenerateTarget", encoder=CODEC),
            dict(type="PackPoseInputs"),
        ]
        ds = make_dataset(mini_coco, pipeline)
        sample = ds[0]
        img = sample["inputs"]
        # blackouts must actually zero pixels
        assert (img == 0).mean() > 0.05
        d = sample["data_samples"]
        assert "keypoints_in_image" in d.gt_instances
