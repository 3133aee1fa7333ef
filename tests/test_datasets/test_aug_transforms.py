"""Color-aug / annotation-filter / mosaic-mixup transforms
(reference ``datasets/transforms/common_transforms.py:962-1578``,
``mix_img_transforms.py``)."""

import numpy as np


def _img_sample(h=64, w=48, n=2, K=17):
    rng = np.random.RandomState(0)
    return dict(
        img=rng.randint(0, 255, (h, w, 3), dtype=np.uint8),
        img_shape=(h, w), ori_shape=(h, w),
        bbox=np.array([[2.0, 2.0, 40.0, 60.0], [5.0, 5.0, 6.0, 6.0]], np.float32)[:n],
        bbox_score=np.ones(n, np.float32),
        keypoints=(rng.rand(n, K, 2) * [w, h]).astype(np.float32),
        keypoints_visible=np.ones((n, K), np.float32),
    )


def test_photometric_distortion_valid_uint8():
    from probpose_code_tpu.datasets.transforms.common import PhotometricDistortion

    np.random.seed(3)
    data = _img_sample()
    orig = data["img"].copy()
    out = PhotometricDistortion()(data)
    img = out["img"]
    assert img.dtype == np.uint8 and img.shape == orig.shape


def test_yolox_hsv_aug_valid_and_bounded():
    from probpose_code_tpu.datasets.transforms.common import YOLOXHSVRandomAug

    np.random.seed(5)
    data = _img_sample()
    out = YOLOXHSVRandomAug()(data)
    assert out["img"].dtype == np.uint8 and out["img"].shape == (64, 48, 3)


def test_filter_annotations_by_kpt_and_box():
    from probpose_code_tpu.datasets.transforms.common import FilterAnnotations

    data = _img_sample()
    data["keypoints_visible"][1] = 0.0  # second instance loses all kpts
    out = FilterAnnotations(min_kpt_vis=1, by_kpt=True)(dict(data))
    assert out["keypoints"].shape[0] == 1 and out["bbox"].shape[0] == 1

    data2 = _img_sample()
    out2 = FilterAnnotations(by_box=True, by_kpt=False, min_gt_bbox_wh=(10, 10))(dict(data2))
    assert out2["bbox"].shape[0] == 1  # the 1x1 box is dropped


class _FakeDataset:
    """Minimal dataset protocol for MixImageTransform."""

    def __len__(self):
        return 4

    def get_data_info(self, i):
        return _img_sample()


def test_mosaic_mixes_four_images():
    from probpose_code_tpu.datasets.transforms.mix_img_transforms import Mosaic

    import random

    random.seed(0)
    np.random.seed(0)
    t = Mosaic(img_scale=(64, 64), prob=1.0)
    data = _img_sample()
    data["dataset"] = _FakeDataset()
    out = t(data)
    assert out["img"].shape[0] == 128 and out["img"].shape[1] == 128  # 2x img_scale
    assert out["keypoints"].shape[0] >= 2  # instances from several tiles
    assert "dataset" in out  # restored for downstream transforms


def test_yolox_mixup_combines_two():
    from probpose_code_tpu.datasets.transforms.mix_img_transforms import YOLOXMixUp

    import random

    random.seed(1)
    np.random.seed(1)
    t = YOLOXMixUp(img_scale=(64, 48), ratio_range=(1.0, 1.0), prob=1.0)
    data = _img_sample()
    data["dataset"] = _FakeDataset()
    out = t(data)
    assert out["img"].shape[2] == 3
    assert out["keypoints"].shape[0] >= 2


def test_bottomup_random_crop_absolute():
    from probpose_code_tpu.datasets.transforms.bottomup import BottomupRandomCrop

    np.random.seed(7)
    data = _img_sample(h=80, w=100)
    t = BottomupRandomCrop(crop_size=(60, 50), crop_type="absolute")  # (w, h)
    out = t(dict(data))
    assert out is not None
    assert out["img"].shape[:2] == (50, 60)
    # bboxes/keypoints live inside the crop window
    assert out["bbox"][..., 0::2].max() <= 60 and out["bbox"][..., 1::2].max() <= 50
    assert out["keypoints"][..., 0].max() <= 60 and out["keypoints"][..., 1].max() <= 50
    # translation recorded in warp_mat (reference :697-702)
    assert out["warp_mat"].shape == (3, 3)
    np.testing.assert_allclose(np.diag(out["warp_mat"]), 1.0)


def test_bottomup_random_crop_drops_empty():
    from probpose_code_tpu.datasets.transforms.bottomup import BottomupRandomCrop

    np.random.seed(0)
    data = _img_sample(h=80, w=100)
    # boxes far outside any possible 10x10 window at the bottom-right corner
    data["bbox"] = np.array([[0.0, 0.0, 4.0, 4.0]], np.float32)
    data["keypoints"] = data["keypoints"][:1]
    data["keypoints_visible"] = data["keypoints_visible"][:1]

    t = BottomupRandomCrop(crop_size=(10, 10), crop_type="absolute", allow_negative_crop=False)
    dropped = any(
        t({**data, "img": data["img"].copy(), "bbox": data["bbox"].copy(),
           "keypoints": data["keypoints"].copy(),
           "keypoints_visible": data["keypoints_visible"].copy()}) is None
        for _ in range(20)
    )
    assert dropped  # some windows miss the tiny corner box -> sample skipped


def test_bottomup_random_choice_resize_keep_ratio():
    from probpose_code_tpu.datasets.transforms.bottomup import BottomupRandomChoiceResize

    np.random.seed(1)
    data = _img_sample(h=60, w=90)
    t = BottomupRandomChoiceResize(scales=[(100, 200)], keep_ratio=True)
    out = t(dict(data))
    nh, nw = out["img"].shape[:2]
    # long edge <= 200, short edge <= 100, aspect preserved
    assert max(nh, nw) <= 200 and min(nh, nw) <= 100
    assert abs(nw / nh - 90 / 60) < 0.05
    # framework convention: input_size recorded as (w, h) like every other
    # transform; center/scale in the ORIGINAL frame
    assert out["input_size"] == (nw, nh)
    np.testing.assert_allclose(out["input_center"], [45.0, 30.0])
    np.testing.assert_allclose(out["input_scale"], [90.0, 60.0])
    ws, hs = out["scale_factor"]
    np.testing.assert_allclose(out["keypoints"], data["keypoints"] * [ws, hs], atol=1e-4)


def test_single_hand_converter_routes_by_hand_type():
    from probpose_code_tpu.datasets.transforms.converting import SingleHandConverter

    t = SingleHandConverter(
        num_keypoints=8,
        left_hand_mapping=[(0, 0), (1, 1), (2, 2), (3, 3)],
        right_hand_mapping=[(0, 4), (1, 5), (2, 6), (3, 7)])
    base = dict(keypoints=np.arange(8).reshape(1, 4, 2).astype(np.float32),
                keypoints_visible=np.ones((1, 4), np.float32))
    right = t({**base, "hand_type": np.array([[1, 0]])})
    assert right["keypoints"].shape[1] == 8
    assert (right["keypoints"][0, 4] == [0, 1]).all()  # right mapping used
    left = t({**base, "keypoints": base["keypoints"].copy(),
              "keypoints_visible": base["keypoints_visible"].copy(),
              "hand_type": np.array([[0, 1]])})
    assert (left["keypoints"][0, 0] == [0, 1]).all() and (left["keypoints"][0, 4] == 0).all()


class TestAlbumentationNative:
    """Native Albumentation ops (reference ``common_transforms.py:962``
    wraps the albumentations package; the op subset every shipped recipe
    uses is implemented natively)."""

    def _img(self):
        rng = np.random.RandomState(3)
        return (rng.rand(64, 48, 3) * 255).astype(np.uint8)

    def test_rtmpose_recipe_ops(self):
        from probpose_code_tpu.datasets.transforms import Albumentation

        t = Albumentation(transforms=[
            dict(type="Blur", p=1.0),
            dict(type="MedianBlur", p=1.0),
            dict(type="CoarseDropout", max_holes=1, max_height=0.4, max_width=0.4,
                 min_holes=1, min_height=0.2, min_width=0.2, p=1.0),
        ])
        np.random.seed(0)
        img = self._img()
        out = t(dict(img=img.copy()))["img"]
        assert out.shape == img.shape and out.dtype == img.dtype
        assert not np.array_equal(out, img)
        # CoarseDropout must have zeroed a hole of 20-40% of each dim
        zero_frac = (out == 0).all(-1).mean()
        assert zero_frac > 0.2 * 0.2 * 0.5

    def test_each_op_runs(self):
        from probpose_code_tpu.datasets.transforms import Albumentation

        for op in (dict(type="GaussianBlur", blur_limit=5, p=1.0),
                    dict(type="GaussNoise", var_limit=(10, 20), p=1.0),
                    dict(type="RandomBrightnessContrast", p=1.0),
                    dict(type="HueSaturationValue", p=1.0),
                    dict(type="GridDropout", ratio=0.3, p=1.0)):
            np.random.seed(1)
            out = Albumentation(transforms=[op])(dict(img=self._img()))["img"]
            assert out.shape == (64, 48, 3)
            assert np.isfinite(out.astype(np.float64)).all()

    def test_probability_zero_is_identity(self):
        from probpose_code_tpu.datasets.transforms import Albumentation

        img = self._img()
        t = Albumentation(transforms=[dict(type="Blur", p=0.0),
                                      dict(type="CoarseDropout", max_holes=4, p=0.0)])
        np.random.seed(2)
        out = t(dict(img=img.copy()))["img"]
        np.testing.assert_array_equal(out, img)

    def test_unsupported_op_raises(self):
        import pytest
        from probpose_code_tpu.datasets.transforms import Albumentation

        with pytest.raises(ImportError):
            Albumentation(transforms=[dict(type="ElasticTransform", p=0.5)])


def test_bottomup_heatmap_mask_resized_to_heatmap_grid():
    """BottomupGetHeatmapMask must deliver the valid-region mask at HEATMAP
    resolution when targets are present (reference bottomup_transforms.py:
    121-139) and the collate step must lift it into the batch for the
    dekr/cid losses."""
    import numpy as np

    from probpose_code_tpu.datasets.loader import collate_pose_samples
    from probpose_code_tpu.datasets.transforms.bottomup import BottomupGetHeatmapMask
    from probpose_code_tpu.datasets.transforms.formatting import PackPoseInputs

    results = dict(
        img=np.zeros((512, 512, 3), np.uint8),
        ori_shape=(512, 512),
        input_size=(512, 512),
        # polygon covering the left half of the image marked invalid
        invalid_segs=[[[0.0, 0.0, 256.0, 0.0, 256.0, 512.0, 0.0, 512.0]]],
        heatmaps=np.zeros((18, 128, 128), np.float32),
        keypoints=np.zeros((1, 17, 2), np.float32),
        keypoints_visible=np.ones((1, 17), np.float32),
    )
    out = BottomupGetHeatmapMask()(dict(results))
    mask = out["heatmap_mask"]
    assert mask.shape == (128, 128)
    assert set(np.unique(mask)) <= {0.0, 1.0}
    assert mask[:, 80:].mean() > 0.9  # right half valid
    assert mask[:, :48].mean() < 0.1  # left half masked out

    packed = PackPoseInputs()(out)
    batch = collate_pose_samples([packed, packed])
    assert batch["heatmap_mask"].shape == (2, 128, 128)
