"""Native RLE mask ops: round-trips + IoU/merge/area/bbox semantics."""

import numpy as np
import pytest

from probpose_code_tpu.evaluation.functional import mask as maskUtils


@pytest.fixture(scope="module", autouse=True)
def native_lib():
    lib = maskUtils._get_lib()
    assert lib is not None, "native librle_mask.so failed to build with g++"
    return lib


def random_mask(h=37, w=53, seed=0, p=0.3):
    rng = np.random.RandomState(seed)
    return (rng.rand(h, w) < p).astype(np.uint8)


def test_encode_decode_roundtrip():
    for seed in range(5):
        m = random_mask(seed=seed)
        rle = maskUtils.encode(m)
        back = maskUtils.decode(rle)
        np.testing.assert_array_equal(back, m)


def test_area():
    m = random_mask(seed=1)
    rle = maskUtils.encode(m)
    assert maskUtils.area(rle) == int(m.sum())


def test_iou_matches_dense():
    a = random_mask(seed=2)
    b = random_mask(seed=3)
    ra, rb = maskUtils.encode(a), maskUtils.encode(b)
    ious = maskUtils.iou([ra], [rb], [0])
    inter = np.logical_and(a, b).sum()
    union = np.logical_or(a, b).sum()
    np.testing.assert_allclose(ious[0, 0], inter / union, atol=1e-9)

    # crowd semantics: intersection over detection area
    ious_crowd = maskUtils.iou([ra], [rb], [1])
    np.testing.assert_allclose(ious_crowd[0, 0], inter / a.sum(), atol=1e-9)


def test_merge():
    a = random_mask(seed=4)
    b = random_mask(seed=5)
    union = maskUtils.decode(maskUtils.merge([maskUtils.encode(a), maskUtils.encode(b)]))
    np.testing.assert_array_equal(union, np.logical_or(a, b).astype(np.uint8))
    inter = maskUtils.decode(maskUtils.merge([maskUtils.encode(a), maskUtils.encode(b)], intersect=True))
    np.testing.assert_array_equal(inter, np.logical_and(a, b).astype(np.uint8))


def test_poly_rasterization():
    # axis-aligned square [10, 30) x [5, 20)
    poly = [10, 5, 30, 5, 30, 20, 10, 20]
    rles = maskUtils.frPoly([poly], h=40, w=50)
    m = maskUtils.decode(rles[0])
    assert m[10, 15] == 1 and m[4, 15] == 0 and m[21, 15] == 0
    assert abs(int(m.sum()) - 20 * 15) <= 40  # boundary pixels tolerance


def test_to_bbox():
    m = np.zeros((40, 50), np.uint8)
    m[5:15, 10:30] = 1
    bbox = maskUtils.toBbox(maskUtils.encode(m))
    np.testing.assert_allclose(bbox, [10, 5, 20, 10])
