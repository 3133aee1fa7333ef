"""Native fused JPEG-decode + warp kernel (csrc/image_pipeline.cpp).

Parity target: the Python host path — cv2.imread / np.flip /
cv2.warpAffine — which itself mirrors the reference pipeline
(``mmpose/datasets/transforms/topdown_transforms.py:126``). The native
kernel decodes only the sampled JPEG region at its true coordinates and the
warp runs through the same cv2 build, so the exact-mode result is
BIT-IDENTICAL to full decode + warp; the tests pin exact equality.
"""

import os

import cv2
import numpy as np
import pytest

from probpose_code_tpu.datasets import native_decode as nd
from probpose_code_tpu.datasets.transforms.loading import LoadImage, materialize_image
from probpose_code_tpu.structures.bbox import get_udp_warp_matrix, get_warp_matrix

pytestmark = pytest.mark.skipif(not nd.available(), reason="native image pipeline unavailable")


def _jpeg(seed=0, size=(480, 640), quality=92, gray=False):
    rng = np.random.RandomState(seed)
    img = (rng.rand(size[0], size[1], 3) * 255).astype(np.uint8)
    img = cv2.GaussianBlur(img, (5, 5), 2.0)
    if gray:
        img = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)
    ok, enc = cv2.imencode(".jpg", img, [cv2.IMWRITE_JPEG_QUALITY, quality])
    assert ok
    return enc.tobytes()


def test_probe_dims_and_orientation():
    data = _jpeg(size=(123, 456))
    w, h, orient = nd.probe(data)
    assert (w, h) == (456, 123)
    assert orient == 0  # cv2.imencode writes no EXIF
    assert nd.probe(b"not a jpeg") is None


@pytest.mark.parametrize("rot", [0.0, 23.0, -60.0])
@pytest.mark.parametrize("flip", [False, True])
@pytest.mark.parametrize("udp", [True, False])
def test_decode_warp_matches_cv2(rot, flip, udp):
    data = _jpeg(seed=abs(int(rot)) + 100 * flip)
    dec = cv2.imdecode(np.frombuffer(data, np.uint8), cv2.IMREAD_COLOR)
    center = np.array([300.0, 250.0])
    scale = np.array([187.0, 250.0])
    make = get_udp_warp_matrix if udp else get_warp_matrix
    M = make(center, scale, rot, output_size=(192, 256)).astype(np.float64)

    src = np.flip(dec, axis=1).copy() if flip else dec
    ref = cv2.warpAffine(src, M, (192, 256), flags=cv2.INTER_LINEAR)
    out = nd.decode_warp(data, M, (192, 256), flip_h=flip)
    np.testing.assert_array_equal(ref, out)


def test_decode_warp_partially_outside():
    data = _jpeg(seed=7)
    dec = cv2.imdecode(np.frombuffer(data, np.uint8), cv2.IMREAD_COLOR)
    # bbox hanging off the top-left corner: warp samples outside the image
    M = get_udp_warp_matrix(np.array([10.0, -30.0]), np.array([300.0, 400.0]), 0.0, output_size=(192, 256))
    ref = cv2.warpAffine(dec, M, (192, 256), flags=cv2.INTER_LINEAR)
    out = nd.decode_warp(data, M.astype(np.float64), (192, 256))
    np.testing.assert_array_equal(ref, out)
    # fully outside -> all-zero crop
    M2 = get_udp_warp_matrix(np.array([-4000.0, -4000.0]), np.array([100.0, 133.0]), 0.0, output_size=(192, 256))
    out2 = nd.decode_warp(data, M2.astype(np.float64), (192, 256))
    assert out2.sum() == 0


def test_bbox_mask_parity():
    data = _jpeg(seed=3)
    dec = cv2.imdecode(np.frombuffer(data, np.uint8), cv2.IMREAD_COLOR)
    img_h, img_w = dec.shape[:2]
    M = get_udp_warp_matrix(np.array([300.0, 250.0]), np.array([250.0, 333.0]), 17.0, output_size=(192, 256)).astype(np.float64)
    for rect in ([123.4, 50.2, 400.9, 300.1], [-50.0, -20.0, 700.0, 500.0], [600.0, 400.0, 660.0, 470.0]):
        bb = np.asarray(rect, np.float64).copy()
        bb[:2] = np.maximum(bb[:2], 0)
        bb[2:4] = np.minimum(bb[2:4], [img_w, img_h])
        x0, y0, x1, y1 = bb.astype(int)
        mask_full = np.zeros((img_h, img_w), np.uint8)
        mask_full[y0:y1, x0:x1] = 1
        ref_mask = cv2.warpAffine(mask_full, M, (192, 256), flags=cv2.INTER_LINEAR)
        crop, mask = nd.decode_warp(data, M, (192, 256), mask_rect=np.asarray(rect))
        np.testing.assert_array_equal(ref_mask, mask)


def test_grayscale_jpeg():
    data = _jpeg(seed=5, gray=True)
    dec = cv2.imdecode(np.frombuffer(data, np.uint8), cv2.IMREAD_COLOR)  # replicated channels
    M = get_udp_warp_matrix(np.array([300.0, 250.0]), np.array([187.0, 250.0]), 0.0, output_size=(192, 256)).astype(np.float64)
    ref = cv2.warpAffine(dec, M, (192, 256), flags=cv2.INTER_LINEAR)
    out = nd.decode_warp(data, M, (192, 256))
    np.testing.assert_array_equal(ref, out)


def test_fast_scale_downsampled_decode():
    data = _jpeg(seed=9, size=(960, 1280))
    dec = cv2.imdecode(np.frombuffer(data, np.uint8), cv2.IMREAD_COLOR)
    # whole-image crop: ~5x downsample -> DCT-scaled decode engages
    M = get_udp_warp_matrix(np.array([640.0, 480.0]), np.array([1280.0, 1707.0]), 0.0, output_size=(192, 256)).astype(np.float64)
    ref = cv2.warpAffine(dec, M, (192, 256), flags=cv2.INTER_LINEAR)
    out = nd.decode_warp(data, M, (192, 256), fast_scale=True)
    # DCT-domain downscale then bilinear is a different (anti-aliased)
    # resampling — require agreement in the mean, not per-pixel
    assert np.abs(ref.astype(float) - out.astype(float)).mean() < 4.0


def _t(cfg):
    from probpose_code_tpu.registry import TRANSFORMS

    return TRANSFORMS.build(cfg)


def _mini_dataset(tmp_path, n=6):
    from probpose_code_tpu.testing import make_synthetic_coco

    root = str(tmp_path / "coco")
    make_synthetic_coco(root, num_images=n, instances_per_image=1, img_size=(480, 640))
    return root


def _build_pipeline(lazy: bool, with_mask: bool = True):
    from probpose_code_tpu.registry import TRANSFORMS

    codec = dict(type="ProbMap", input_size=(192, 256), heatmap_size=(48, 64), sigma=-1)
    cfgs = [
        dict(type="LoadImage", lazy=lazy),
        dict(type="GetBBoxCenterScale"),
        dict(type="RandomFlip", direction="horizontal"),
        dict(type="RandomHalfBody"),
        dict(type="RandomBBoxTransform"),
        dict(type="TopdownAffine", input_size=(192, 256), use_udp=True, input_padding=1.25,
             with_bbox_mask=with_mask),
        dict(type="GenerateTarget", encoder=codec),
        dict(type="PackPoseInputs"),
    ]
    return [TRANSFORMS.build(c) for c in cfgs]


def test_full_train_pipeline_equivalence(tmp_path):
    """Seeded flagship train pipeline: lazy+native vs eager cv2 paths."""
    from probpose_code_tpu.registry import DATASETS

    root = _mini_dataset(tmp_path)
    results = {}
    for mode, lazy in (("eager", False), ("native", True)):
        ds = DATASETS.build(dict(
            type="CocoDataset", data_root=root, data_mode="topdown",
            ann_file="annotations.json", data_prefix=dict(img="images/"),
            pipeline=_build_pipeline(lazy),
        ))
        outs = []
        for i in range(len(ds)):
            np.random.seed(1234 + i)  # transforms draw from the global RNG
            outs.append(ds[i])
        results[mode] = outs

    flipped_any = False
    for e, n in zip(results["eager"], results["native"]):
        np.testing.assert_array_equal(np.asarray(e["inputs"]), np.asarray(n["inputs"]))
        hm_e = np.asarray(e["data_samples"].gt_fields.heatmaps)
        hm_n = np.asarray(n["data_samples"].gt_fields.heatmaps)
        np.testing.assert_allclose(hm_e, hm_n, atol=1e-6)
        np.testing.assert_array_equal(
            np.asarray(e["data_samples"].gt_instances.bbox_mask),
            np.asarray(n["data_samples"].gt_instances.bbox_mask))
        flipped_any = flipped_any or bool(e["data_samples"].metainfo.get("flip", False))
    assert flipped_any, "seeds never exercised the flip branch"


def test_materialize_fallback_without_affine(tmp_path):
    """A lazy pipeline without TopdownAffine packs real pixels (PackPoseInputs
    materializes), identical to the eager path."""
    from probpose_code_tpu.registry import DATASETS

    root = _mini_dataset(tmp_path, n=2)
    outs = {}
    for mode, lazy in (("eager", False), ("native", True)):
        ds = DATASETS.build(dict(
            type="CocoDataset", data_root=root, data_mode="topdown",
            ann_file="annotations.json", data_prefix=dict(img="images/"),
            pipeline=[
                _t(dict(type="LoadImage", lazy=lazy)),
                _t(dict(type="GetBBoxCenterScale")),
                _t(dict(type="PackPoseInputs")),
            ],
        ))
        outs[mode] = [ds[i] for i in range(len(ds))]
    for e, n in zip(outs["eager"], outs["native"]):
        np.testing.assert_array_equal(np.asarray(e["inputs"]), np.asarray(n["inputs"]))


def test_materialize_reapplies_flip(tmp_path):
    img = (np.random.RandomState(0).rand(60, 80, 3) * 255).astype(np.uint8)
    p = str(tmp_path / "x.jpg")
    cv2.imwrite(p, img, [cv2.IMWRITE_JPEG_QUALITY, 95])
    res = LoadImage(lazy=True)({"img_path": p})
    assert "img_bytes" in res
    res["flip"] = True
    res["flip_direction"] = "horizontal"
    res = materialize_image(res)
    ref = np.flip(cv2.imread(p, cv2.IMREAD_COLOR), axis=1)
    np.testing.assert_array_equal(res["img"], ref)
    # idempotent
    assert materialize_image(res)["img"] is res["img"]


def test_lazy_falls_back_on_png(tmp_path):
    img = (np.random.RandomState(0).rand(40, 50, 3) * 255).astype(np.uint8)
    p = str(tmp_path / "x.png")
    cv2.imwrite(p, img)
    res = LoadImage(lazy=True)({"img_path": p})
    assert "img_bytes" not in res
    np.testing.assert_array_equal(res["img"], cv2.imread(p, cv2.IMREAD_COLOR))


def test_lazy_falls_back_on_exif_orientation(tmp_path):
    try:
        from PIL import Image
    except ImportError:
        pytest.skip("PIL unavailable")
    img = (np.random.RandomState(0).rand(40, 50, 3) * 255).astype(np.uint8)
    p = str(tmp_path / "rot.jpg")
    pil = Image.fromarray(img[..., ::-1])
    exif = pil.getexif()
    exif[0x0112] = 6  # rotate 90 CW
    pil.save(p, exif=exif)
    with open(p, "rb") as f:
        data = f.read()
    assert nd.probe(data)[2] == 6
    res = LoadImage(lazy=True)({"img_path": p})
    assert "img_bytes" not in res  # fell back to cv2.imread (applies EXIF)
    np.testing.assert_array_equal(res["img"], cv2.imread(p, cv2.IMREAD_COLOR))


def test_exif_orientation_with_fill_bytes(tmp_path):
    """0xFF fill bytes before the APP1 marker are legal (spec B.1.1.2); the
    orientation scan must step over them instead of misreading the length."""
    try:
        from PIL import Image
    except ImportError:
        pytest.skip("PIL unavailable")
    img = (np.random.RandomState(0).rand(40, 50, 3) * 255).astype(np.uint8)
    p = str(tmp_path / "rot.jpg")
    pil = Image.fromarray(img[..., ::-1])
    exif = pil.getexif()
    exif[0x0112] = 6
    pil.save(p, exif=exif)
    with open(p, "rb") as f:
        data = f.read()
    assert nd.probe(data)[2] == 6  # sanity: tag is readable unpadded
    # inject two fill bytes before the APP1/Exif marker (PIL may emit APP0
    # first, so locate it)
    app1 = data.index(b"\xff\xe1")
    padded = data[:app1] + b"\xff\xff" + data[app1:]
    assert nd.probe(padded)[2] == 6


def test_lazy_mosaic_aux_samples_materialize(tmp_path):
    """Mosaic aux samples fetched through a lazy pre_transform must carry
    real pixels (a missed materialize yields silent all-black tiles)."""
    from probpose_code_tpu.registry import DATASETS, TRANSFORMS

    root = _mini_dataset(tmp_path, n=4)
    mosaic = _t(dict(
        type="Mosaic", img_scale=(128, 128), prob=1.0,
        pre_transform=[dict(type="LoadImage", lazy=True)],
    ))
    ds = DATASETS.build(dict(
        type="CocoDataset", data_root=root, data_mode="bottomup",
        ann_file="annotations.json", data_prefix=dict(img="images/"),
        pipeline=[_t(dict(type="LoadImage", lazy=True))],
    ))
    results = ds.get_data_info(0)
    results = _t(dict(type="LoadImage", lazy=True))(dict(results))
    results["dataset"] = ds
    np.random.seed(0)
    out = mosaic(results)
    img = np.asarray(out["img"])
    h, w = img.shape[:2]
    quadrants = [img[:h // 2, :w // 2], img[:h // 2, w // 2:], img[h // 2:, :w // 2], img[h // 2:, w // 2:]]
    for q in quadrants:
        assert q.astype(np.int64).sum() > 0, "black mosaic tile: aux sample not materialized"


def test_lazy_rejected_stream_decodes_from_buffer(tmp_path, monkeypatch):
    """Non-JPEG inputs under lazy=True decode from the already-read bytes
    (no second disk read) and match cv2.imread."""
    img = (np.random.RandomState(1).rand(40, 50, 3) * 255).astype(np.uint8)
    p = str(tmp_path / "x.png")
    cv2.imwrite(p, img)
    calls = {"imread": 0}
    real_imread = cv2.imread

    def counting_imread(*a, **k):
        calls["imread"] += 1
        return real_imread(*a, **k)

    monkeypatch.setattr(cv2, "imread", counting_imread)
    res = LoadImage(lazy=True)({"img_path": p})
    np.testing.assert_array_equal(res["img"], real_imread(p, cv2.IMREAD_COLOR))
    assert calls["imread"] == 0, "fell back to a second disk read"
