"""Golden-value tests: bbox/keypoint geometry vs reference outputs."""

import numpy as np

from probpose_code_tpu.structures import (
    bbox_xyxy2cs,
    bbox_xyxy2xywh,
    find_min_padding_exact,
    fix_bbox_aspect_ratio,
    get_udp_warp_matrix,
    get_warp_matrix,
    udp_warp_matrices,
)


def test_bbox_xyxy2cs(golden):
    g = golden("bbox")
    centers, scales = bbox_xyxy2cs(g["bboxes"], padding=1.25)
    np.testing.assert_allclose(centers, g["centers"], atol=1e-5)
    np.testing.assert_allclose(scales, g["scales"], atol=1e-5)


def test_udp_warp_matrix(golden):
    g = golden("bbox")
    for i, r in enumerate(g["rots"]):
        mat = get_udp_warp_matrix(g["centers"][i], g["scales"][i], rot=float(r), output_size=(192, 256))
        np.testing.assert_allclose(mat, g["udp_mats"][i], atol=1e-4)


def test_udp_warp_matrices_batched(golden):
    g = golden("bbox")
    mats = udp_warp_matrices(g["centers"], g["scales"], g["rots"], output_size=(192, 256))
    np.testing.assert_allclose(mats, g["udp_mats"], atol=1e-4)


def test_warp_matrix(golden):
    g = golden("bbox")
    for i, r in enumerate(g["rots"]):
        # reference solves the 3-point system in float32 (cv2); ours in
        # float64 — compare at float32 relative precision
        mat = get_warp_matrix(g["centers"][i], g["scales"][i], rot=float(r), output_size=(192, 256))
        np.testing.assert_allclose(mat, g["warp_mats"][i], rtol=1e-5, atol=1e-2)
        mat_inv = get_warp_matrix(
            g["centers"][i], g["scales"][i], rot=float(r), output_size=(192, 256), inv=True
        )
        np.testing.assert_allclose(mat_inv, g["warp_mats_inv"][i], rtol=1e-5, atol=1e-2)


def test_min_padding(golden):
    g = golden("bbox")
    for i in range(6):
        pad = find_min_padding_exact(g["bboxes"][i], g["kpts"][i % 6].copy())
        np.testing.assert_allclose(pad, g["minpads"][i], atol=1e-6)


def test_fix_aspect_ratio(golden):
    g = golden("bbox")
    out_xywh = fix_bbox_aspect_ratio(
        bbox_xyxy2xywh(g["bboxes"].copy()), aspect_ratio=0.75, padding=1.25, bbox_format="xywh"
    )
    np.testing.assert_allclose(out_xywh, g["fixed_xywh"], atol=1e-4)
    out_xyxy = fix_bbox_aspect_ratio(g["bboxes"].copy(), aspect_ratio=0.75, padding=1.25, bbox_format="xyxy")
    np.testing.assert_allclose(out_xyxy, g["fixed_xyxy"], atol=1e-4)
