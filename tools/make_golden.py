"""Generate golden test fixtures from the reference implementation.

Loads the reference's pure-numeric modules (numpy/scipy/cv2/torch only — no
mmpose package import needed) directly by file path, evaluates them on seeded
random inputs, and stores inputs + expected outputs in ``tests/golden/*.npz``.

Run once where ``/root/reference`` is available; the .npz files are committed
so the test suite is self-contained. This script never copies reference code
into the repo — it records reference *outputs* to prove numerical parity.

Usage: python tools/make_golden.py
"""

import importlib.util
import os
import sys
import types

import numpy as np

REF = os.environ.get("REFERENCE_ROOT", "/root/reference")
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")
os.makedirs(OUT, exist_ok=True)


def load_module(name: str, path: str, package_stubs=()):
    for stub in package_stubs:
        if stub not in sys.modules:
            sys.modules[stub] = types.ModuleType(stub)
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


ref_oks_map = load_module("ref_oks_map", f"{REF}/mmpose/codecs/utils/oks_map.py")
ref_post = load_module("ref_post", f"{REF}/mmpose/codecs/utils/post_processing.py")
ref_gauss = load_module("ref_gauss", f"{REF}/mmpose/codecs/utils/gaussian_heatmap.py")
ref_offset = load_module("ref_offset", f"{REF}/mmpose/codecs/utils/offset_heatmap.py")
# refinement imports `.post_processing`; emulate the package context
sys.modules["ref_codecs_utils"] = types.ModuleType("ref_codecs_utils")
sys.modules["ref_codecs_utils"].__path__ = [f"{REF}/mmpose/codecs/utils"]
sys.modules["ref_codecs_utils.post_processing"] = ref_post
spec = importlib.util.spec_from_file_location(
    "ref_codecs_utils.refinement", f"{REF}/mmpose/codecs/utils/refinement.py"
)
ref_refine = importlib.util.module_from_spec(spec)
sys.modules["ref_codecs_utils.refinement"] = ref_refine
spec.loader.exec_module(ref_refine)

ref_bbox = load_module("ref_bbox", f"{REF}/mmpose/structures/bbox/transforms.py")
ref_minpad = load_module("ref_minpad", f"{REF}/mmpose/structures/keypoint/keypoints_min_padding.py")

rng = np.random.RandomState(20250816)

W_HM, H_HM, K = 48, 64, 17


def rand_keypoints(n=1, k=K, w=192, h=256, lo=-0.2, hi=1.2):
    """Keypoints in input space, some outside the image."""
    kx = rng.uniform(lo * w, hi * w, size=(n, k, 1))
    ky = rng.uniform(lo * h, hi * h, size=(n, k, 1))
    return np.concatenate([kx, ky], axis=2).astype(np.float32)


def rand_heatmaps(k=K, h=H_HM, w=W_HM, peaked=True):
    hm = rng.rand(k, h, w).astype(np.float32) * 0.1
    if peaked:
        for i in range(k):
            cy, cx = rng.randint(2, h - 2), rng.randint(2, w - 2)
            yy, xx = np.mgrid[0:h, 0:w]
            hm[i] += np.exp(-((xx - cx) ** 2 + (yy - cy) ** 2) / (2 * 2.5**2)).astype(np.float32)
    return hm


# ---------------------------------------------------------------- probmaps
scale = (np.array([192, 256]) - 1) / (np.array([W_HM, H_HM]) - 1)
kpts_in = rand_keypoints() / scale.astype(np.float32)
vis = (rng.rand(1, K) > 0.2).astype(np.float32)
cases = {}
for sig_name, sig in [("adaptive", -1.0), ("fixed", 0.8)]:
    hm, w_ = ref_oks_map.generate_probmaps((W_HM, H_HM), kpts_in.copy(), vis.copy(), sigma=sig)
    cases[f"probmap_{sig_name}_heatmaps"] = hm
    cases[f"probmap_{sig_name}_weights"] = w_
np.savez_compressed(
    f"{OUT}/probmaps.npz", keypoints=kpts_in, visible=vis, **cases
)

# ------------------------------------------------------------ gaussian maps
kpts_hm = rand_keypoints(n=2, w=W_HM, h=H_HM, lo=-0.15, hi=1.15)
vis2 = (rng.rand(2, K) > 0.2).astype(np.float32)
g_msra, w_msra = ref_gauss.generate_gaussian_heatmaps((W_HM, H_HM), kpts_hm.copy(), vis2.copy(), sigma=2.0)
g_unb, w_unb = ref_gauss.generate_unbiased_gaussian_heatmaps((W_HM, H_HM), kpts_hm.copy(), vis2.copy(), sigma=2.0)
g_udp, w_udp = ref_gauss.generate_udp_gaussian_heatmaps((W_HM, H_HM), kpts_hm.copy(), vis2.copy(), sigma=2.0)
g_off, w_off = ref_offset.generate_offset_heatmap((W_HM, H_HM), kpts_hm[:1].copy(), vis2[:1].copy(), 0.0546875)
np.savez_compressed(
    f"{OUT}/gaussians.npz",
    keypoints=kpts_hm, visible=vis2,
    msra=g_msra, msra_w=w_msra,
    unbiased=g_unb, unbiased_w=w_unb,
    udp=g_udp, udp_w=w_udp,
    offset=g_off, offset_w=w_off,
)

# --------------------------------------------------------------- decode ops
hm = rand_heatmaps()
locs_exp, vals_exp = ref_post.get_heatmap_expected_value(hm.copy())
locs_max, vals_max = ref_post.get_heatmap_maximum(hm.copy())
blurred = ref_post.gaussian_blur(hm.copy(), 11)
blurred17 = ref_post.gaussian_blur(hm.copy(), 17)

kpts0 = locs_max[None].copy()
ref_dark = ref_refine.refine_keypoints_dark(kpts0.copy(), hm.copy(), 11)
ref_dark_udp = ref_refine.refine_keypoints_dark_udp(kpts0.copy(), hm.copy(), 11)
ref_quarter = ref_refine.refine_keypoints(kpts0.copy(), hm.copy())

np.savez_compressed(
    f"{OUT}/decode.npz",
    heatmaps=hm,
    locs_exp=locs_exp, vals_exp=vals_exp,
    locs_max=locs_max, vals_max=vals_max,
    blurred=blurred, blurred17=blurred17,
    dark=ref_dark, dark_udp=ref_dark_udp, quarter=ref_quarter,
)

# ----------------------------------------------------------------- simcc
def rand_simcc(n, k, w, sigma=6.0):
    """Gaussian-peaked SimCC vectors + noise (realistic network output)."""
    out = rng.rand(n, k, w).astype(np.float32) * 0.05
    xs = np.arange(w, dtype=np.float32)
    for i in range(n):
        for j in range(k):
            mu = rng.uniform(8, w - 8)
            out[i, j] += np.exp(-((xs - mu) ** 2) / (2 * sigma**2)).astype(np.float32)
    return out


simcc_x = rand_simcc(2, K, 384)
simcc_y = rand_simcc(2, K, 512)
locs_sc, vals_sc = ref_post.get_simcc_maximum(simcc_x.copy(), simcc_y.copy())
locs_sm, vals_sm = ref_post.get_simcc_maximum(simcc_x.copy(), simcc_y.copy(), apply_softmax=True)
kx = locs_sc[..., 0].copy()
kx_ref = ref_refine.refine_simcc_dark(kx.copy(), simcc_x.copy(), 11)
np.savez_compressed(
    f"{OUT}/simcc.npz",
    simcc_x=simcc_x, simcc_y=simcc_y,
    locs=locs_sc, vals=vals_sc,
    locs_softmax=locs_sm, vals_softmax=vals_sm,
    dark_x_in=kx, dark_x=kx_ref,
)

# ------------------------------------------------------------------- bbox
bboxes = rng.rand(8, 4).astype(np.float32) * 200
bboxes[:, 2:] += bboxes[:, :2]  # xyxy
centers, scales = ref_bbox.bbox_xyxy2cs(bboxes, padding=1.25)
udp_mats = np.stack(
    [ref_bbox.get_udp_warp_matrix(centers[i], scales[i], rot=r, output_size=(192, 256))
     for i, r in enumerate(np.linspace(-40, 40, 8))]
)
warp_mats = np.stack(
    [ref_bbox.get_warp_matrix(centers[i], scales[i], rot=r, output_size=(192, 256))
     for i, r in enumerate(np.linspace(-40, 40, 8))]
)
warp_mats_inv = np.stack(
    [ref_bbox.get_warp_matrix(centers[i], scales[i], rot=r, output_size=(192, 256), inv=True)
     for i, r in enumerate(np.linspace(-40, 40, 8))]
)
kpts51 = rng.rand(6, 17, 3).astype(np.float32)
kpts51[..., :2] *= 300
kpts51[..., 2] = (kpts51[..., 2] > 0.4).astype(np.float32) * 2
minpads = np.stack(
    [ref_minpad.find_min_padding_exact(bboxes[i], kpts51[i % 6].copy()) for i in range(6)]
)
fixed_xywh = ref_minpad.fix_bbox_aspect_ratio(
    ref_bbox.bbox_xyxy2xywh(bboxes.copy()), aspect_ratio=0.75, padding=1.25, bbox_format="xywh"
)
fixed_xyxy = ref_minpad.fix_bbox_aspect_ratio(bboxes.copy(), aspect_ratio=0.75, padding=1.25, bbox_format="xyxy")
np.savez_compressed(
    f"{OUT}/bbox.npz",
    bboxes=bboxes, centers=centers, scales=scales,
    rots=np.linspace(-40, 40, 8),
    udp_mats=udp_mats, warp_mats=warp_mats, warp_mats_inv=warp_mats_inv,
    kpts=kpts51, minpads=minpads, fixed_xywh=fixed_xywh, fixed_xyxy=fixed_xyxy,
)

print("golden fixtures written to", os.path.abspath(OUT))
for f in sorted(os.listdir(OUT)):
    print(" ", f, os.path.getsize(os.path.join(OUT, f)), "bytes")
