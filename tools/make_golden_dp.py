"""Golden fixtures for the DoubleProbMap codec from the reference impl.

Loads ``/root/reference/mmpose/codecs/double_probmap.py`` with stubbed
mmpose package machinery (registry decorator + BaseKeypointCodec no-op),
encodes/decodes seeded inputs, and stores the outputs in
``tests/golden/double_probmap.npz``. Records outputs only — no reference
code is copied.

Usage: python tools/make_golden_dp.py
"""

import importlib.util
import os
import sys
import types

import numpy as np

REF = os.environ.get("REFERENCE_ROOT", "/root/reference")
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")


def _stub(name, **attrs):
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


def load_reference_dp():
    class _Registry:
        def register_module(self, *a, **k):
            def deco(cls):
                return cls

            return deco

    class _BaseCodec:
        auxiliary_encode_keys = set()
        field_mapping_table = {}
        instance_mapping_table = {}
        label_mapping_table = {}
        support_batch_decoding = False

    _stub("mmpose")
    _stub("mmpose.registry", KEYPOINT_CODECS=_Registry())

    def _load(name, path):
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        return mod

    base = _stub("mmpose.codecs")
    base.__path__ = [f"{REF}/mmpose/codecs"]
    _stub("mmpose.codecs.base", BaseKeypointCodec=_BaseCodec)
    utils = _load("mmpose.codecs.utils", f"{REF}/mmpose/codecs/utils/__init__.py")
    sys.modules["mmpose.codecs.utils"] = utils
    dp = _load("mmpose.codecs.double_probmap", f"{REF}/mmpose/codecs/double_probmap.py")
    return dp.DoubleProbMap


def main():
    DoubleProbMap = load_reference_dp()
    codec = DoubleProbMap(
        input_size=(192, 256), heatmap_size=(48, 64), sigma=-1,
        in_heatmap_padding=1.0, out_heatmap_padding=1.25,
    )
    rng = np.random.RandomState(20250817)
    kpts = np.stack(
        [rng.uniform(-40, 232, (1, 17)), rng.uniform(-50, 306, (1, 17))], axis=-1
    ).astype(np.float32)
    vis = (rng.rand(1, 17) > 0.2).astype(np.float32)
    visibility = (rng.rand(1, 17) > 0.3).astype(np.float32) * vis

    enc = codec.encode(kpts.copy(), vis.copy(), keypoints_visibility=visibility.copy())

    hm = rng.rand(17, 64, 48).astype(np.float32)
    dec_in_k, dec_in_s = codec.decode(hm.copy(), htm_type="in")
    dec_out_k, dec_out_s = codec.decode(hm.copy(), htm_type="out")

    np.savez(
        os.path.join(OUT, "double_probmap.npz"),
        keypoints=kpts, visible=vis, visibility=visibility,
        heatmaps=enc["heatmaps"], out_heatmaps=enc["out_heatmaps"],
        keypoint_weights=enc["keypoint_weights"], out_kpt_weights=enc["out_kpt_weights"],
        in_image=enc["in_image"].astype(np.float32), annotated=enc["annotated"].astype(np.float32),
        decode_hm=hm, dec_in_k=dec_in_k, dec_in_s=dec_in_s,
        dec_out_k=dec_out_k, dec_out_s=dec_out_s,
    )
    print("wrote tests/golden/double_probmap.npz")


if __name__ == "__main__":
    main()
