"""HTTP round-trip test for tools/deployment/serve.py.

Counterpart of the reference ``tools/torchserve/test_torchserver.py``: run
the same image through the native API and through the HTTP server, and
assert the responses agree. Model init is seed-deterministic (PRNGKey(0)),
so the subprocess server and the in-process model share identical weights
without shipping a checkpoint.
"""

import json
import os
import os.path as osp
import socket
import subprocess
import sys
import time
import urllib.error
import urllib.request

import numpy as np
import pytest

# process forks / HTTP servers: slow tier (CONTRIBUTING.md)
pytestmark = pytest.mark.slow

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    from tests.test_models.test_probpose_model import TINY_PROBPOSE_CFG

    tmp = tmp_path_factory.mktemp("serve")
    cfg_path = tmp / "tiny_cfg.py"
    cfg_path.write_text("model = " + repr(dict(TINY_PROBPOSE_CFG)) + "\n")

    port = _free_port()
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.Popen(
        [sys.executable, "tools/deployment/serve.py", str(cfg_path), "--port", str(port)],
        cwd=REPO, env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    # wait for the startup line (model build + first compile happen lazily on
    # the first request, so startup itself is fast)
    line = ""
    deadline = time.time() + 120
    while time.time() < deadline:
        line = proc.stdout.readline()
        if "serving pose model" in line:
            break
        if proc.poll() is not None:
            raise RuntimeError(f"server died: {line}")
    else:
        proc.kill()
        raise RuntimeError("server did not start in 120s")
    yield port, str(cfg_path)
    proc.kill()
    proc.wait(timeout=30)


def _post(port, body, timeout=600):
    req = urllib.request.Request(f"http://127.0.0.1:{port}/predict", data=body, method="POST")
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        return resp.status, json.loads(resp.read())


def test_http_round_trip_matches_native_api(server, tmp_path):
    import cv2

    port, cfg_path = server
    rng = np.random.RandomState(3)
    img = (rng.rand(240, 320, 3) * 255).astype(np.uint8)
    img_path = str(tmp_path / "req.jpg")
    cv2.imwrite(img_path, img)

    with open(img_path, "rb") as f:
        body = f.read()
    status, payload = _post(port, body)
    assert status == 200
    assert isinstance(payload, list) and len(payload) == 1
    kpts_server = np.asarray(payload[0]["keypoints"], np.float32)
    scores_server = np.asarray(payload[0]["keypoint_scores"], np.float32)
    assert kpts_server.shape[-2:] == (17, 2)

    # native API on the SAME decoded bytes (the server decodes with
    # cv2.imdecode; imread of the same file is identical)
    from probpose_code_tpu.apis import inference_topdown, init_model

    model = init_model(cfg_path)
    results = inference_topdown(model, cv2.imread(img_path))
    kpts_native = np.asarray(results[0].pred_instances.keypoints, np.float32)
    scores_native = np.asarray(results[0].pred_instances.keypoint_scores, np.float32)

    np.testing.assert_allclose(kpts_server, kpts_native.reshape(kpts_server.shape), atol=1e-3)
    np.testing.assert_allclose(scores_server, scores_native.reshape(scores_server.shape), atol=1e-4)


def test_bad_request_returns_400(server):
    port, _ = server
    try:
        status, payload = _post(port, b"this is not an image")
        assert status == 400 and "error" in payload
    except urllib.error.HTTPError as e:
        assert e.code == 400
        assert "error" in json.loads(e.read())
