"""Minimal HTTP pose-estimation server (torchserve-handler equivalent).

Counterpart of the reference ``tools/torchserve/mmpose_handler.py``: accepts
POSTed images, runs the top-down model, returns keypoint json. Stdlib-only
(http.server) — production serving would sit behind a real frontend, but the
handler logic (decode request -> batch -> jitted predict -> json) is the
same shape.

Usage: python tools/deployment/serve.py CONFIG [CHECKPOINT] [--port 8080]
Then:  curl -X POST --data-binary @img.jpg http://localhost:8080/predict

The stdlib HTTPServer is single-threaded: requests are handled one at a
time (which also serializes access to the single TPU model). Binds to
127.0.0.1 by default; pass --host 0.0.0.0 only behind a trusted frontend —
there is no authentication.
"""

import os.path as _osp
import sys as _sys

_sys.path.insert(0, _osp.dirname(_osp.dirname(_osp.dirname(_osp.abspath(__file__)))))

import argparse
import json
from http.server import BaseHTTPRequestHandler, HTTPServer

import numpy as np


def build_handler(model):
    from probpose_code_tpu.apis import inference_topdown

    class PoseHandler(BaseHTTPRequestHandler):
        max_body_bytes = 32 * 1024 * 1024

        def do_POST(self):
            try:
                length = int(self.headers.get("Content-Length", 0))
                if length <= 0 or length > self.max_body_bytes:
                    self.send_error(413, f"Content-Length must be in (0, {self.max_body_bytes}]")
                    return
                body = self.rfile.read(length)
                import cv2

                img = cv2.imdecode(np.frombuffer(body, np.uint8), cv2.IMREAD_COLOR)
                if img is None:
                    raise ValueError("request body is not a decodable image")
                results = inference_topdown(model, img)
                payload = [
                    dict(
                        keypoints=np.asarray(r.pred_instances.keypoints).tolist(),
                        keypoint_scores=np.asarray(r.pred_instances.keypoint_scores).tolist(),
                    )
                    for r in results
                ]
                out = json.dumps(payload).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(out)))
                self.end_headers()
                self.wfile.write(out)
            except Exception as e:  # noqa: BLE001
                msg = json.dumps(dict(error=str(e))).encode()
                self.send_response(400)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(msg)))
                self.end_headers()
                self.wfile.write(msg)

        def log_message(self, fmt, *args):  # quiet
            pass

    return PoseHandler


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("config")
    parser.add_argument("checkpoint", nargs="?", default=None)
    parser.add_argument("--port", type=int, default=8080)
    parser.add_argument(
        "--host",
        default="127.0.0.1",
        help="bind address; no auth — expose beyond localhost only behind a trusted frontend",
    )
    args = parser.parse_args()

    from probpose_code_tpu.apis import init_model

    model = init_model(args.config, args.checkpoint)
    server = HTTPServer((args.host, args.port), build_handler(model))
    print(f"serving pose model on {args.host}:{args.port} (POST an image to /predict)")
    server.serve_forever()


if __name__ == "__main__":
    main()
