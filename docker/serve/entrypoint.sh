#!/bin/sh
# entrypoint: serve a pose model over HTTP (tools/deployment/serve.py).
# usage: <config> [checkpoint] [extra serve.py args...]
set -e
exec python tools/deployment/serve.py "$@" --host 0.0.0.0 --port 8080
