#!/usr/bin/env bash
# Multi-host training launcher (counterpart of the reference's
# torch.distributed dist_train.sh, TPU-native).
#
# On a TPU pod slice: run this same command on EVERY host (e.g. via
# `gcloud compute tpus tpu-vm ssh --worker=all`); jax.distributed
# auto-discovers the coordinator and process ids from the TPU metadata.
#
# On CPU/GPU clusters set the JAX coordinator env explicitly:
#   JAX_COORDINATOR_ADDRESS=host0:1234 JAX_NUM_PROCESSES=2 JAX_PROCESS_ID=0 \
#     bash tools/dist_train.sh CONFIG [train.py args...]
#
# Usage: bash tools/dist_train.sh CONFIG [args...]

set -e
CONFIG=$1
shift || true

PYTHONPATH="$(dirname "$0")/..":$PYTHONPATH \
python "$(dirname "$0")/train.py" "$CONFIG" --launcher jax "$@"
