#!/usr/bin/env bash
# SLURM evaluation launcher (counterpart of the reference's slurm_test.sh).
# One task per host; jax.distributed reads the SLURM_* environment to
# configure the coordinator and process ids.
#
# Usage: bash tools/slurm_test.sh PARTITION JOB_NAME CONFIG CHECKPOINT [args...]
#   NTASKS (default 1) = number of hosts; SRUN_ARGS for extra srun flags.

set -ex
PARTITION=$1
JOB_NAME=$2
CONFIG=$3
CHECKPOINT=$4
NTASKS=${NTASKS:-1}
CPUS_PER_TASK=${CPUS_PER_TASK:-8}
SRUN_ARGS=${SRUN_ARGS:-""}

PYTHONPATH="$(dirname "$0")/..":$PYTHONPATH \
srun -p "${PARTITION}" \
    --job-name="${JOB_NAME}" \
    --ntasks="${NTASKS}" \
    --ntasks-per-node=1 \
    --cpus-per-task="${CPUS_PER_TASK}" \
    --kill-on-bad-exit=1 \
    ${SRUN_ARGS} \
    python -u "$(dirname "$0")/test.py" "${CONFIG}" "${CHECKPOINT}" --launcher slurm "${@:5}"
