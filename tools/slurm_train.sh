#!/usr/bin/env bash
# SLURM launcher — equivalent of the reference's tools/slurm_train.sh.
# Allocates one task per TPU host and runs train.py with coordinator
# rendezvous derived from SLURM env (jax.distributed.initialize reads
# SLURM_* variables natively).
#
# Usage: bash tools/slurm_train.sh PARTITION JOB_NAME CONFIG [N_HOSTS]

set -euo pipefail
PARTITION=$1
JOB_NAME=$2
CONFIG=$3
NHOSTS=${4:-1}

srun -p "${PARTITION}" \
    --job-name="${JOB_NAME}" \
    --ntasks="${NHOSTS}" \
    --ntasks-per-node=1 \
    --kill-on-bad-exit=1 \
    python "$(dirname "$0")/train.py" "${CONFIG}" --distributed
