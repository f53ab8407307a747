#!/usr/bin/env bash
# Multi-host (TPU pod) training launcher — equivalent of the reference's
# tools/dist_train.sh (torch.distributed.launch over N GPUs).
#
# On a TPU pod slice, launch this SAME command on every host (e.g. with
# `gcloud compute tpus tpu-vm ssh $TPU --worker=all --command=...`); JAX
# discovers the pod topology from the TPU runtime and
# jax.distributed.initialize() needs no explicit rendezvous. Data
# parallelism is expressed in-program via jax.sharding.Mesh — there is one
# PROCESS per host, not one per chip.
#
# Usage: bash tools/dist_train.sh CONFIG [extra train.py args...]

set -euo pipefail
CONFIG=$1
shift || true

python "$(dirname "$0")/train.py" "$CONFIG" --distributed "$@"
