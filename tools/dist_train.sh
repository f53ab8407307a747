#!/usr/bin/env bash
# Multi-host / multi-process training launcher — equivalent of the
# reference's tools/dist_train.sh (torch.distributed.launch over N GPUs,
# /root/reference/tools/dist_train.sh:8-9).
#
# Two modes:
#
#   bash tools/dist_train.sh CONFIG [args...]
#     One process on THIS host; on a TPU pod slice, launch the same command
#     on every host (e.g. `gcloud compute tpus tpu-vm ssh $TPU --worker=all
#     --command=...`) and jax.distributed.initialize() discovers the pod
#     topology from the TPU runtime — no explicit rendezvous needed.
#
#   NPROC=2 bash tools/dist_train.sh CONFIG [args...]
#     Spawn NPROC local processes with an explicit localhost rendezvous
#     (the direct analogue of torch.distributed.launch --nproc_per_node=N;
#     used by the CPU multi-process integration tests). Data parallelism is
#     expressed in-program via jax.sharding.Mesh either way — one PROCESS
#     per host, not one per chip.

set -euo pipefail
CONFIG=$1
shift || true

NPROC=${NPROC:-1}
TRAIN="$(dirname "$0")/train.py"

if [ "$NPROC" -le 1 ]; then
    exec python "$TRAIN" "$CONFIG" --distributed "$@"
fi

PORT=${PORT:-$((20000 + RANDOM % 20000))}
pids=()
for ((i = 0; i < NPROC; i++)); do
    python "$TRAIN" "$CONFIG" \
        --coordinator "localhost:${PORT}" \
        --num_processes "$NPROC" --process_id "$i" "$@" &
    pids+=($!)
done
rc=0
for pid in "${pids[@]}"; do
    wait "$pid" || rc=$?
done
exit "$rc"
