#!/usr/bin/env bash
# Multi-host launcher (reference dist_train.sh contract).
# Single-host multi-chip needs no launcher at all — jax sees every local TPU chip
# and the mesh covers them automatically:
#   ./dist_train.sh -c orienmask_yolo_coco_544_anchor4_fpn_plus
# Multi-host (one process per host):
#   COORDINATOR=host0:1234 NUM_PROCESSES=4 PROCESS_ID=$i ./dist_train.sh -c <cfg>
set -e

if [ -n "${NUM_PROCESSES}" ] && [ "${NUM_PROCESSES}" -gt 1 ]; then
  exec python train.py "$@" \
    --coordinator "${COORDINATOR:?set COORDINATOR=host:port}" \
    --num-processes "${NUM_PROCESSES}" \
    --process-id "${PROCESS_ID:?set PROCESS_ID}"
else
  exec python train.py "$@"
fi
