#!/bin/bash
# Fourth-stage TPU queue (round 3): warm the mask-epilogue headline
# executables (bench's infer step changed to packed_unet_mask_v2), then a
# confirmation bench run.
#
#   PYTHONPATH=/root/repo:/root/.axon_site bash experiments/r3_tpu_queue4.sh
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
export PYTHONPATH="$REPO:/root/.axon_site"
cd "$REPO"

wait_backend() {
  timeout 14500 python -c "
from mri_epilepsy_diagnosis_tpu.core.mesh import wait_for_backend
import sys
sys.exit(0 if wait_for_backend(max_wait_s=14000, retry_sleep_s=120) else 1)
"
}

run() {  # run <name> <timeout_s> <cmd...>
  local name="$1" tmo="$2"; shift 2
  echo "== $name start $(date -u +%H:%M:%S)" | tee -a /tmp/r3q4_status.log
  wait_backend || { echo "== $name SKIPPED (backend never came up)" \
                    | tee -a /tmp/r3q4_status.log; return 1; }
  timeout "$tmo" "$@" > "/tmp/r3q4_$name.log" 2>&1
  echo "== $name exit $? $(date -u +%H:%M:%S)" | tee -a /tmp/r3q4_status.log
}

run warm  5400 python experiments/warm_cache.py
run bench 5400 python bench.py
echo "== queue4 done $(date -u +%H:%M:%S)" | tee -a /tmp/r3q4_status.log
