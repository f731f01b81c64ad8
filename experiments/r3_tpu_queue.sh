#!/bin/bash
# Round-3 TPU work queue: run every pending on-device probe in sequence the
# moment the tunneled backend comes back, each in its own subprocess so a
# remote-compiler crash doesn't take down the rest.  Logs to /tmp/r3q_*.log.
#
#   PYTHONPATH=/root/repo:/root/.axon_site bash experiments/r3_tpu_queue.sh
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
  echo "== $name start $(date -u +%H:%M:%S)" | tee -a /tmp/r3q_status.log
  wait_backend || { echo "== $name SKIPPED (backend never came up)" \
                    | tee -a /tmp/r3q_status.log; return 1; }
  timeout "$tmo" "$@" > "/tmp/r3q_$name.log" 2>&1
  echo "== $name exit $? $(date -u +%H:%M:%S)" | tee -a /tmp/r3q_status.log
}

# /tmp (and the persistent compile cache) does not survive machine
# recycling — warm the b16 headline executables first so a crash later in
# the queue cannot cost the bench its batch-16 numbers.
run warm       5400 python experiments/warm_cache.py
run midpoint   7500 python experiments/midpoint_probe.py
run copyhunt16 4000 python experiments/infer_copy_hunt.py 16
run aux_ab     2400 python experiments/aux_workloads_probe.py
run conv192    5400 python experiments/train192_convergence.py
run bench      5400 python bench.py
echo "== queue done $(date -u +%H:%M:%S)" | tee -a /tmp/r3q_status.log
