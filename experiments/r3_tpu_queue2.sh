#!/bin/bash
# Second-stage TPU queue: waits for r3_tpu_queue.sh to finish (the TPU is a
# single shared chip — two probes at once corrupt each other's timings),
# then runs the follow-on probes.  Logs to /tmp/r3q2_*.log.
#
#   PYTHONPATH=/root/repo:/root/.axon_site bash experiments/r3_tpu_queue2.sh
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
export PYTHONPATH="$REPO:/root/.axon_site"
cd "$REPO"

# wait for stage 1 (up to 8h); proceed anyway if its status file never
# appears (stage 1 crashed before logging)
for _ in $(seq 480); do
  grep -q "queue done" /tmp/r3q_status.log 2>/dev/null && break
  sleep 60
done

wait_backend() {
  timeout 14500 python -c "
from mri_epilepsy_diagnosis_tpu.core.mesh import wait_for_backend
import sys
sys.exit(0 if wait_for_backend(max_wait_s=14000, retry_sleep_s=120) else 1)
"
}

run() {  # run <name> <timeout_s> <cmd...>
  local name="$1" tmo="$2"; shift 2
  echo "== $name start $(date -u +%H:%M:%S)" | tee -a /tmp/r3q2_status.log
  wait_backend || { echo "== $name SKIPPED (backend never came up)" \
                    | tee -a /tmp/r3q2_status.log; return 1; }
  timeout "$tmo" "$@" > "/tmp/r3q2_$name.log" 2>&1
  echo "== $name exit $? $(date -u +%H:%M:%S)" | tee -a /tmp/r3q2_status.log
}

run variants   7200 python experiments/infer_variants_ab.py 8
run trainbatch 5400 python experiments/train_batch_probe2.py
run slidingwin 4200 python experiments/sliding_window_probe.py
echo "== queue2 done $(date -u +%H:%M:%S)" | tee -a /tmp/r3q2_status.log
