#!/bin/bash
# Round-3 TPU queue, phase 2: selective-remat batch ladder + profile +
# quality re-run. Waits for phase 1 (r3_tpu_queue.sh) to finish.
# Usage: nohup bash scripts/r3_tpu_queue2.sh > /tmp/r3_queue2.log 2>&1 &
set -u
cd /root/repo

log() { echo "=== [$(date -u +%H:%M:%S)] $*"; }

log "waiting for phase 1 to finish"
until grep -q "queue done" /tmp/r3_queue.log 2>/dev/null; do sleep 120; done
log "phase 1 done; starting phase 2"

run() {
  local name=$1 tmo=$2; shift 2
  log "RUN $name"
  timeout "$tmo" env "$@" 2>&1 | tail -8
  log "END $name"
}

run bench_bs160          1200 -- BENCH_BS=160 python bench.py
run bench_bs192_rematL0  1200 -- BENCH_BS=192 BENCH_REMAT=0, python bench.py
run bench_bs256_rematL0  1200 -- BENCH_BS=256 BENCH_REMAT=0, python bench.py
run bench_bs256_rematL01 1200 -- BENCH_BS=256 BENCH_REMAT=0,1 python bench.py
run profile_step_128     1800 -- python scripts/profile_step.py 128
run quality_run          3600 -- python scripts/quality_run.py
log "phase 2 done"
