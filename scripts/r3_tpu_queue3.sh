#!/bin/bash
# Round-3 TPU queue, phase 3: XLA-flag A/B ladder targeting the measured
# bottleneck (DESIGN.md per-level roofline: HBM-bound GroupNorm reduce+
# broadcast chains between convs). Candidate flags verified present in
# this libtpu build (strings libtpu.so). Each run is a fresh process
# (jit caches + env are trace-time-captured).
# Usage: nohup bash scripts/r3_tpu_queue3.sh > /tmp/r3_queue3.log 2>&1 &
set -u
cd /root/repo

log() { echo "=== [$(date -u +%H:%M:%S)] $*"; }

log "waiting for phase 2 to finish"
until grep -q "phase 2 done" /tmp/r3_queue2.log 2>/dev/null; do sleep 120; done
log "phase 2 done; starting phase 3"

run() {
  local name=$1 tmo=$2; shift 2
  log "RUN $name"
  timeout "$tmo" env "$@" 2>&1 | tail -6
  log "END $name"
}

# GN is reduce(H,W,C/G) -> broadcast-apply: the rwb (reduce+broadcast)
# fusion pass is the targeted lever; multi_dim_reduce_rwb lets it fire on
# the multi-dim GN reduce. The =false run calibrates whether it is
# already on by default.
run rwb_on   1200 -- XLA_FLAGS="--xla_tpu_rwb_fusion=true --xla_tpu_allow_multi_dim_reduce_rwb=true" python bench.py
run rwb_off  1200 -- XLA_FLAGS="--xla_tpu_rwb_fusion=false" python bench.py
run aggr_layout 1200 -- XLA_FLAGS="--xla_tpu_enable_aggressive_loop_fusion_layout_opt=true" python bench.py
run nested_loop 1200 -- XLA_FLAGS="--xla_tpu_enable_multi_level_nested_loop_fusion=true" python bench.py
run slp_bf16 1200 -- XLA_FLAGS="--xla_tpu_enable_bf16_slp_vectorizer=true" python bench.py
run sched_exp 1200 -- XLA_FLAGS="--xla_tpu_enable_all_experimental_scheduler_features=true" python bench.py
log "phase 3 done"
