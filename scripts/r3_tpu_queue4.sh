#!/bin/bash
# Round-3 TPU queue, phase 4: merged re-run of the lost phase-2/3 ladders
# (machine restart wiped /tmp before they executed).
#   a) baseline re-confirmation (bs=128, the 651-samples/s config)
#   b) selective-remat batch ladder (train.remat_levels via BENCH_REMAT)
#   c) XLA fusion-flag A/B at the best known config, targeting the
#      measured GN reduce+broadcast HBM bottleneck (DESIGN.md roofline).
# Each run is a fresh process (jit caches + env are trace-time-captured).
# Usage: nohup bash scripts/r3_tpu_queue4.sh > /tmp/r3_queue4.log 2>&1 &
set -u
cd /root/repo

log() { echo "=== [$(date -u +%H:%M:%S)] $*"; }

run() {
  local name=$1 tmo=$2; shift 2
  log "RUN $name"
  timeout "$tmo" env "$@" 2>&1 | tail -6
  log "END $name"
}

run base_bs128           1200 -- python bench.py
run bench_bs160          1200 -- BENCH_BS=160 python bench.py
run bench_bs192_rematL0  1200 -- BENCH_BS=192 BENCH_REMAT=0, python bench.py
run bench_bs256_rematL0  1200 -- BENCH_BS=256 BENCH_REMAT=0, python bench.py
run bench_bs256_rematL01 1200 -- BENCH_BS=256 BENCH_REMAT=0,1 python bench.py

# HISTORICAL EVIDENCE, NOT RUNNABLE: every XLA_FLAGS rung below ABORTS in
# the client-side flag parser on this backend (the client XLA build does
# not register --xla_tpu_* flags — see utils/compile_opts.py). Kept as the
# record of what was attempted; queue5 re-ran the ladder through the
# working channel (PROBUNET_XLA_OPTS -> PJRT compiler_options).
# GN is reduce(H,W,C/G) -> broadcast-apply: the rwb (reduce+broadcast)
# fusion pass is the targeted lever; multi_dim_reduce_rwb lets it fire on
# the multi-dim GN reduce. The =false run calibrates the default.
# run rwb_on      1200 -- XLA_FLAGS="--xla_tpu_rwb_fusion=true --xla_tpu_allow_multi_dim_reduce_rwb=true" python bench.py
# run rwb_off     1200 -- XLA_FLAGS="--xla_tpu_rwb_fusion=false" python bench.py
# run aggr_layout 1200 -- XLA_FLAGS="--xla_tpu_enable_aggressive_loop_fusion_layout_opt=true" python bench.py
# run nested_loop 1200 -- XLA_FLAGS="--xla_tpu_enable_multi_level_nested_loop_fusion=true" python bench.py
# run slp_bf16    1200 -- XLA_FLAGS="--xla_tpu_enable_bf16_slp_vectorizer=true" python bench.py
# run sched_exp   1200 -- XLA_FLAGS="--xla_tpu_enable_all_experimental_scheduler_features=true" python bench.py
log "phase 4 done"
