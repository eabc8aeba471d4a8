#!/bin/bash
# Round-3 TPU queue, phase 5: compiler-option ladder via PROBUNET_XLA_OPTS
# (PJRT compiler_options — the only channel that reaches the server-side
# TPU compiler on the axon backend; XLA_FLAGS abort in the client parser,
# see utils/compile_opts.py). Train mode, bs=128, vs the 638.7 re-based
# baseline of this machine-day (r3_tpu_queue4 base_bs128).
# Targets the measured bottleneck: HBM-bound GN reduce+broadcast chains
# (DESIGN.md per-level roofline) -> reduce+broadcast fusion, fusion depth
# (scoped VMEM), fusion cost model, loop-fusion layout.
# Usage: nohup bash scripts/r3_tpu_queue5.sh > /tmp/r3_queue5.log 2>&1 &
set -u
cd /root/repo

log() { echo "=== [$(date -u +%H:%M:%S)] $*"; }

run() {
  local name=$1 opts=$2
  log "RUN $name [$opts]"
  timeout 1200 env PROBUNET_XLA_OPTS="$opts" python bench.py 2>&1 | tail -4
  log "END $name"
}

run rwb_on      "xla_tpu_rwb_fusion=true;xla_tpu_allow_multi_dim_reduce_rwb=true"
run rwb_off     "xla_tpu_rwb_fusion=false"
run vmem64      "xla_tpu_scoped_vmem_limit_kib=65536"
run vmem128     "xla_tpu_scoped_vmem_limit_kib=131072"
run aggr_layout "xla_tpu_enable_aggressive_loop_fusion_layout_opt=true"
run nested_loop "xla_tpu_enable_multi_level_nested_loop_fusion=true"
run fusion_cost "xla_tpu_enable_experimental_fusion_cost_model=true"
log "phase 5 done"
