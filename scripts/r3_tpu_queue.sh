#!/bin/bash
# Round-3 TPU experiment queue. Waits for the axon tunnel to come back,
# then runs the perf A/B ladder, one fresh process per bench (jit caches
# and PROBUNET_* env are trace-time-captured — see ops/losses.py).
# Usage: nohup bash scripts/r3_tpu_queue.sh > /tmp/r3_queue.log 2>&1 &
set -u
cd /root/repo

log() { echo "=== [$(date -u +%H:%M:%S)] $*"; }

log "waiting for TPU tunnel"
until timeout 90 python -c "
import jax, jax.numpy as jnp
print(float(jax.jit(lambda a: (a@a))(jnp.ones((128,128)))[0,0]))
" >/dev/null 2>&1; do
  sleep 180
done
log "TPU reachable"

run() { # name, timeout_s, env... -- cmd...
  local name=$1 tmo=$2; shift 2
  log "RUN $name"
  timeout "$tmo" env "$@" 2>&1 | tail -6
  log "END $name (rc=$?)"
}

run entry        900  -- python __graft_entry__.py
run bench_base   1200 -- python bench.py
run bench_bs192  1200 -- BENCH_BS=192 python bench.py
run bench_bs256  1200 -- BENCH_BS=256 python bench.py
run bench_vmem48 1200 -- XLA_FLAGS=--xla_tpu_scoped_vmem_limit_kib=49152 python bench.py
run bench_vmem96 1200 -- XLA_FLAGS=--xla_tpu_scoped_vmem_limit_kib=98304 python bench.py
run bench_eval   1200 -- BENCH_MODE=eval python bench.py
run bench_ens    1200 -- BENCH_MODE=ensemble python bench.py
log "queue done"
