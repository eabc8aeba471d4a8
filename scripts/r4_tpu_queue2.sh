#!/bin/bash
# Round-4 queue 2 — byte-sink A/Bs from the per-fusion HBM itemization
# (scripts/fusion_table.py; VERDICT r3 #1):
#   maxpool: reshape+max (elementwise VJP) vs lax.reduce_window
#            (select-and-scatter VJP, 1.06 GB/step, unfusable)
#   dropout: u32 raw-bits compare (no _uniform convert, whose output the
#            scheduler layout-copies at ~537 MB x 7 sites) vs bernoulli
# Run serially (1-core host): bash scripts/r4_tpu_queue2.sh > /tmp/r4c_queue.log 2>&1
set -u
cd "$(dirname "$0")/.."

run() {
  local name="$1"; shift
  echo "=== $name: $* ==="
  timeout 1500 "$@" 2>&1 | grep -v WARNING
  echo
}

echo "--- phase 1: maxpool + dropout A/B (flagship bs=128 bf16 M=15) ---"
run maxpool_reduce_window env PROBUNET_MAXPOOL_IMPL=reduce_window python bench.py
run maxpool_reshape       python bench.py
run dropout_u32           env PROBUNET_DROPOUT_BITS=u32 python bench.py
run both_off_control      env PROBUNET_MAXPOOL_IMPL=reduce_window PROBUNET_DROPOUT_BITS=32 python bench.py

echo "--- done ---"
