#!/bin/bash
# Round-5 queue 3 — mixed-precision PTQ (--quant-skip heads) measured:
#   A. same-day ensemble bench triple: bf16 / int8 / int8+skip-heads
#      (speed retention — the skipped heads run on (B,1,1,C) tensors, so
#      the mixed program should keep ~all of int8's bandwidth win)
#   B. full-scale extremes (10,950 d x M=15 x 3 px) x {bf16, int8,
#      int8 --quant-skip heads} with block maxima now SAVED in
#      extremes.json (sampling is seed-deterministic, so bf16/int8 rerun
#      the exact earlier series — the point is capturing their maxima)
#   C. scripts/maxima_diag.py -> results/int8_ledger/MAXIMA.md
# Run: nohup bash scripts/r5_queue3.sh > /tmp/r5_queue3.log 2>&1 &
#      echo $! > /tmp/r5_queue3.pid
set -x
cd "$(dirname "$0")/.."

CKPT_CFG=results/ckpt_flagship/config.json
CKPT=results/ckpt_flagship/ckpt

run() {
  echo "=== $(date -u +%H:%M:%S) $*"
  "$@"
}

# --- A. ensemble bench triple (same machine-day) ---
run env BENCH_MODE=ensemble python bench.py
run env BENCH_MODE=ensemble BENCH_QUANT=int8 python bench.py
run env BENCH_MODE=ensemble BENCH_QUANT=int8 BENCH_QUANT_SKIP=heads \
  python bench.py

# --- B. full-scale extremes, maxima saved ---
TIMED_OUT=results/int8_ledger/extremes_bf16_maxima.time run \
  python scripts/timed_run.py python -m probunet_tpu extremes \
    --config $CKPT_CFG --ckpt $CKPT --members 15 --batch-size 128 \
    --pixels 20,45 64,64 96,20 --outdir results/extremes_r5b_bf16

TIMED_OUT=results/int8_ledger/extremes_int8_maxima.time run \
  python scripts/timed_run.py python -m probunet_tpu extremes \
    --config $CKPT_CFG --ckpt $CKPT --members 15 --batch-size 128 \
    --pixels 20,45 64,64 96,20 --quant int8 \
    --outdir results/extremes_r5b_int8

TIMED_OUT=results/int8_ledger/extremes_int8heads_maxima.time run \
  python scripts/timed_run.py python -m probunet_tpu extremes \
    --config $CKPT_CFG --ckpt $CKPT --members 15 --batch-size 128 \
    --pixels 20,45 64,64 96,20 --quant int8 --quant-skip heads \
    --outdir results/extremes_r5b_int8heads

# --- C. maxima diagnosis ---
run python scripts/maxima_diag.py | tee results/int8_ledger/MAXIMA.md

echo "=== r5_queue3 done $(date -u)"
