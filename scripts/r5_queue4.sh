#!/bin/bash
# Round-5 queue 4 — trimmed from r5_queue3.sh to fit the round's wall budget
# (full-scale extremes runs cost 24-62 min each; three don't fit):
#   0. retrain the flagship checkpoint (orbax binaries are not committed;
#      training is seed-deterministic on the synthetic archive — same
#      config.json, seed 42, synthetic_seed 0 — so the recorded bf16/int8
#      full-scale curves stay comparable; the (20,45)/(64,64) pixels of
#      run B double as the consistency check: they must land inside the
#      recorded bf16 bootstrap CIs)
#   A. ONE full-scale extremes run: int8 --quant-skip heads, 10,950 d x
#      M=15 x 3 px, block maxima SAVED, [timing] phase breakdown active.
#      bf16/int8 full-scale curves + CIs are already recorded
#      (results/extremes_fullscale_{bf16,int8}/), so this single run
#      answers the open question: does keeping the latent heads float
#      restore a sane GEV fit at (96,20)?
#   B. same-day ensemble bench triple: bf16 / int8 / int8+skip-heads
#      (speed retention of mixed-precision PTQ — the skipped latent heads
#      run on (B,1,1,C) tensors, so the mixed program should keep ~all of
#      int8's bandwidth win)
# Run: nohup bash scripts/r5_queue4.sh > /tmp/r5_queue4.log 2>&1 &
#      echo $! > /tmp/r5_queue4.pid
set -x
cd "$(dirname "$0")/.."

CKPT_CFG=results/ckpt_flagship/config.json
CKPT=results/ckpt_flagship/ckpt

run() {
  echo "=== $(date -u +%H:%M:%S) $*"
  "$@"
}

# --- 0. retrain the flagship checkpoint (seed-deterministic) ---
if [ ! -d "$CKPT" ]; then
  run python -m probunet_tpu train --config $CKPT_CFG \
    --outdir results/ckpt_flagship
fi

# --- A. full-scale extremes, int8 + skip-heads, maxima saved ---
TIMED_OUT=results/int8_ledger/extremes_int8heads_maxima.time run \
  python scripts/timed_run.py python -m probunet_tpu extremes \
    --config $CKPT_CFG --ckpt $CKPT --members 15 --batch-size 128 \
    --pixels 20,45 64,64 96,20 --quant int8 --quant-skip heads \
    --outdir results/extremes_r5b_int8heads

# --- B. ensemble bench triple (same machine-day) ---
run env BENCH_MODE=ensemble python bench.py
run env BENCH_MODE=ensemble BENCH_QUANT=int8 python bench.py
run env BENCH_MODE=ensemble BENCH_QUANT=int8 BENCH_QUANT_SKIP=heads \
  python bench.py

echo "=== r5_queue4 done $(date -u)"
