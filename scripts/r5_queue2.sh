#!/bin/bash
# Round-5 TPU queue #2 — the int8 accuracy ledger (VERDICT r4 #1a) that
# queue #1 phase D lost to a missing /usr/bin/time. Wall/RSS now come from
# scripts/timed_run.py (getrusage). One serialized pass (1-core host).
#
#   evaluate  3,650 days x M=16, bf16 vs --quant int8
#   extremes 10,950 days x M=15 x 3 pixels, bf16 vs --quant int8
#     (the reference's hottest loop, test_return_levels.ipynb cell 2)
#
# Usage: nohup bash scripts/r5_queue2.sh > /tmp/r5_queue2.log 2>&1 &
set -x
cd "$(dirname "$0")/.."
mkdir -p results/int8_ledger

run() { echo "=== $(date -u +%H:%M:%S) $*"; "$@"; }

CKPT_CFG=results/ckpt_flagship/config.json
CKPT=results/ckpt_flagship/ckpt

TIMED_OUT=results/int8_ledger/eval_bf16.time \
run python scripts/timed_run.py python -m probunet_tpu evaluate \
    --config $CKPT_CFG --ckpt $CKPT --members 16 --batch-size 128 \
    --max-items 3650 --outdir results/int8_ledger/eval_bf16
TIMED_OUT=results/int8_ledger/eval_int8.time \
run python scripts/timed_run.py python -m probunet_tpu evaluate \
    --config $CKPT_CFG --ckpt $CKPT --members 16 --batch-size 128 \
    --max-items 3650 --quant int8 --outdir results/int8_ledger/eval_int8

TIMED_OUT=results/int8_ledger/extremes_bf16.time \
run python scripts/timed_run.py python -m probunet_tpu extremes \
    --config $CKPT_CFG --ckpt $CKPT --members 15 --batch-size 128 \
    --pixels 20,45 64,64 96,20 --outdir results/extremes_fullscale_bf16
TIMED_OUT=results/int8_ledger/extremes_int8.time \
run python scripts/timed_run.py python -m probunet_tpu extremes \
    --config $CKPT_CFG --ckpt $CKPT --members 15 --batch-size 128 \
    --pixels 20,45 64,64 96,20 --quant int8 \
    --outdir results/extremes_fullscale_int8

run python scripts/int8_ledger.py 2>&1 | tee results/int8_ledger/LEDGER.md

echo "=== r5_queue2 done $(date -u)"
