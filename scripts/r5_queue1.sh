#!/bin/bash
# Round-5 TPU queue #1 — VERDICT r4 items, one serialized pass (1-core
# host, remote axon TPU: never two JAX processes at once).
#
#  A. same-day bench pairs: train bs=128 (headline), bs=32 re-measure
#     (VERDICT #7), eval bf16 vs int8 (VERDICT #2), ensemble bf16 vs int8
#     (second machine-day replication, VERDICT #8b)
#  B. serve-path rooflines (VERDICT #1b): cost-analysis floors + top HBM
#     movers for ensemble/eval x bf16/int8
#  C. act-compress probe (VERDICT #4, perf half)
#  D. int8 accuracy ledger (VERDICT #1a): evaluate 3650 days x M=16 and
#     full-scale extremes 10950 days x M=15, each bf16 vs --quant int8,
#     on the 30-epoch flagship checkpoint (results/ckpt_flagship)
#
# Usage: nohup bash scripts/r5_queue1.sh > /tmp/r5_queue1.log 2>&1 &
set -x
cd "$(dirname "$0")/.."
mkdir -p results/int8_ledger

run() { echo "=== $(date -u +%H:%M:%S) $*"; "$@"; }

# --- A: bench pairs (adjacent => same-day comparisons) ---
run python bench.py
BENCH_BS=32 run python bench.py
BENCH_MODE=eval run python bench.py
BENCH_MODE=eval BENCH_QUANT=int8 run python bench.py
BENCH_MODE=ensemble run python bench.py
BENCH_MODE=ensemble BENCH_QUANT=int8 run python bench.py

# --- B: serve rooflines ---
run python scripts/serve_roofline.py 2>&1 | tee results/int8_ledger/serve_roofline.txt

# --- C: act-compress probe ---
run python scripts/probe_act_compress.py 2>&1 | tee results/int8_ledger/act_compress_probe.txt

# --- D: accuracy ledger on the flagship checkpoint ---
CKPT_CFG=results/ckpt_flagship/config.json
CKPT=results/ckpt_flagship/ckpt
run /usr/bin/time -v python -m probunet_tpu evaluate --config $CKPT_CFG \
    --ckpt $CKPT --members 16 --batch-size 128 --max-items 3650 \
    --outdir results/int8_ledger/eval_bf16 \
    2> results/int8_ledger/eval_bf16.time
run /usr/bin/time -v python -m probunet_tpu evaluate --config $CKPT_CFG \
    --ckpt $CKPT --members 16 --batch-size 128 --max-items 3650 \
    --quant int8 --outdir results/int8_ledger/eval_int8 \
    2> results/int8_ledger/eval_int8.time

# full-scale extremes: ALL 30 test years (10,950 days), M=15, 3 pixels
# (the reference's hottest loop, test_return_levels.ipynb cell 2)
run /usr/bin/time -v python -m probunet_tpu extremes --config $CKPT_CFG \
    --ckpt $CKPT --members 15 --batch-size 128 \
    --pixels 20,45 64,64 96,20 \
    --outdir results/extremes_fullscale_bf16 \
    2> results/int8_ledger/extremes_bf16.time
run /usr/bin/time -v python -m probunet_tpu extremes --config $CKPT_CFG \
    --ckpt $CKPT --members 15 --batch-size 128 \
    --pixels 20,45 64,64 96,20 --quant int8 \
    --outdir results/extremes_fullscale_int8 \
    2> results/int8_ledger/extremes_int8.time

echo "=== r5_queue1 done $(date -u)"
