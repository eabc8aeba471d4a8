#!/bin/bash
# Round-4 TPU measurement queue (sequential — 1-core host, one JAX process
# at a time). Phase 1: verify surfaces + save-convs policy-remat A/B.
#
#   nohup bash scripts/r4_tpu_queue.sh > /tmp/r4_queue.log 2>&1 &
#
# The save_convs policy (models/unet.py `remat`) stores only conv outputs
# and recomputes the elementwise GN/FiLM/SiLU/dropout chains in the
# backward pass — the byte-reduction lever VERDICT r3 #1 calls for
# (step is HBM-bound at 1.34x its bandwidth floor; dropout masks alone
# are 19.2 GB/step of the 122.4 measured).
set -u
cd "$(dirname "$0")/.."

run() {
  echo "=== $* ==="
  "$@" 2>&1 | grep -v "WARNING" | tail -5
  echo
}

echo "--- phase 0: driver surfaces ---"
run python __graft_entry__.py

echo "--- phase 1: flagship A/B — remat policy ladder ---"
run env BENCH_REMAT=0 python bench.py
run env BENCH_REMAT=save_convs python bench.py
run env BENCH_REMAT=save_convs_all python bench.py

echo "--- phase 2: bound what remains of dropout under the policy ---"
run env BENCH_REMAT=save_convs_all BENCH_DROPOUT=0 python bench.py

echo "--- phase 3: streaming evaluate at REAL scale (3,650 days, M=16) ---"
# VERDICT r3 #3 'Done': evaluate over >=3,650 synthetic days at M=16
# completes on this host with flat memory (streamed device reductions;
# the ensemble is never materialized). RSS printed at the end.
run python - <<'EOF'
import resource, subprocess, sys, time
t0 = time.time()
p = subprocess.run([sys.executable, "-m", "probunet_tpu", "evaluate",
    "--preset", "probunet_multivar_128", "--members", "16",
    "--batch-size", "73", "--outdir", "results/eval_fullscale",
    "--set", "data.years_test=[1990,2000]"],
    capture_output=True, text=True)
print(p.stdout[-600:])
print(p.stderr[-300:] if p.returncode else "", flush=True)
ru = resource.getrusage(resource.RUSAGE_CHILDREN)
print(f"evaluate rc={p.returncode} wall={time.time()-t0:.0f}s "
      f"child peak RSS={ru.ru_maxrss/1e6:.2f} GB")
EOF

echo "--- phase 4: per-fusion HBM itemization (VERDICT r3 #1 table) ---"
python scripts/fusion_table.py 128 0 2>&1 | grep -v WARNING | tail -90
python scripts/fusion_table.py 128 save_convs_all 2>&1 | grep -v WARNING | tail -40

echo "--- done ---"
