#!/bin/bash
# Round-4 queue 3 — the remaining round-4 measurement deliverables:
#   phase 1  VERDICT r3 #8: run-to-run variance — 3 consecutive bench.py
#            runs per mode, quoted as mean +/- spread in README
#   phase 2  VERDICT r3 #4: END-TO-END flagship training at the shipped
#            bs=128 (eval passes, host pulls, logging included) vs the
#            isolated bench step rate; 'done' bar is >=85%
#   phase 3  full-scale streaming evaluate after the make_datasets splits
#            fix (cli.py): peak host RSS should collapse from 31 GB
# Run serially (1-core host): bash scripts/r4_tpu_queue3.sh > /tmp/r4d_queue.log 2>&1
set -u
cd "$(dirname "$0")/.."

run() {
  local name="$1"; shift
  echo "=== $name: $* ==="
  timeout 3000 "$@" 2>&1 | grep -v WARNING
  echo
}

echo "--- phase 1: run-to-run variance, 3x per mode ---"
for i in 1 2 3; do
  run "train_$i"    python bench.py
done
for i in 1 2 3; do
  run "eval_$i"     env BENCH_MODE=eval python bench.py
done
for i in 1 2 3; do
  run "ensemble_$i" env BENCH_MODE=ensemble python bench.py
done
for i in 1 2 3; do
  run "msssim_$i"   env BENCH_MODE=msssim python bench.py
done

echo "--- phase 2: end-to-end flagship training, bs=128 ---"
run quality_bs128 python scripts/quality_run.py --batch-size 128 --years 8 \
    --epochs 30 --outdir results/quality_bs128

echo "--- phase 3: full-scale streaming evaluate (splits fix) ---"
python - <<'EOF'
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
      f"child peak RSS={ru.ru_maxrss/1e6:.2f} GB (was 31.16 GB / 3067 s "
      f"before the splits fix)")
EOF

echo "--- done ---"
