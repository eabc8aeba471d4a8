"""bf16-vs-int8 serving accuracy ledger (VERDICT r4 #1a).

Reads the paired artifacts produced by scripts/r5_queue1.sh —

    results/int8_ledger/eval_bf16/eval.json
    results/int8_ledger/eval_int8/eval.json
    results/extremes_fullscale_bf16/extremes.json
    results/extremes_fullscale_int8/extremes.json

— and prints the markdown tables QUALITY.md embeds: per-variable
real-unit CRPS/MAE/spread (the reference's results.ipynb cells 12-14
deliverable, via src/metrics.py:11-70) and per-pixel GEV return levels +
empirical plateau (test_return_levels.ipynb cells 6-15), each bf16 vs
int8 with relative deltas. The go/no-go call is made in QUALITY.md from
these numbers, not auto-decided here.

Usage: python scripts/int8_ledger.py [ledger_dir=results/int8_ledger]
"""

from __future__ import annotations

import json
import os
import sys


def load(path):
    with open(path) as f:
        return json.load(f)


def fmt(x):
    return f"{x:.4g}"


def delta(a, b):
    return f"{(b - a) / abs(a) * 100:+.2f}%" if a else "n/a"


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "results/int8_ledger"
    eb = load(os.path.join(root, "eval_bf16", "eval.json"))
    ei = load(os.path.join(root, "eval_int8", "eval.json"))
    variables = ("pr", "tasmin", "tasmax")[: len(eb["crps_mean"])]

    print(f"### evaluate (T={eb['items']} days, M={eb['members']}, "
          f"real units)\n")
    print("| variable | CRPS bf16 | CRPS int8 | Δ | MAE bf16 | MAE int8 "
          "| Δ | spread bf16 | spread int8 |")
    print("|---|---|---|---|---|---|---|---|---|")
    for c, var in enumerate(variables):
        print(f"| {var} | {fmt(eb['crps_mean'][c])} | "
              f"{fmt(ei['crps_mean'][c])} | "
              f"{delta(eb['crps_mean'][c], ei['crps_mean'][c])} | "
              f"{fmt(eb['mae_mean'][c])} | {fmt(ei['mae_mean'][c])} | "
              f"{delta(eb['mae_mean'][c], ei['mae_mean'][c])} | "
              f"{fmt(eb['spread'][c])} | {fmt(ei['spread'][c])} |")

    xb = load("results/extremes_fullscale_bf16/extremes.json")
    xi = load("results/extremes_fullscale_int8/extremes.json")
    periods = xb["return_periods"]
    print(f"\n### extremes ({xb['days']} days, M={xb['members']}, "
          f"var={xb['variable']}, GEV model return levels, mm/day)\n")
    hdr = " | ".join(f"{p}y" for p in periods)
    print(f"| pixel | precision | {hdr} | empirical plateau |")
    print("|---|---|" + "---|" * (len(periods) + 1))
    for name in xb["pixels"]:
        pb = xb["pixels"][name]["model"]
        pi = xi["pixels"][name]["model"]
        ob = xb["pixels"][name]["observed"]
        row_o = " | ".join(fmt(v) for v in ob["return_levels"])
        row_b = " | ".join(fmt(v) for v in pb["return_levels"])
        row_i = " | ".join(fmt(v) for v in pi["return_levels"])
        print(f"| {name} | observed | {row_o} | — |")
        print(f"| {name} | bf16 | {row_b} | "
              f"{fmt(pb['empirical_plateau'])} |")
        print(f"| {name} | int8 | {row_i} | "
              f"{fmt(pi['empirical_plateau'])} |")
        # CI containment: is the int8 curve inside the bf16 bootstrap CI?
        inside = all(
            lo <= v <= hi
            for v, lo, hi in zip(pi["return_levels"], pb["ci_lower"],
                                 pb["ci_upper"])
        )
        print(f"| {name} | int8 within bf16 95% CI | "
              f"{'YES' if inside else 'NO'} "
              + "| " * len(periods) + "|")


if __name__ == "__main__":
    main()
