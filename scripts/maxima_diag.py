"""Diagnose the int8 GEV divergence from SAVED block maxima (round 5).

The full-scale ledger (results/int8_ledger/LEDGER.md) found the int8 GEV
fit at pixel (96,20) qualitatively diverging from bf16 (shape -3.26 vs
-0.23) while the empirical plateau stayed within 4.8%. This script reads
the extremes runs (bf16 / int8 / int8 --quant-skip heads) and answers:

1. Did int8 actually move the maxima distribution, or only the MLE fit?
   (per-pixel pooled-maxima quantiles, n = n_years x M — only for runs
   made after cli.py started saving "block_maxima"; the recorded r5a
   full-scale bf16/int8 runs predate the feature and are used as curve/CI
   fallbacks)
2. Does keeping the latent distribution heads in float (--quant-skip
   heads, ops/quantize.py SKIP_ALIASES) recover bf16's return levels?

Prints a markdown report (tee to results/int8_ledger/MAXIMA.md).
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

BASE = os.path.join(os.path.dirname(__file__), "..")
# (preferred maxima-bearing r5b path, recorded r5a fallback)
RUNS = {
    "bf16": ("results/extremes_r5b_bf16/extremes.json",
             "results/extremes_fullscale_bf16/extremes.json"),
    "int8": ("results/extremes_r5b_int8/extremes.json",
             "results/extremes_fullscale_int8/extremes.json"),
    "int8+skip-heads": ("results/extremes_r5b_int8heads/extremes.json",
                        None),
}
QUANTILES = (0.05, 0.25, 0.50, 0.75, 0.95, 1.0)


def load(path):
    with open(os.path.join(BASE, path)) as f:
        return json.load(f)


def main() -> int:
    data = {}
    for name, (primary, fallback) in RUNS.items():
        for path in (primary, fallback):
            if path is None:
                continue
            try:
                data[name] = load(path)
                data[name]["_path"] = path
                break
            except FileNotFoundError:
                continue
        if name not in data:
            print(f"missing run: {primary}", file=sys.stderr)
            return 1

    pixels = list(next(iter(data.values()))["pixels"])
    print("## Pooled annual-maxima quantiles (mm/day, n = n_years x M)\n")
    for name, d in data.items():
        print(f"- {name}: `{d['_path']}`")
    print()
    for px in pixels:
        print(f"### {px}\n")
        hdr = " | ".join(f"q{int(q * 100):02d}" for q in QUANTILES)
        print(f"| precision | {hdr} | GEV shape | 2y | 100y |")
        print("|" + "---|" * (len(QUANTILES) + 4))
        ref = None
        for name, d in data.items():
            mod = d["pixels"][px]["model"]
            rl = mod["return_levels"]
            if "block_maxima" in mod:
                bm = np.asarray(mod["block_maxima"], np.float64).ravel()
                qs = np.quantile(bm, QUANTILES)
                if ref is None:
                    ref = qs
                delta = (qs / ref - 1.0) * 100.0
                cells = " | ".join(
                    f"{v:.4g}" + ("" if qs is ref else f" ({dd:+.1f}%)")
                    for v, dd in zip(qs, delta))
            else:
                cells = " | ".join("n/s" for _ in QUANTILES)
            print(f"| {name} | {cells} | {mod['gev_fit'][0]:.3f} "
                  f"| {rl[0]:.4g} | {rl[-1]:.4g} |")
        print()

    # CI verdicts: does each quantized run's curve stay inside bf16's
    # bootstrap CI at every period? (same check as scripts/int8_ledger.py)
    print("## Return-level CI check vs bf16 bootstrap 95% CI\n")
    print("| pixel | int8 | int8+skip-heads |")
    print("|---|---|---|")
    for px in pixels:
        base = data["bf16"]["pixels"][px]["model"]
        lo = np.asarray(base["ci_lower"])
        hi = np.asarray(base["ci_upper"])
        row = [px]
        for name in ("int8", "int8+skip-heads"):
            rl = np.asarray(data[name]["pixels"][px]["model"]["return_levels"])
            row.append("YES" if bool(np.all((rl >= lo) & (rl <= hi)))
                       else "NO")
        print("| " + " | ".join(row) + " |")
    print()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
